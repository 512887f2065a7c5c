"""Training image pipeline: sharded, infinite, class-conditional loader.

Capability parity with reference ``guided_diffusion/image_datasets.py``:
recursive file listing, per-host sharding (``shard=rank, num_shards=world``,
``image_datasets.py:53-54,95-96``), class labels parsed from the filename
prefix before the first "_" (``:44-48``), center or random crop + optional
flip (``:126-167``), infinite shuffled iteration.

TPU-native deltas: PIL + numpy only (no blobfile/MPI); yields fixed-shape
NHWC float32 batches in [-1, 1]; ``shard_for_process`` defaults to this
process's ``jax.process_index()`` so multi-host training shards the file list
exactly like the reference's MPI ranks; use
``jax.make_array_from_process_local_data`` to globalize batches over a mesh.
"""

from __future__ import annotations

import os
import random
from typing import Iterator, Optional, Sequence

import numpy as np

from diffpir_tpu.utils import image as im

__all__ = ["list_image_files_recursively", "ImageDataset", "load_data"]


def list_image_files_recursively(data_dir: str) -> list[str]:
    out = []
    for entry in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1].lower()
        if "." in entry and ext in ("jpg", "jpeg", "png", "gif"):
            out.append(full)
        elif os.path.isdir(full):
            out.extend(list_image_files_recursively(full))
    return out


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return arr[top:top + size, left:left + size]


def _random_crop(arr: np.ndarray, size: int, rng: random.Random) -> np.ndarray:
    h, w = arr.shape[:2]
    top = rng.randrange(h - size + 1)
    left = rng.randrange(w - size + 1)
    return arr[top:top + size, left:left + size]


class ImageDataset:
    """Sharded image dataset over local files."""

    def __init__(self, resolution: int, image_paths: Sequence[str],
                 classes: Optional[Sequence[int]] = None, shard: int = 0,
                 num_shards: int = 1, random_crop: bool = False,
                 random_flip: bool = True, seed: int = 0):
        self.resolution = resolution
        self.paths = list(image_paths)[shard::num_shards]
        self.classes = (None if classes is None
                        else list(classes)[shard::num_shards])
        self.random_crop = random_crop
        self.random_flip = random_flip
        self.rng = random.Random(seed + shard)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int):
        from PIL import Image

        with Image.open(self.paths[idx]) as pil:
            pil = pil.convert("RGB")
            # progressively downsample then resize, as the reference does to
            # avoid aliasing on very large sources (image_datasets.py:131-141)
            while min(pil.size) >= 2 * self.resolution:
                pil = pil.resize(tuple(x // 2 for x in pil.size), Image.BOX)
            scale = self.resolution / min(pil.size)
            pil = pil.resize(tuple(round(x * scale) for x in pil.size),
                             Image.BICUBIC)
            arr = np.asarray(pil, np.uint8)
        arr = (_random_crop(arr, self.resolution, self.rng) if self.random_crop
               else _center_crop(arr, self.resolution))
        if self.random_flip and self.rng.random() < 0.5:
            arr = arr[:, ::-1]
        arr = arr.astype(np.float32) / 127.5 - 1.0
        label = None if self.classes is None else self.classes[idx]
        return arr, label


def load_data(*, data_dir: str, batch_size: int, image_size: int,
              class_cond: bool = False, deterministic: bool = False,
              random_crop: bool = False, random_flip: bool = True,
              shard: Optional[int] = None, num_shards: Optional[int] = None,
              seed: int = 0) -> Iterator[tuple[np.ndarray, Optional[np.ndarray]]]:
    """Infinite iterator of (images (B,H,W,3) in [-1,1], labels or None)."""
    if shard is None or num_shards is None:
        try:
            import jax

            shard = jax.process_index()
            num_shards = jax.process_count()
        except Exception:
            shard, num_shards = 0, 1

    files = list_image_files_recursively(data_dir)
    classes = None
    if class_cond:
        names = [os.path.basename(p).split("_")[0] for p in files]
        sorted_classes = {c: i for i, c in enumerate(sorted(set(names)))}
        classes = [sorted_classes[n] for n in names]

    ds = ImageDataset(image_size, files, classes, shard=shard,
                      num_shards=num_shards, random_crop=random_crop,
                      random_flip=random_flip, seed=seed)
    if len(ds) < batch_size:
        # the drop-last batching below would otherwise yield nothing and the
        # infinite loop would spin forever
        raise ValueError(
            f"shard {shard}/{num_shards} has {len(ds)} images < batch_size "
            f"{batch_size} (under {data_dir!r})")
    order_rng = random.Random(seed * 7919 + shard)
    order = list(range(len(ds)))
    while True:
        if not deterministic:
            order_rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            imgs, labels = zip(*(ds[j] for j in order[i:i + batch_size]))
            yield (np.stack(imgs),
                   None if classes is None else np.asarray(labels, np.int64))
