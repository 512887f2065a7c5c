"""Batch restoration service for production serving.

The reference is a research script with no serving story (SURVEY.md §0); this
module packages the runner for deployment:

  * ``RestorationService`` — binds (model, task config) once, keeps compiled
    programs warm across requests, accepts arbitrary-size requests and serves
    them through fixed-shape compiled batches (padding the tail) so XLA never
    recompiles per request.  Mixed-size requests are grouped by (H, W) so each
    distinct shape hits its own warm program.
  * per-request validation: channel counts, finite values, PSF normalization,
    binary masks — malformed requests fail fast on host instead of poisoning
    a compiled batch.
  * thread safety + an asynchronous coalescing front-end: ``submit`` returns a
    ``Future``; a background worker coalesces queued requests into full
    service batches (up to ``max_wait_ms``) to keep MXU occupancy high under
    many small concurrent requests.
  * arbitrary image sizes via pad-to-modulo (the UNet needs H, W divisible by
    2^(levels-1), derived from the bound model's channel_mult); oversized
    inputs can additionally be tiled with ``test_mode: 2`` in the config.
  * ``serve_folder`` — minimal filesystem frontend: restore every image in a
    directory tree into an output directory (the deployment shape the
    reference's results/ workflow implies), double-buffered like
    ``Runner.evaluate``.
  * AOT boot: ``RestorationService(bundle_path=...)`` serves from an exported
    artifact (``export.save_bundle``) instead of JIT-compiling a Runner — a
    fresh serving process needs no model code or trace, and with a
    ``LoadedRestore.save_aot`` native-executable sidecar it skips the XLA
    compile entirely (the cold-start eliminator; see docs/serving.md).

Throughput scaling across chips comes from the runner's mesh sharding; run one
service process per host with ``jax.distributed`` for multi-host serving.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

from diffpir_tpu.config import TaskConfig
from diffpir_tpu.data import Batch
from diffpir_tpu.runner import Runner, overlap_dispatch
from diffpir_tpu.utils import image as im

__all__ = ["RestorationService", "serve_folder", "RequestError"]


class RequestError(ValueError):
    """A malformed restoration request (caught before device dispatch)."""


class RestorationService:
    """Long-lived restoration endpoint over a fixed task configuration."""

    def __init__(self, cfg: Optional[TaskConfig] = None, *,
                 bundle_path: Optional[str] = None,
                 use_mesh: bool = True,
                 service_batch: Optional[int] = None,
                 max_wait_ms: float = 20.0,
                 kernel_size: Optional[int] = None,
                 allow_random_weights: bool = False):
        self.loaded = None
        self._bundle_hw = None
        if bundle_path is not None:
            # AOT path: boot from an exported artifact (export.save_bundle) —
            # no Runner, no UNet/Flax construction, no trace/lowering; with a
            # native-executable sidecar (LoadedRestore.save_aot) not even an
            # XLA compile.  Weight provenance was enforced at EXPORT time
            # (export_restore refuses random weights), so the artifact is
            # trusted here.  Shapes are fixed by the program: requests must
            # fit the manifest (smaller inputs are padded up and cropped
            # back); service_batch is ignored.
            from diffpir_tpu.export import load_bundle

            self.loaded = load_bundle(bundle_path)
            m = self.loaded.manifest
            if cfg is None:
                from diffpir_tpu.config import load_config

                cfg = load_config(None, overrides=dict(
                    task=m["task"], n_channels=m["n_channels"],
                    model_name=m["model_name"], iter_num=m["iter_num"],
                    batch_size=m["batch"], lambda_=m["lambda_"],
                    zeta=m["zeta"],
                    **(dict(sf=m["sf"]) if m["task"] == "sr" else {})))
            self.cfg = cfg
            self.runner = None
            self.batch = m["batch"]
            self._bundle_hw = (m["height"], m["width"])
            self._pad_mod = 1  # padding targets the manifest dims instead
            if kernel_size is None:
                kernel_size = tuple(m["kernel_hw"])
        else:
            if cfg is None:
                raise ValueError("pass a TaskConfig or bundle_path")
            self.cfg = cfg
            self.runner = Runner(cfg, use_mesh=use_mesh)
            if (self.runner.weights_provenance == "random"
                    and not allow_random_weights):
                # a serving endpoint over random weights is a silent-garbage
                # failure mode (the zoo fallback logs one warning and moves
                # on); production callers must opt in explicitly.  The torch
                # reference "protects" against this only because torch.load
                # crashes on a missing file (main_ddpir.py:234).
                raise RuntimeError(
                    f"no trained weights found for model "
                    f"{cfg.model_name!r} (zoo: {cfg.model_zoo!r}) — refusing "
                    f"to serve random-weight restorations. Pass "
                    f"allow_random_weights=True for test fixtures.")
            self.batch = service_batch or cfg.batch_size
            # deepest downsample factor of the bound model's topology
            self._pad_mod = 2 ** (len(self.runner.module.cfg.channel_mult) - 1)
        # fixed PSF pad target so the compiled-program cache key (which
        # includes kernel.shape) doesn't depend on which requests coalesced;
        # None = round the chunk max up to a multiple of 8 (bounded number of
        # distinct programs).  Zero-padding a PSF with its center kept at
        # size//2 leaves the OTF bit-identical (ops/fft_prox.psf2otf embeds
        # into the image-size FFT), so this is shape hygiene, not numerics.
        self._kernel_size = kernel_size
        self._lock = threading.Lock()        # device section is serialized
        self._max_wait = max_wait_ms / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._wlock = threading.Lock()       # worker lifecycle
        self._seed_tick = 0                  # unique seed block per drain call
        self._shutdown = False

    # ------------------------------------------------------------------
    # validation
    # ------------------------------------------------------------------
    def _validate(self, images, kernels, masks) -> None:
        C = self.cfg.n_channels
        for i, img in enumerate(images):
            a = np.asarray(img)
            if a.ndim != 3 or a.shape[-1] != C:
                raise RequestError(
                    f"image[{i}]: expected (h, w, {C}), got {a.shape}")
            if not np.isfinite(a).all():
                raise RequestError(f"image[{i}]: non-finite values")
        if kernels is not None:
            if len(kernels) != len(images):
                raise RequestError("kernels must match images 1:1")
            for i, k in enumerate(kernels):
                ka = np.asarray(k)
                if ka.ndim != 2:
                    raise RequestError(f"kernel[{i}]: expected 2-D PSF, got "
                                       f"shape {ka.shape}")
                if not np.isfinite(ka).all():
                    raise RequestError(f"kernel[{i}]: non-finite values")
                s = float(ka.sum())
                if not 0.99 <= s <= 1.01:
                    raise RequestError(
                        f"kernel[{i}]: PSF must be normalized (sum={s:.4f})")
                h, w = np.asarray(images[i]).shape[:2]
                if ka.shape[0] > h or ka.shape[1] > w:
                    raise RequestError(
                        f"kernel[{i}]: {ka.shape} larger than image ({h},{w})")
        if masks is not None:
            if len(masks) != len(images):
                raise RequestError("masks must match images 1:1")
            for i, m in enumerate(masks):
                ma = np.asarray(m)
                hw = np.asarray(images[i]).shape[:2]
                if ma.shape[:2] != hw:
                    raise RequestError(
                        f"mask[{i}]: shape {ma.shape[:2]} != image {hw}")
                vals = np.unique(ma)
                if not np.isin(vals, (0.0, 1.0)).all():
                    raise RequestError(
                        f"mask[{i}]: must be binary 0/1 (found {vals[:5]})")

    def _validate_point(self, lambda_, zeta) -> None:
        """lambda_/zeta: None, scalar, or per-image sequence."""
        if (self.loaded is not None
                and not self.loaded.manifest.get("dynamic_point")
                and (lambda_ is not None or zeta is not None)):
            raise RequestError(
                "this bundle bakes its operating point (lambda="
                f"{self.loaded.manifest.get('lambda_')}, zeta="
                f"{self.loaded.manifest.get('zeta')}); re-export with "
                "dynamic_point=True to choose (lambda, zeta) per request")
        if lambda_ is not None:
            lam = np.atleast_1d(np.asarray(lambda_, np.float64))
            if not (np.isfinite(lam).all() and (lam > 0).all()):
                raise RequestError(
                    f"lambda_ must be finite and > 0, got {lambda_}")
        if zeta is not None:
            z = np.atleast_1d(np.asarray(zeta, np.float64))
            if not (np.isfinite(z).all() and ((z >= 0) & (z <= 1)).all()):
                raise RequestError(f"zeta must be in [0, 1], got {zeta}")

    # ------------------------------------------------------------------
    def restore(self, images: Sequence[np.ndarray],
                kernels: Optional[Sequence[np.ndarray]] = None,
                masks: Optional[Sequence[np.ndarray]] = None,
                seed: int = 0, lambda_: Optional[float] = None,
                zeta: Optional[float] = None) -> list[np.ndarray]:
        """Restore degraded images (each (h, w, C) float [0,1]).

        kernels: per-image PSFs for deblur/SR (defaults to the config's
        kernel source); masks: per-image {0,1} masks for inpainting.
        lambda_/zeta override the config's operating point — a scalar for the
        whole call or a PER-IMAGE sequence (one batch then carries
        heterogeneous operating points).  Free at serve time either way: the
        compiled program takes the (lambda, zeta)-derived tables as runtime
        arguments.
        Requests are grouped by image shape, chunked into the service batch
        size, and the tail chunk is padded by repetition so every launch hits
        a warm compiled program.  Thread-safe.
        """
        self._validate(images, kernels, masks)
        self._validate_point(lambda_, zeta)
        for name, v in (("lambda_", lambda_), ("zeta", zeta)):
            if v is not None and np.ndim(v) == 1 and len(v) != len(images):
                raise RequestError(
                    f"per-image {name} must match images 1:1 "
                    f"(got {len(v)} for {len(images)} images)")
        n = len(images)
        outs: list[Optional[np.ndarray]] = [None] * n
        by_shape: dict[tuple, list[int]] = {}
        for j in range(n):
            by_shape.setdefault(np.asarray(images[j]).shape, []).append(j)

        # flat chunk list so the loop below can double-buffer across chunks
        # (and across shape groups): host prep of chunk c+1 and the fetch of
        # chunk c both happen while the device computes chunk c.
        chunks: list[tuple[list[int], tuple[int, int], int, int, str]] = []
        for shape, idx_group in by_shape.items():
            h, w = shape[:2]
            if self._bundle_hw is not None:
                # AOT bundle: the program's input dims are frozen at export —
                # pad every request up to exactly the manifest size (outputs
                # are cropped back below); oversized inputs can't be served
                H, W = self._bundle_hw
                if h > H or w > W:
                    raise RequestError(
                        f"image ({h},{w}) exceeds the bundle's compiled "
                        f"input size ({H},{W})")
                ph, pw = H - h, W - w
            else:
                # pad to the UNet's deepest downsample factor (skip-connection
                # concat needs H, W divisible by 2^(levels-1)); outputs are
                # cropped back below.
                ph, pw = (-h) % self._pad_mod, (-w) % self._pad_mod
            # reflect keeps content statistics; tiny inputs (pad >= dim)
            # fall back to edge replication.
            pad_mode = "reflect" if (ph < h and pw < w) else "edge"
            for i in range(0, len(idx_group), self.batch):
                chunks.append((idx_group[i:i + self.batch], (h, w), ph, pw,
                               pad_mode))

        def prep(chunk: list[int], ph: int, pw: int, pad_mode: str):
            real = len(chunk)
            idxs = chunk + [chunk[0]] * (self.batch - real)
            imgs = np.stack([np.asarray(images[j], np.float32) for j in idxs])
            if ph or pw:
                imgs = np.pad(imgs, ((0, 0), (0, ph), (0, pw), (0, 0)),
                              mode=pad_mode)
            if kernels is not None:
                kern = np.stack([self._pad_kernel(kernels[j], imgs.shape[1:3])
                                 for j in idxs])
            else:
                kern = np.ones((self.batch, 1, 1), np.float32)
            if masks is not None:
                mk = np.stack([np.asarray(masks[j], np.float32) for j in idxs])
                if mk.ndim == 3:
                    mk = mk[..., None]
                if ph or pw:
                    # pad masks the same way as y so (y, mask) stay
                    # consistent in the padded margin
                    mk = np.pad(mk, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                mode=pad_mode)
                if mk.shape[-1] == 1:
                    mk = np.repeat(mk, imgs.shape[-1], axis=-1)
            else:
                mk = np.ones_like(imgs)
            return Batch(img_H=np.zeros_like(imgs, dtype=np.uint8),
                         img_L=imgs, kernel=kern, mask=mk,
                         names=[str(j) for j in idxs]), imgs.shape[1]

        pending = None  # (chunk, hw, pad?, padded_h, device arrays)

        def consume(chunk, hw, padded, padded_h, restored):
            if isinstance(restored, tuple):
                restored = restored[0]
            out = np.asarray(restored)[:len(chunk)]  # blocks: host fetch
            if padded:
                s = out.shape[1] // padded_h  # 1 for inpaint/deblur, sf for SR
                out = out[:, :hw[0] * s, :hw[1] * s]
            for j, o in zip(chunk, out):
                outs[j] = o

        def per_chunk(v, chunk):
            # slice a per-image vector to this chunk's rows, padding the tail
            # by repetition exactly as prep() pads the images
            if v is None or np.ndim(v) != 1:
                return v
            idxs = chunk + [chunk[0]] * (self.batch - len(chunk))
            return np.asarray([v[j] for j in idxs], np.float32)

        for chunk_no, (chunk, hw, ph, pw, pad_mode) in enumerate(chunks):
            batch, padded_h = prep(chunk, ph, pw, pad_mode)
            with self._lock:
                if self.loaded is not None:
                    try:
                        restored = self.loaded(
                            batch.img_L,
                            kernel=batch.kernel if kernels is not None
                            else None,
                            mask=batch.mask if masks is not None else None,
                            seed=seed + chunk_no,
                            lambda_=per_chunk(lambda_, chunk),
                            zeta=per_chunk(zeta, chunk), fetch=False)
                    except ValueError as e:
                        # e.g. operating-point override on a fixed-point
                        # bundle — a request error, not a server fault
                        raise RequestError(str(e)) from e
                else:
                    restored = self.runner.restore_batch(
                        batch, per_chunk(lambda_, chunk),
                        per_chunk(zeta, chunk),
                        seed=seed + chunk_no, fetch=False)
            if pending is not None:
                consume(*pending)
            pending = (chunk, hw, bool(ph or pw), padded_h, restored)
        if pending is not None:
            consume(*pending)
        return outs  # type: ignore[return-value]

    def _pad_kernel(self, k, hw: tuple[int, int]) -> np.ndarray:
        """Zero-pad a PSF to the service kernel size, center kept at size//2.

        ``ops/fft_prox.psf2otf`` rolls by -(size//2), so the kernel's true
        center must land exactly there — floor-centered padding would shift
        the OTF by one pixel whenever the size delta is odd.  With the center
        preserved, zero-padding leaves the OTF bit-identical, so the pad
        target is purely a compile-cache key choice.
        """
        k = np.asarray(k, np.float32)
        tgt = self._kernel_size
        if tgt is not None and np.ndim(tgt) == 0:
            tgt = (int(tgt), int(tgt))
        out = []
        for ax in range(2):
            size = k.shape[ax]
            t = tgt[ax] if tgt is not None else -(-size // 8) * 8  # mult of 8
            if self._bundle_hw is not None and size > t:
                raise RequestError(
                    f"kernel dim {size} exceeds the bundle's compiled PSF "
                    f"size {tuple(tgt)}")
            t = min(max(t, size), hw[ax])   # never exceed the image
            p0 = t // 2 - size // 2
            out.append((p0, t - size - p0))
        return np.pad(k, tuple(out))

    # ------------------------------------------------------------------
    # asynchronous coalescing front-end
    # ------------------------------------------------------------------
    def submit(self, image: np.ndarray,
               kernel: Optional[np.ndarray] = None,
               mask: Optional[np.ndarray] = None,
               lambda_: Optional[float] = None,
               zeta: Optional[float] = None) -> "Future[np.ndarray]":
        """Enqueue one request; returns a Future for the restored image.

        A background worker coalesces queued requests into full service
        batches, waiting at most ``max_wait_ms`` to fill one — concurrent
        callers share compiled batch launches instead of serializing
        one-image batches.  lambda_/zeta set this request's operating point
        (data-fidelity weight / renoise mix); requests with DIFFERENT points
        still coalesce into one batch — operating points are per-sample
        runtime arguments of the one compiled program.
        """
        self._validate([image], None if kernel is None else [kernel],
                       None if mask is None else [mask])
        self._validate_point(lambda_, zeta)
        fut: "Future[np.ndarray]" = Future()
        self._queue.put((image, kernel, mask, lambda_, zeta, fut))
        # enqueue BEFORE ensuring the worker: if a racing close() stops the
        # worker, its queue sweep resolves this future instead of stranding it
        self._ensure_worker()
        return fut

    def _ensure_worker(self) -> None:
        with self._wlock:
            if self._worker is None or not self._worker.is_alive():
                self._shutdown = False
                self._worker = threading.Thread(target=self._drain, daemon=True)
                self._worker.start()

    def close(self) -> None:
        """Stop the coalescing worker; fail (don't strand) queued futures.

        Idempotent; a later ``submit`` transparently restarts the worker.
        """
        with self._wlock:
            self._shutdown = True
            worker, self._worker = self._worker, None
        if worker is not None:
            worker.join(timeout=5.0)
        while True:
            try:
                *_, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(
                    RequestError("service closed before request was served"))

    def _drain(self) -> None:
        while not self._shutdown:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            group = [first]
            deadline = time.perf_counter() + self._max_wait
            # drain up to FOUR service batches per round: restore() overlaps
            # host prep/fetch with device compute across its chunks, so a
            # multi-chunk call keeps the device busy end to end under load (a
            # single-chunk call degenerates to dispatch -> fetch serially,
            # and the inter-round fetch barrier amortizes over the chunks).
            # Under light load the max_wait deadline fires first, so small
            # groups still run immediately.
            while len(group) < 4 * self.batch:
                remain = deadline - time.perf_counter()
                if remain <= 0:
                    break
                try:
                    group.append(self._queue.get(timeout=remain))
                except queue.Empty:
                    break
            # requests with and without kernels/masks can't share one batch —
            # partition so an unusual request can't poison its neighbors.
            # Heterogeneous (lambda, zeta) DO share a batch: operating points
            # are per-SAMPLE runtime arguments, so mixed-point traffic
            # coalesces into full launches instead of fragmenting.
            subgroups: dict[tuple, list] = {}
            for g in group:
                subgroups.setdefault(
                    (g[1] is not None, g[2] is not None), []).append(g)
            for sub in subgroups.values():
                images = [g[0] for g in sub]
                kernels = [g[1] for g in sub] if sub[0][1] is not None else None
                masks = [g[2] for g in sub] if sub[0][2] is not None else None
                lams = [g[3] for g in sub]
                zetas = [g[4] for g in sub]
                # all-default -> scalar path (the common case keeps its
                # compiled form); any override -> per-image vectors
                lam = (None if all(l is None for l in lams) else
                       [self.cfg.lambda_ if l is None else l for l in lams])
                zeta = (None if all(z is None for z in zetas) else
                        [self.cfg.zeta if z is None else z for z in zetas])
                # unique seed block per launch — coalesced batches must not
                # reuse the same diffusion noise stream across requests
                with self._wlock:
                    self._seed_tick += 1
                    seed = self._seed_tick << 12
                try:
                    results = self.restore(images, kernels, masks, seed=seed,
                                           lambda_=lam, zeta=zeta)
                    for (*_, fut), out in zip(sub, results):
                        fut.set_result(out)
                except Exception as e:  # pragma: no cover
                    for *_, fut in sub:
                        if not fut.done():
                            fut.set_exception(e)

    # ------------------------------------------------------------------
    def warmup(self, hw: tuple[int, int]) -> float:
        """Compile the service program for an input size; returns seconds."""
        t0 = time.perf_counter()
        dummy = [np.zeros(hw + (self.cfg.n_channels,), np.float32)] * self.batch
        self.restore(dummy)
        return time.perf_counter() - t0


def serve_folder(cfg: TaskConfig, in_dir: str, out_dir: str, *,
                 use_mesh: bool = True, seed: int = 0,
                 allow_random_weights: bool = False) -> dict:
    """Restore every image under `in_dir` into `out_dir` (degraded inputs in,
    restored outputs out — masks/kernels come from the task config pipeline).

    Double-buffered like ``Runner.evaluate``: batch i+1 is dispatched before
    batch i is host-fetched and written."""
    from diffpir_tpu.data import make_batches, prepare_images

    cfg = dataclasses.replace(cfg) if not isinstance(cfg, TaskConfig) else cfg
    runner = Runner(cfg, use_mesh=use_mesh)
    if runner.weights_provenance == "random" and not allow_random_weights:
        raise RuntimeError(
            f"no trained weights found for model {cfg.model_name!r} — "
            f"refusing to serve random-weight restorations (pass "
            f"allow_random_weights=True for test fixtures)")
    paths = im.list_images(in_dir)
    if not paths:
        raise FileNotFoundError(f"no images under {in_dir!r}")
    items = prepare_images(cfg, paths)
    batches = make_batches(items, cfg.batch_size,
                           pad_to_batch=runner.mesh is not None)
    os.makedirs(out_dir, exist_ok=True)
    n, t0 = 0, time.perf_counter()

    def consume(bi, batch, out, _t0):
        nonlocal n
        if isinstance(out, tuple):
            out = out[0]
        nb = len(batch.names)
        im.imsave_batch(np.asarray(out[:nb]), batch.names, out_dir, "restored_")
        n += nb

    overlap_dispatch(
        batches,
        lambda bi, b: runner.restore_batch(b, seed=seed + bi, fetch=False),
        consume)
    dt = time.perf_counter() - t0
    return {"n_images": n, "seconds": dt, "images_per_sec": n / dt}
