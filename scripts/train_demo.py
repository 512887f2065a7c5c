#!/usr/bin/env python
"""Train a demo diffusion prior on a synthetic dataset and save it.

Produces ``assets/demo/<name>.flax.npz`` — a genuinely trained (not random)
prior over a structured synthetic image distribution (soft-edged rectangles /
ellipses / gradients; the 256-px "rich" variant adds sinusoidal texture and
thin lines so deblurring/SR have real high-frequency content to recover), so
the full DiffPIR restoration stack can be exercised and quality-tested
end-to-end in an environment where the published guided-diffusion checkpoints
cannot be downloaded.

This script is a thin wrapper over the library training loop:
``Trainer.fit(pool=...)`` keeps the whole dataset device-resident and ships
only gather indices per dispatch (see train/loop.py:train_steps_from_pool).

Usage:  python scripts/train_demo.py [--steps 4000] [--cpu] [--arch hq256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = 1000


def synth_batch(rng: np.random.Generator, n: int, IMG: int = 64,
                rich: bool = False) -> np.ndarray:
    """Random structured images in [-1, 1], (n, IMG, IMG, 3).

    rich=False is the original demo32/demo64 distribution (kept bit-stable:
    shipped demo priors are evaluated on held-out draws from it).  rich=True
    (used by the 256-px demo prior) appends texture: a sinusoidal field on
    the background, more shapes, and thin anti-aliased lines.
    """
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32) / IMG
    out = np.empty((n, IMG, IMG, 3), np.float32)
    for i in range(n):
        # gradient background
        g0, g1 = rng.random(3), rng.random(3)
        ang = rng.random()
        tcoord = ang * xx + (1 - ang) * yy
        img = g0[None, None] * (1 - tcoord[..., None]) + g1[None, None] * tcoord[..., None]
        if rich and rng.random() < 0.7:
            # low-amplitude sinusoidal texture (random orientation/frequency)
            fy, fx = rng.random(2) * 24.0 + 4.0
            phase = rng.random() * 6.283
            amp = rng.random() * 0.12 + 0.03
            tex = np.sin(6.283 * (fy * yy + fx * xx) + phase) * amp
            img = img + tex[..., None] * rng.random(3)[None, None]
        # soft shapes (1-3 classic; 2-5 rich)
        n_shapes = rng.integers(2, 6) if rich else rng.integers(1, 4)
        for _ in range(n_shapes):
            cy, cx = rng.random(2) * 0.8 + 0.1
            ry, rx = rng.random(2) * 0.25 + 0.08
            col = rng.random(3)
            if rng.random() < 0.5:
                d = np.maximum(np.abs(yy - cy) / ry, np.abs(xx - cx) / rx)
            else:
                d = np.sqrt(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2)
            alpha = np.clip(1.0 - (d - 0.9) / 0.2, 0.0, 1.0)[..., None]
            img = img * (1 - alpha) + col[None, None] * alpha
        if rich:
            # thin lines: sharp high-frequency structure deblur must resolve
            for _ in range(rng.integers(1, 4)):
                p0 = rng.random(2)
                theta = rng.random() * 6.283
                nvec = np.array([np.cos(theta), np.sin(theta)], np.float32)
                dist = np.abs((yy - p0[0]) * nvec[0] + (xx - p0[1]) * nvec[1])
                width = (rng.random() * 1.5 + 0.75) / IMG
                alpha = np.clip(1.0 - dist / width, 0.0, 1.0)[..., None]
                img = img * (1 - alpha) + rng.random(3)[None, None] * alpha
        out[i] = np.clip(img, 0.0, 1.0) * 2.0 - 1.0
    return out


ARCHS = {"tiny": "TINY_TEST_CONFIG", "hq": "DEMO_HQ_CONFIG",
         "hq256": "DEMO256_CONFIG"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="assets/demo/tiny_demo.flax.npz")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--dataset-size", type=int, default=2000,
                    help="pregenerate a fixed pool of N images, kept "
                         "device-resident by Trainer.fit(pool=...)")
    ap.add_argument("--arch", choices=sorted(ARCHS), default="tiny",
                    help="tiny = 6M TINY_TEST_CONFIG, hq = 29M DEMO_HQ_CONFIG,"
                         " hq256 = 54M flagship-topology DEMO256_CONFIG")
    ap.add_argument("--rich", action="store_true",
                    help="rich texture distribution (default for hq256)")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="K train steps per device dispatch (amortizes the "
                         "per-dispatch latency that dominates through the "
                         "remote tunnel)")
    ap.add_argument("--save-interval", type=int, default=2000)
    ap.add_argument("--resume", type=str, default=None, metavar="NPZ",
                    help="warm-start params (and EMA) from a saved "
                         ".flax.npz of the same arch — continues training "
                         "with a fresh optimizer (the npz stores EMA params "
                         "only)")
    ap.add_argument("--pool-seed", type=int, default=0,
                    help="RNG seed of the pregenerated pool (continuation "
                         "runs should pick a fresh seed so they see new "
                         "draws instead of re-epoching the original pool)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))

    import jax.numpy as jnp

    from diffpir_tpu.diffusion import Diffusion, ModelMeanType, ModelVarType
    from diffpir_tpu.models import zoo
    from diffpir_tpu.models.unet import UNet
    from diffpir_tpu.schedule import NoiseSchedule
    from diffpir_tpu.train.loop import TrainConfig, Trainer

    arch = getattr(zoo, ARCHS[args.arch])
    IMG = arch.image_size if args.arch == "hq256" else args.image_size
    rich = args.rich or args.arch == "hq256"
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    model = UNet(arch, dtype=dtype)
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    diff = Diffusion(sched, ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE)
    tcfg = TrainConfig(lr=args.lr, ema_rates=(0.999,),
                       compute_dtype="float32" if args.cpu else "bfloat16")
    trainer = Trainer(model, diff, tcfg)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, IMG, IMG, 3))
    if args.resume:
        loaded = zoo.load_params_npz(args.resume)
        state["params"] = jax.tree_util.tree_map(
            lambda old, new: jnp.asarray(new, old.dtype).reshape(old.shape),
            state["params"], loaded)
        state["ema"] = tuple(
            jax.tree_util.tree_map(jnp.copy, state["params"])
            for _ in state["ema"])
        print(f"resumed params from {args.resume}", flush=True)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state["params"]))
    print(f"arch {args.arch}: {n_params/1e6:.1f}M params, {IMG}px, "
          f"rich={rich}", flush=True)

    rng = np.random.default_rng(args.pool_seed)
    t0 = time.perf_counter()
    pool = synth_batch(rng, args.dataset_size, IMG, rich=rich)
    print(f"pregenerated {args.dataset_size} images "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def save_fn(s):
        zoo.save_params_npz(jax.device_get(s["ema"][0]), args.out)
        print(f"saved EMA params -> {args.out} (step {int(s['step'])}, "
              f"{(time.perf_counter()-t0)/max(int(s['step']),1)*1000:.0f} "
              f"ms/step incl. startup)", flush=True)

    t0 = time.perf_counter()
    trainer.fit(state, steps=args.steps, key=jax.random.PRNGKey(1),
                pool=pool, batch_size=args.batch,
                steps_per_call=args.steps_per_call,
                save_fn=save_fn, save_interval=args.save_interval,
                log_interval=max(args.save_interval // 10, 1))


if __name__ == "__main__":
    main()
