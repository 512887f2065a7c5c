#!/usr/bin/env python
"""Train a small diffusion prior on a synthetic dataset and save it.

Produces ``assets/demo/tiny_demo.flax.npz`` — a genuinely trained (not random)
prior over a structured synthetic image distribution (soft-edged rectangles /
ellipses / gradients), so the full DiffPIR restoration stack can be exercised
and quality-tested end-to-end in an environment where the published
guided-diffusion checkpoints cannot be downloaded.

Usage:  python scripts/train_demo.py [--steps 4000] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = 1000


def synth_batch(rng: np.random.Generator, n: int, IMG: int = 64) -> np.ndarray:
    """Random structured images in [-1, 1], (n, IMG, IMG, 3)."""
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32) / IMG
    out = np.empty((n, IMG, IMG, 3), np.float32)
    for i in range(n):
        # gradient background
        g0, g1 = rng.random(3), rng.random(3)
        ang = rng.random()
        tcoord = ang * xx + (1 - ang) * yy
        img = g0[None, None] * (1 - tcoord[..., None]) + g1[None, None] * tcoord[..., None]
        # 1-3 soft shapes
        for _ in range(rng.integers(1, 4)):
            cy, cx = rng.random(2) * 0.8 + 0.1
            ry, rx = rng.random(2) * 0.25 + 0.08
            col = rng.random(3)
            if rng.random() < 0.5:
                d = np.maximum(np.abs(yy - cy) / ry, np.abs(xx - cx) / rx)
            else:
                d = np.sqrt(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2)
            alpha = np.clip(1.0 - (d - 0.9) / 0.2, 0.0, 1.0)[..., None]
            img = img * (1 - alpha) + col[None, None] * alpha
        out[i] = img * 2.0 - 1.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="assets/demo/tiny_demo.flax.npz")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--dataset-size", type=int, default=0,
                    help="pregenerate a fixed pool of N images and sample "
                         "batches from it (the per-step python generator is "
                         "host-bound on a 1-core box; 0 = generate per step)")
    ap.add_argument("--arch", choices=("tiny", "hq"), default="tiny",
                    help="tiny = 6M TINY_TEST_CONFIG, hq = 26M DEMO_HQ_CONFIG")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="K train steps per device dispatch "
                         "(Trainer.train_steps lax.scan) — amortizes the "
                         "per-dispatch latency that dominates small-model "
                         "training through the remote tunnel; needs "
                         "--dataset-size (batches are pre-stacked on host)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))

    import jax.numpy as jnp

    from diffpir_tpu.diffusion import Diffusion, ModelMeanType, ModelVarType
    from diffpir_tpu.models.unet import UNet
    from diffpir_tpu.models.zoo import (DEMO_HQ_CONFIG, TINY_TEST_CONFIG,
                                        save_params_npz)
    from diffpir_tpu.schedule import NoiseSchedule
    from diffpir_tpu.train.loop import TrainConfig, Trainer

    IMG = args.image_size
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    arch = TINY_TEST_CONFIG if args.arch == "tiny" else DEMO_HQ_CONFIG
    model = UNet(arch, dtype=dtype)
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    diff = Diffusion(sched, ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE)
    tcfg = TrainConfig(lr=args.lr, ema_rates=(0.999,),
                       compute_dtype="float32" if args.cpu else "bfloat16")
    trainer = Trainer(model, diff, tcfg)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, IMG, IMG, 3))

    rng = np.random.default_rng(0)
    import time

    pool = None
    if args.dataset_size:
        t0 = time.perf_counter()
        pool = synth_batch(rng, args.dataset_size, IMG)
        print(f"pregenerated {args.dataset_size} images "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    K = max(args.steps_per_call, 1)
    if K > 1 and pool is None:
        raise SystemExit("--steps-per-call needs --dataset-size "
                         "(per-step python generation would starve the scan)")
    pool_dev = None
    if K > 1:
        # the whole pool lives on device; per call we ship only (K, B) int32
        # indices and gather on device.  Streaming the stacked batches from
        # host instead leaks ~batch-size bytes of transfer staging per call
        # through the remote-dispatch tunnel (observed: 63 MB/call -> host
        # OOM at 130 GB after 2100 calls) and wastes PCIe/DCN bandwidth.
        pool_dev = jnp.asarray(pool)

    t0 = time.perf_counter()
    i = 0
    while i < args.steps:
        if K > 1:
            k_eff = min(K, args.steps - i)
            idx = jnp.asarray(
                rng.integers(0, len(pool), (k_eff, args.batch)), jnp.int32)
            state, m = trainer.train_steps(state, pool_dev[idx],
                                           jax.random.PRNGKey(i))
            m = {k: v[-1] for k, v in m.items()}
            i += k_eff
        else:
            if pool is not None:
                batch = jnp.asarray(pool[rng.integers(0, len(pool), args.batch)])
            else:
                batch = jnp.asarray(synth_batch(rng, args.batch, IMG))
            state, m = trainer.train_step(state, batch, jax.random.PRNGKey(i))
            i += 1
        if i % 50 < K or i == args.steps:
            loss = float(m["loss"])  # forces sync
            print(f"step {i}/{args.steps} loss {loss:.4f} "
                  f"({(time.perf_counter()-t0)/i*1000:.0f} ms/step)",
                  flush=True)
        if i % 250 < K:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            save_params_npz(jax.device_get(state["ema"][0]), args.out)
            print(f"checkpointed at step {i}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    ema = jax.device_get(state["ema"][0])
    save_params_npz(ema, args.out)
    print(f"saved EMA params -> {args.out}")


if __name__ == "__main__":
    main()
