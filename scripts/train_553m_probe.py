#!/usr/bin/env python
"""Measure a REAL training step of the 553M imagenet flagship on one chip.

VERDICT r2 item 4a: the 553M model's training story was unexercised — on a
16 GB v5e, params + Adam moments + one EMA set are ~8.8 GB fp32 before
activations, so 256px training needs per-block rematerialization
(``UNetConfig.use_remat``, the TPU-native analogue of the reference's
``use_checkpoint``, ``guided_diffusion/unet.py:154-162``).

Runs a handful of optimizer steps (AdamW + EMA, bf16 compute / fp32 master)
at the requested batch size and prints ms/step from host-fetch-synced
timing (axon's ``block_until_ready`` returns early — CLAUDE.md).

    python scripts/train_553m_probe.py [--batch 4] [--microbatch 2]
        [--steps 6] [--no-remat] [--image-size 256]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--microbatch", type=int, default=-1)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny-smoke", action="store_true",
                    help="swap in the 6M tiny fixture to validate the "
                         "script logic quickly (CI/CPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from diffpir_tpu.diffusion import Diffusion, ModelMeanType, ModelVarType
    from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS, UNet
    from diffpir_tpu.schedule import NoiseSchedule
    from diffpir_tpu.train.loop import TrainConfig, Trainer

    if args.tiny_smoke:
        from diffpir_tpu.models.zoo import TINY_TEST_CONFIG

        base_cfg = TINY_TEST_CONFIG
    else:
        base_cfg = MODEL_ZOO_CONFIGS["256x256_diffusion_uncond"]
    ucfg = dataclasses.replace(base_cfg, use_remat=not args.no_remat,
                               image_size=args.image_size)
    model = UNet(ucfg, dtype=jnp.bfloat16)
    diffusion = Diffusion(NoiseSchedule.linear(0.0001, 0.02, 1000),
                          ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE)
    tcfg = TrainConfig(lr=1e-4, ema_rates=(0.9999,),
                       microbatch=args.microbatch, compute_dtype="bfloat16")
    trainer = Trainer(model, diffusion, tcfg)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = trainer.init_state(
        key, (1, args.image_size, args.image_size, 3))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state["params"]))
    print(f"init: {n_params / 1e6:.0f}M params, remat={not args.no_remat}, "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (args.batch, args.image_size,
                                            args.image_size, 3)), jnp.float32)
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    loss0 = float(np.asarray(metrics["loss"]))  # host fetch = real sync
    print(f"step 1 (compile): {time.perf_counter() - t0:.0f}s, "
          f"loss {loss0:.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(2 + i))
    loss = float(np.asarray(metrics["loss"]))  # sync
    dt = (time.perf_counter() - t0) / args.steps
    print(f"{n_params / 1e6:.0f}M train step: {dt * 1e3:.0f} ms/step = "
          f"{args.batch / dt:.1f} img/s (batch {args.batch}, microbatch "
          f"{tcfg.microbatch}, {args.image_size}px, bf16+fp32 master, "
          f"AdamW+EMA, loss {loss:.4f})")


if __name__ == "__main__":
    main()
