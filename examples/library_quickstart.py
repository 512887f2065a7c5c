#!/usr/bin/env python
"""diffpir_tpu as a library — the three-layer API in ~60 lines.

Self-contained: uses the repo-trained 64px demo prior (``tiny_demo64``) and
the synthetic demo testset, so it runs without downloading any checkpoints.

    python examples/library_quickstart.py [--cpu]

Layers demonstrated (lowest to highest):
  1. sampler primitives  — build a plan, a denoiser, a prox; call
     ``diffpir_sample`` (the whole 20-NFE trajectory is ONE jitted scan).
  2. Runner              — config-bound batched restoration with metrics.
  3. RestorationService  — the serving front-end (warm batches, validation).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffpir_tpu.models.zoo import resolve_model
    from diffpir_tpu.sampler import (diffpir_sample, make_denoiser,
                                     make_inpaint_prox)
    from diffpir_tpu.schedule import NoiseSchedule, build_plan
    from diffpir_tpu.utils import image as im

    # --- data: a masked synthetic test image --------------------------------
    path = os.path.join(REPO, "testsets", "demo64", "synth0.png")
    gt = im.uint2single(im.imread_uint(path, 3))            # (64, 64, 3) [0,1]
    rng = np.random.default_rng(0)
    mask = (rng.random(gt.shape[:2]) > 0.5).astype(np.float32)[..., None]
    y = jnp.asarray((gt * mask)[None], jnp.float32)          # degraded obs
    mask = jnp.asarray(mask[None])

    # --- layer 1: sampler primitives ----------------------------------------
    module, params, _prov = resolve_model("tiny_demo64", os.path.join(REPO, "model_zoo"))
    sched = NoiseSchedule.linear(0.0001, 0.02, 1000)
    plan = build_plan(sched, iter_num=20, skip_type="quad", lambda_=1.0,
                      eta=0.0, sigma_y=0.001)
    den = make_denoiser(lambda p, x, t: module.apply({"params": p}, x, t),
                        params, sched)
    key = jax.random.PRNGKey(0)
    x_init = jax.random.normal(key, y.shape, jnp.float32)
    out = diffpir_sample(den, make_inpaint_prox(y, mask), plan, x_init, key,
                         zeta=1.0, generate_mode="DiffPIR", y=y, mask=mask,
                         recover_known=True)
    psnr = im.psnr_batch(np.asarray(out), gt[None], max_pixel=1.0)
    print(f"[sampler]  20-NFE inpainting PSNR: {psnr:.2f} dB")

    # --- layer 2: Runner (config-driven, batched, metrics/artifacts) --------
    from diffpir_tpu.config import load_config
    from diffpir_tpu.runner import Runner

    cfg = load_config(os.path.join(REPO, "configs", "demo64_inpaint.yaml"),
                      overrides=dict(cwd=REPO, save_E=False, save_L=False))
    res = Runner(cfg, use_mesh=False).evaluate(save=False)
    print(f"[runner]   testset PSNR {res['psnr']:.2f} dB, "
          f"SSIM {res['ssim']:.3f} over {res['n_images']} images")

    # --- layer 3: serving front-end ------------------------------------------
    from diffpir_tpu.serve import RestorationService

    svc = RestorationService(cfg, use_mesh=False, allow_random_weights=True, service_batch=4)
    outs = svc.restore([np.asarray(y[0])], masks=[np.asarray(mask[0])])
    print(f"[serve]    restored request shape {outs[0].shape}, "
          f"PSNR {im.psnr_batch(outs[0][None], gt[None], max_pixel=1.0):.2f} dB")


if __name__ == "__main__":
    main()
