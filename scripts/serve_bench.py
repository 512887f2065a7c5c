#!/usr/bin/env python
"""Measure end-to-end serving throughput under concurrent load.

Drives ``RestorationService.submit`` (the coalescing front-end the HTTP
server uses) with N concurrent single-image requests and reports img/s —
comparable against ``bench.py``'s raw restore number to quantify serving
overhead.  Run on the TPU (default backend) or ``--cpu``.

    python scripts/serve_bench.py [--n 64] [--batch 16] [--hw 256]
        [--model diffusion_ffhq_10m] [--nfe 100] [--cpu]

Measured (TPU v5e, defaults): 3.07 img/s = 96% of bench.py's 3.19.
"""

import argparse
import os
import sys
import time
from concurrent.futures import wait

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="concurrent requests")
    ap.add_argument("--batch", type=int, default=16, help="service batch")
    ap.add_argument("--hw", type=int, default=256, help="image side")
    ap.add_argument("--model", default="diffusion_ffhq_10m")
    ap.add_argument("--nfe", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from diffpir_tpu.config import load_config
    from diffpir_tpu.serve import RestorationService

    cfg = load_config(None, overrides=dict(
        task="inpaint", model_name=args.model, iter_num=args.nfe,
        batch_size=args.batch, noise_level_img=0.05,
        dtype="float32" if args.cpu else "bfloat16",
        save_E=False, save_L=False))
    svc = RestorationService(cfg, use_mesh=False, allow_random_weights=True, service_batch=args.batch,
                             max_wait_ms=50.0)
    rng = np.random.default_rng(0)
    hw = (args.hw, args.hw, 3)
    imgs = [rng.uniform(size=hw).astype(np.float32) for _ in range(args.n)]
    masks = [(rng.uniform(size=hw) > 0.5).astype(np.float32)
             for _ in range(args.n)]

    t0 = time.perf_counter()
    svc.restore(imgs[:args.batch], masks=masks[:args.batch])
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    futs = [svc.submit(im, mask=mk) for im, mk in zip(imgs, masks)]
    wait(futs, timeout=3600)
    outs = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in outs)
    print(f"served {args.n} concurrent requests in {dt:.2f}s = "
          f"{args.n / dt:.3f} img/s (service batch {args.batch})")
    svc.close()


if __name__ == "__main__":
    main()
