#!/usr/bin/env python
"""Measure end-to-end serving throughput under concurrent load.

Drives ``RestorationService.submit`` (the coalescing front-end the HTTP
server uses) with N concurrent single-image requests and reports img/s —
comparable against ``bench.py``'s raw restore number to quantify serving
overhead.  Run on the TPU (default backend) or ``--cpu``.

    python scripts/serve_bench.py [--n 64] [--batch 16] [--hw 256]
        [--model diffusion_ffhq_10m] [--nfe 100] [--cpu]

Also reports per-request latency percentiles (p50/p95/p99): under
coalescing, an individual request's latency is queue-wait + the shared
batch's trajectory time, so percentiles — not the mean — are the serving
SLO numbers.  ``--serial`` switches to a batch-1 latency mode (one request
in flight at a time, service_batch=1) measuring the floor a single
interactive caller sees; combine with ``--nfe`` to map the NFE-vs-latency
tradeoff.

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
    ap.add_argument("--serial", action="store_true",
                    help="batch-1 latency mode: one request in flight at a "
                         "time, service_batch=1 (interactive-caller floor)")
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
    service_batch = 1 if args.serial else args.batch
    svc = RestorationService(cfg, use_mesh=False, allow_random_weights=True,
                             service_batch=service_batch, max_wait_ms=50.0)
    rng = np.random.default_rng(0)
    hw = (args.hw, args.hw, 3)
    imgs = [rng.uniform(size=hw).astype(np.float32) for _ in range(args.n)]
    masks = [(rng.uniform(size=hw) > 0.5).astype(np.float32)
             for _ in range(args.n)]

    t0 = time.perf_counter()
    svc.restore(imgs[:service_batch], masks=masks[:service_batch])
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    lat = np.zeros(args.n)
    t0 = time.perf_counter()
    if args.serial:
        outs = []
        for i, (im, mk) in enumerate(zip(imgs, masks)):
            ti = time.perf_counter()
            outs.append(svc.submit(im, mask=mk).result(timeout=3600))
            lat[i] = time.perf_counter() - ti
    else:
        # per-request latency = submit -> future resolution (queue wait +
        # shared batch trajectory); done-callbacks stamp completion times
        def _stamp(i, ts):
            return lambda _f: lat.__setitem__(i, time.perf_counter() - ts)

        futs = []
        for i, (im, mk) in enumerate(zip(imgs, masks)):
            ts = time.perf_counter()
            f = svc.submit(im, mask=mk)
            f.add_done_callback(_stamp(i, ts))
            futs.append(f)
        wait(futs, timeout=3600)
        outs = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in outs)
    p50, p95, p99 = (float(np.percentile(lat, q)) for q in (50, 95, 99))
    mode = "serial batch-1" if args.serial else "concurrent"
    print(f"served {args.n} {mode} requests in {dt:.2f}s = "
          f"{args.n / dt:.3f} img/s (service batch {service_batch}, "
          f"NFE {args.nfe})")
    print(f"request latency s: p50 {p50:.2f}  p95 {p95:.2f}  p99 {p99:.2f}")
    svc.close()


if __name__ == "__main__":
    main()
