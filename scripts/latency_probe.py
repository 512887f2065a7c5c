#!/usr/bin/env python
"""Warm batch-1 serving latency: 256px restore at NFE in {20, 50, 100}.

The latency-vs-quality lever a serving user actually needs (VERDICT r3
weak 4): (lambda, zeta) and the plan tables are runtime arguments, so
choosing an NFE point is the ONLY thing that needs a separate compiled
program; within a program the operating point is free per request.

Measures end-to-end wall time of a single-image restore through
``Runner.restore_batch`` (batch 1) with an explicit host fetch per repeat —
on the axon tunnel ``block_until_ready`` returns before remote execution
finishes, so per-rep fetch timing is the only honest latency (it includes
the ~0.3 s tunnel fetch overhead a remote client would also pay; the
in-datacenter device time is roughly rep_min minus that constant).

Usage: python scripts/latency_probe.py [--model demo256] [--nfes 20 50 100]
           [--task inpaint] [--reps 10] [--cpu]
Prints one JSON line per NFE and a markdown row block for docs/serving.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "inpaint": "configs/demo256_inpaint.yaml",
    "deblur": "configs/demo256_deblur.yaml",
    "sr": "configs/demo256_sisr.yaml",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="demo256")
    ap.add_argument("--task", default="inpaint", choices=list(CONFIGS))
    ap.add_argument("--nfes", nargs="+", type=int, default=[20, 50, 100])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from diffpir_tpu.config import load_config
    from diffpir_tpu.data import make_batches, prepare_images
    from diffpir_tpu.runner import Runner

    rows = []
    for nfe in args.nfes:
        cfg = load_config(CONFIGS[args.task], overrides=dict(
            model_name=args.model, batch_size=1, iter_num=nfe,
            save_E=False, save_L=False, log_process=False))
        runner = Runner(cfg, use_mesh=False)
        np.random.seed(cfg.seed)
        batch = make_batches([prepare_images(cfg)[0]], 1)[0]

        t0 = time.perf_counter()
        runner.restore_batch(batch, seed=0)  # fetch=True blocks on the host copy
        compile_s = time.perf_counter() - t0

        lats = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            runner.restore_batch(batch, seed=r + 1)
            lats.append(time.perf_counter() - t0)
        lats = np.sort(np.asarray(lats))
        row = dict(model=args.model, task=args.task, nfe=nfe,
                   batch=1,
                   latency_ms_min=round(float(lats[0]) * 1e3, 1),
                   latency_ms_p50=round(float(np.median(lats)) * 1e3, 1),
                   latency_ms_p90=round(
                       float(lats[min(len(lats) - 1,
                                      int(0.9 * len(lats)))]) * 1e3, 1),
                   first_call_s=round(compile_s, 1), reps=args.reps)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| NFE | batch-1 p50 (ms) | p90 (ms) | min (ms) |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['nfe']} | {r['latency_ms_p50']:.0f} | "
              f"{r['latency_ms_p90']:.0f} | {r['latency_ms_min']:.0f} |")


if __name__ == "__main__":
    main()
