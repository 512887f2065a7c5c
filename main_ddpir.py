#!/usr/bin/env python
"""DiffPIR-TPU unified entry point.

Public surface parity with the reference driver
(``/root/reference/main_ddpir.py``):

    python main_ddpir.py --opt configs/{sisr,deblur,inpaint}.yaml

plus TPU-native extras: ``--no-sweep`` (single (lambda, zeta) run instead of
the reference's hard-coded sweeps), ``--set key=value`` config overrides, and
``--cpu`` to force the CPU backend.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--opt", type=str, required=True, help="Path to option YAML file.")
    p.add_argument("--no-sweep", action="store_true",
                   help="run only the configured (lambda, zeta), not the "
                        "reference sweep grid")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="config override (repeatable)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--tune", type=str, default=None, metavar="L1,L2,...",
                   help="autotune: score this lambda grid for one test image "
                        "in a single batched launch (per-sample operating "
                        "points) and print the per-candidate table; entries "
                        "may be 'lambda' or 'lambda:zeta'")
    p.add_argument("--tune-index", type=int, default=0, metavar="I",
                   help="test-set image index --tune runs on (default 0)")
    p.add_argument("--tune-images", type=int, default=1, metavar="K",
                   help="average the --tune grid over K consecutive test "
                        "images starting at --tune-index (K launches of one "
                        "compiled program)")
    p.add_argument("--json", action="store_true", help="print results as JSON")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the evaluation into DIR")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_compile_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/diffpir_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from diffpir_tpu.config import load_config
    from diffpir_tpu.runner import Runner

    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    cfg = load_config(args.opt, overrides)

    if cfg.save_E or cfg.save_L:
        os.makedirs(cfg.E_path, exist_ok=True)
        shutil.copyfile(args.opt, os.path.join(cfg.E_path, "config.yaml"))

    runner = Runner(cfg)
    import contextlib

    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        if args.tune:
            pts = []
            for tok in args.tune.split(","):
                lam, _, zet = tok.partition(":")
                pts.append((float(lam), float(zet) if zet else None))
            res = runner.tune_operating_point(
                pts, index=args.tune_index,
                indices=(range(args.tune_index,
                               args.tune_index + args.tune_images)
                         if args.tune_images > 1 else None))
            print(f"{'lambda':>8} {'zeta':>6} {'PSNR':>8}"
                  + ("    SSIM" if cfg.calc_SSIM else ""))
            for row in res["results"]:
                print(f"{row['lambda_']:>8.3f} {row['zeta']:>6.2f} "
                      f"{row['psnr']:>8.3f}"
                      + (f"  {row['ssim']:.4f}" if "ssim" in row else ""))
            best = res["best"]
            print(f"best: lambda={best['lambda_']:g} zeta={best['zeta']:g} "
                  f"({best['psnr']:.3f} dB) — {len(pts)} candidates, "
                  f"{args.tune_images} launch(es) of one compiled program")
            if args.json:
                json.dump(res["results"], sys.stdout, indent=2, default=float)
                print()
            return res["results"]
        if args.no_sweep:
            results = [runner.evaluate()]
        else:
            results = runner.evaluate_sweep()

    if len(results) > 1:
        # sweeps share one compiled program (lambda/zeta are runtime jit
        # args), so multi-point runs are routine — summarize them
        best = max(results, key=lambda r: r["psnr"])
        print("sweep summary:")
        for r in results:
            mark = "  <-- best" if r is best else ""
            print(f"  lambda={r['lambda_']:g} zeta={r['zeta']:g}: "
                  f"{r['psnr']:.2f} dB"
                  + (f" / SSIM {r['ssim']:.4f}" if r.get("ssim") else "")
                  + mark)

    if args.json:
        json.dump(results, sys.stdout, indent=2, default=float)
        print()
    return results


if __name__ == "__main__":
    main()
