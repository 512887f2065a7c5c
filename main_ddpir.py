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
