#!/usr/bin/env python
"""Autotune (lambda, zeta) for one image in a single device launch.

The (lambda, zeta) operating point is a runtime argument of the compiled
restore program, and it may be PER-SAMPLE — so a whole candidate grid fits
in one batch: ``Runner.tune_operating_point`` replicates one degraded
observation across the batch, attaches a different (lambda, zeta) to every
row, and scores all candidates from a single launch of the single compiled
program.  The reference can only explore operating points by re-running its
entire driver per value (``main_ddpir.py:548-580``).

    python examples/autotune_operating_point.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpir_tpu.config import load_config
    from diffpir_tpu.runner import Runner

    cfg = load_config(os.path.join(REPO, "configs", "demo64_inpaint.yaml"),
                      overrides=dict(cwd=REPO, save_E=False, save_L=False,
                                     calc_SSIM=True))
    runner = Runner(cfg, use_mesh=False)

    grid = [(lam, None) for lam in (1.0, 3.0, 7.0, 12.0, 20.0, 40.0)]
    res = runner.tune_operating_point(grid)  # first test-set image

    print(f"{'lambda':>8} {'zeta':>6} {'PSNR':>8} {'SSIM':>7}")
    for row in res["results"]:
        print(f"{row['lambda_']:>8.2f} {row['zeta']:>6.2f} "
              f"{row['psnr']:>8.3f} {row['ssim']:>7.4f}")
    best = res["best"]
    print(f"best: lambda={best['lambda_']:g} zeta={best['zeta']:g} "
          f"({best['psnr']:.3f} dB) — {len(grid)} candidates, one launch")


if __name__ == "__main__":
    main()
