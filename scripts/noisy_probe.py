"""Tune (lambda, zeta) for the demo256 noisy operating point (sigma_y=0.05).

One process per task config: the Runner compiles the trajectory ONCE and every
(lambda, zeta) point reuses it (plan tables are runtime jit args), so a sweep
costs compile + N cheap evals instead of N full remote recompiles.

Usage: python scripts/noisy_probe.py [task ...]   (default: all three)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/diffpir_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from diffpir_tpu.config import load_config
from diffpir_tpu.runner import Runner

SWEEPS = {
    # task: (config, [(lambda, zeta), ...]) — seeded from the coarse probe:
    # inpaint 7->39.89 / 12->39.13 / 20->38.09; deblur 3->39.84 / 7->38.68;
    # sr 7->33.24 / 30->29.69  (PSNR dB at sigma_y=0.05, 100 NFE)
    "inpaint": ("configs/demo256_inpaint.yaml",
                [(3.0, None), (5.0, None), (7.0, None), (9.0, None),
                 (7.0, 0.5), (7.0, 0.9)]),
    "deblur": ("configs/demo256_deblur.yaml",
               [(1.0, None), (1.5, None), (2.0, None), (3.0, None),
                (4.5, None), (2.0, 0.5)]),
    "sr": ("configs/demo256_sisr.yaml",
           [(1.5, None), (3.0, None), (5.0, None), (7.0, None),
            (3.0, 0.5), (3.0, 0.9)]),
}


def main() -> None:
    tasks = sys.argv[1:] or list(SWEEPS)
    results = {}
    for task in tasks:
        yaml, points = SWEEPS[task]
        over = {"noise_level_img": 12.75, "save_E": False, "save_L": False,
                "save_LEH": False}
        if task == "inpaint":
            # at sigma_y > 0 recover_known pastes the NOISY observed pixels
            # into the output; measure without it (as the coarse probe did)
            over["recover_known"] = False
        cfg = load_config(yaml, overrides=over)
        runner = Runner(cfg)
        for lam, zeta in points:
            t0 = time.time()
            res = runner.evaluate(lambda_=lam, zeta=zeta)
            line = {"task": task, "lambda": lam,
                    "zeta": zeta if zeta is not None else cfg.zeta,
                    "psnr": round(float(res["psnr"]), 3),
                    "ssim": round(float(res.get("ssim", 0.0)), 4),
                    "wall_s": round(time.time() - t0, 1)}
            results.setdefault(task, []).append(line)
            print("RESULT " + json.dumps(line), flush=True)
    print("SUMMARY " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
