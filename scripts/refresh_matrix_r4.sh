#!/bin/sh
# Round-4 FINAL protocol-matrix refresh — run after the checkpoint decision so
# every cell of the BASELINE.md matrix is measured on ONE shipped prior (the
# interim table mixed 60k-step and 90k-step cells).  All cells use the
# 4-image-averaged single-launch grid tune.  100-NFE programs are warm in this
# driver session's XLA cache; the three 20-NFE programs and the 61-px Gaussian
# deblur program compile fresh (~10-15 min each through the axon tunnel).
#
# Usage: sh scripts/refresh_matrix_r4.sh [stage...]   (default: all stages)
set -ex
OUT=${OUT:-results_protocol/round4/final_matrix.jsonl}
M=${MODEL:-demo256}
stages=${*:-clean100 noisy100 nfe20 gaussian box}

for s in $stages; do
  case $s in
    clean100)   # sigma=0 / 100-NFE triple (also the saturation protocol cells)
      python scripts/eval_protocol.py --model "$M" --tasks inpaint deblur sr \
          --nfes 100 --sigmas 0 --tune-images 4 --out "$OUT" ;;
    noisy100)   # sigma_y=0.05 / 100-NFE triple, finer-zeta grids (retune_round4)
      python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
          --sigmas 12.75 --lambdas 1.5 2 2.5 3 --zetas 1.0 0.8 0.6 0.4 0.2 \
          --tune-images 4 --out "$OUT"
      python scripts/eval_protocol.py --model "$M" --tasks sr --nfes 100 \
          --sigmas 12.75 --lambdas 0.7 1 1.5 2 --zetas 1.0 0.8 0.6 0.4 0.2 \
          --tune-images 4 --out "$OUT"
      python scripts/eval_protocol.py --model "$M" --tasks inpaint --nfes 100 \
          --sigmas 12.75 --lambdas 3 5 7 10 --zetas 1.0 0.8 0.6 0.4 0.2 \
          --tune-images 4 --out "$OUT" ;;
    nfe20)      # 20-NFE cells, both noise levels (fresh compiles)
      python scripts/eval_protocol.py --model "$M" --tasks inpaint deblur sr \
          --nfes 20 --sigmas 0 12.75 --tune-images 4 --out "$OUT" ;;
    gaussian)   # Gaussian-deblur cells (the reference publishes Gaussian AND
                # motion deblur rows) at 100 NFE
      python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
          --sigmas 0 --blur-mode gaussian --tune-images 4 --out "$OUT"
      python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
          --sigmas 12.75 --blur-mode gaussian --tune-images 4 --out "$OUT" ;;
    box)        # box-mask inpainting at the reference's 20/100-NFE pair
                # (README.md:137-138) — same compiled programs as random-mask
      python scripts/eval_protocol.py --model "$M" --tasks inpaint \
          --nfes 100 20 --sigmas 0 --mask-type box --tune-images 4 \
          --out "$OUT" ;;
  esac
done
