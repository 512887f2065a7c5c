#!/bin/sh
# Round-5 protocol-matrix refresh: every BASELINE.md cell measured on ONE
# shipped prior, on a QUIET host (no concurrent CPU pytest — the round-4
# throughput column was host-contended, VERDICT r4 weak #1), with the
# protocol-true 128px box cells (VERDICT r4 missing #1) and Gaussian-deblur
# grids appropriate for the 61px Gaussian PSF (VERDICT r4 weak #4; the
# round-4 sigma=0 Gaussian optimum lambda=20 sat on the GRID EDGE — the
# motion-deblur grid starts at 20 — so that cell gets a wider-down grid too).
#
# Usage: [MODEL=...] [OUT=...] sh scripts/refresh_matrix_r5.sh [stage...]
#   stages (default: the full matrix): clean100 noisy100 nfe20 gaussian box
#   extra stage 'sat': saturation compare of a candidate checkpoint at the
#   shipped prior's pinned sigma=0/100-NFE operating points, e.g.
#     MODEL=demo256_130k OUT=results_protocol/round5/sat130k.jsonl \
#         sh scripts/refresh_matrix_r5.sh sat
set -ex
OUT=${OUT:-results_protocol/round5/final_matrix.jsonl}
M=${MODEL:-demo256}
stages=${*:-clean100 noisy100 nfe20 gaussian box}
mkdir -p "$(dirname "$OUT")"

# the axon tunnel occasionally throws a transient FAILED_PRECONDITION at
# process start (seen right after a previous TPU process exits) — retry each
# cell once after a cool-down before giving up
run() { "$@" || { echo "RETRY after transient failure: $*" >&2; sleep 60; "$@"; }; }

for s in $stages; do
  case $s in
    sat)        # pinned round-4 optima (final_matrix.jsonl sigma=0 rows):
                # 1-point "grid" = 1 launch, then the 100-image evaluation —
                # checkpoint deltas are measured at a FIXED operating point
      run python scripts/eval_protocol.py --model "$M" --tasks inpaint \
          --nfes 100 --sigmas 0 --lambdas 3 --zetas 1.0 --out "$OUT"
      run python scripts/eval_protocol.py --model "$M" --tasks deblur \
          --nfes 100 --sigmas 0 --lambdas 90 --zetas 1.0 --out "$OUT"
      run python scripts/eval_protocol.py --model "$M" --tasks sr \
          --nfes 100 --sigmas 0 --lambdas 250 --zetas 1.0 --out "$OUT" ;;
    clean100)   # sigma=0 / 100-NFE triple (also the saturation protocol cells)
      run python scripts/eval_protocol.py --model "$M" --tasks inpaint deblur sr \
          --nfes 100 --sigmas 0 --tune-images 4 --out "$OUT" ;;
    noisy100)   # sigma_y=0.05 / 100-NFE triple, finer-zeta grids
      run python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
          --sigmas 12.75 --lambdas 1.5 2 2.5 3 --zetas 1.0 0.8 0.6 0.4 0.2 \
          --tune-images 4 --out "$OUT"
      run python scripts/eval_protocol.py --model "$M" --tasks sr --nfes 100 \
          --sigmas 12.75 --lambdas 0.7 1 1.5 2 --zetas 1.0 0.8 0.6 0.4 0.2 \
          --tune-images 4 --out "$OUT"
      run python scripts/eval_protocol.py --model "$M" --tasks inpaint --nfes 100 \
          --sigmas 12.75 --lambdas 3 5 7 10 --zetas 1.0 0.8 0.6 0.4 0.2 \
          --tune-images 4 --out "$OUT" ;;
    nfe20)      # 20-NFE cells, both noise levels
      run python scripts/eval_protocol.py --model "$M" --tasks inpaint deblur sr \
          --nfes 20 --sigmas 0 12.75 --tune-images 4 --out "$OUT" ;;
    gaussian)   # Gaussian-deblur cells at 100 NFE, PSF-appropriate grids
                # (reference setting: main_ddpir_deblur.py:64-66)
      run python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
          --sigmas 0 --blur-mode gaussian --lambdas 2 4 7 12 20 35 60 \
          --zetas 1.0 0.5 --tune-images 4 --out "$OUT"
      run python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
          --sigmas 12.75 --blur-mode gaussian \
          --lambdas 0.5 0.8 1.2 1.8 2.5 3.5 --zetas 1.0 0.5 0.25 \
          --tune-images 4 --out "$OUT" ;;
    box)        # the reference's 128x128 protocol box with 16px margin
                # (configs/inpaint.yaml:42) — --mask-len defaults to 128 and
                # inpaint rows now carry psnr_hole/ssim_hole (the reference
                # avoids box PSNR entirely, README.md:137-138; we publish the
                # hole metrics as the headline for these cells)
      run python scripts/eval_protocol.py --model "$M" --tasks inpaint \
          --nfes 100 20 --sigmas 0 --mask-type box --tune-images 4 \
          --out "$OUT" ;;
  esac
done
