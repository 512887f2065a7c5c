#!/bin/sh
# Round-4 finer-zeta retunes of the protocol matrix (run AFTER sat90k eval so
# the NFE=100 batch-20 programs are warm in the persistent cache).
#
# Every committed matrix cell picked zeta at the tune grid's edge (1.0, the
# coarse {1.0, 0.5} cross); the reference's published operating points go
# down to zeta=0.1 (deblur) / 0.25 (SR), so probe that regime per cell with
# a 4-lambda x 5-zeta = 20-point single-launch grid centered on each cell's
# committed lambda. If the finer tune does not beat the committed n=100 row,
# the committed row stands (and the zeta=1.0 optimum is then evidence, not
# a grid artifact).
set -ex
OUT=results_protocol/round4/retune.jsonl
M=${MODEL:-demo256}

# noisy cells, NFE=100 (programs shared with sat eval)
python scripts/eval_protocol.py --model "$M" --tasks deblur --nfes 100 \
    --sigmas 12.75 --lambdas 1.5 2 2.5 3 --zetas 1.0 0.8 0.6 0.4 0.2 --tune-images 4 --out $OUT
python scripts/eval_protocol.py --model "$M" --tasks sr --nfes 100 \
    --sigmas 12.75 --lambdas 1 1.5 2 3 --zetas 1.0 0.8 0.6 0.4 0.2 --tune-images 4 --out $OUT
python scripts/eval_protocol.py --model "$M" --tasks inpaint --nfes 100 \
    --sigmas 12.75 --lambdas 3 5 7 10 --zetas 1.0 0.8 0.6 0.4 0.2 --tune-images 4 --out $OUT
