#!/usr/bin/env python
"""Generate the held-out demo256 validation set (protocol-scale evaluation).

The reference evaluates its published tables over 100 validation images
(``/root/reference/testsets/ffhq_val_100/ffhq_val_100.txt``,
``README.md:121-138``); this writes the analogous 100-image held-out set for
the repo-trained demo256 prior: draws from the SAME rich-texture synthetic
distribution the prior was trained on (``scripts/train_demo.py synth_batch``,
rich=True) at a seed disjoint from every training pool (round-3 pool seed 0,
round-4 continuation pool seed 1, 4-image testset) — the distribution is
continuous, so a fresh seed IS a held-out sample.

Usage: python scripts/make_valset.py [--n 100] [--seed 777]
       [--out testsets/demo256_val100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="testsets/demo256_val100")
    args = ap.parse_args()

    from scripts.train_demo import synth_batch
    from diffpir_tpu.utils import image as im

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    imgs = synth_batch(rng, args.n, IMG=args.size, rich=True)  # [-1, 1]
    for i in range(args.n):
        im.imsave(im.single2uint((imgs[i] + 1.0) / 2.0),
                  os.path.join(args.out, f"val{i:03d}.png"))
    print(f"wrote {args.n} {args.size}px images (seed {args.seed}) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
