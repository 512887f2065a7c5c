#!/usr/bin/env python
"""Deblurring task driver (reference surface: ``main_ddpir_deblur.py``).

Zero-arg wrapper over the unified runner with deblur defaults; the
reference's effective hyperparameters (lambda*7, zeta*3,
``main_ddpir.py:562-570``) are applied by the sweep unless --no-sweep.
"""

import sys

from main_ddpir import main

if __name__ == "__main__":
    if "--opt" not in sys.argv:
        sys.argv += ["--opt", "configs/deblur.yaml"]
    main()
