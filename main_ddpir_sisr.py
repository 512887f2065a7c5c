#!/usr/bin/env python
"""Super-resolution task driver (reference surface: ``main_ddpir_sisr.py``).

Zero-arg convenience wrapper over the unified runner with the SR defaults,
including the reference's hard-coded lambda sweep (lambda * {2..12},
reference ``main_ddpir_sisr.py:482-486`` / ``main_ddpir.py:548-561``).
"""

import sys

from main_ddpir import main

if __name__ == "__main__":
    if "--opt" not in sys.argv:
        sys.argv += ["--opt", "configs/sisr.yaml"]
    main()
