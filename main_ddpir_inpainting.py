#!/usr/bin/env python
"""Inpainting task driver (reference surface: ``main_ddpir_inpainting.py``)."""

import sys

from main_ddpir import main

if __name__ == "__main__":
    if "--opt" not in sys.argv:
        sys.argv += ["--opt", "configs/inpaint.yaml"]
    main()
