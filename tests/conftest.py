"""Test harness: force an 8-virtual-device CPU JAX runtime before jax imports.

This exercises all mesh/sharding code paths without TPU hardware
(SURVEY.md §4 test strategy).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

# the environment pre-seeds jax_platforms='axon,cpu' (TPU tunnel); tests must
# run on the virtual 8-device CPU backend regardless
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Allow tests to import the PyTorch reference for golden-value parity.

    Stubs cv2/torchvision (absent in this env; reference ``utils_image``
    imports them at module top level but the functions under test don't
    need them).
    """
    import types

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    if "motionblur" not in sys.modules:  # external pip pkg the reference needs
        mb = types.ModuleType("motionblur")

        class _Kernel:  # minimal stand-in; tests never exercise it
            def __init__(self, size=(61, 61), intensity=0.5):
                import numpy as _np

                k = _np.zeros(size)
                k[size[0] // 2, size[1] // 2] = 1.0
                self.kernelMatrix = k

        mb.Kernel = _Kernel
        mb.__path__ = []  # mark as package: reference imports motionblur.motionblur
        sub = types.ModuleType("motionblur.motionblur")
        sub.Kernel = _Kernel
        mb.motionblur = sub
        sys.modules["motionblur"] = mb
        sys.modules["motionblur.motionblur"] = sub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
