"""diffpir_tpu — a TPU-native plug-and-play diffusion image-restoration framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
yuanzhi-zhu/DiffPIR (CVPR-W NTIRE 2023): super-resolution, deblurring and
inpainting by alternating a pre-trained diffusion UNet denoiser with
closed-form data-fidelity proximal steps inside a single compiled
``jax.lax.scan`` sampling trajectory.
"""

__version__ = "0.1.0"

from diffpir_tpu.config import TaskConfig, load_config
from diffpir_tpu.schedule import NoiseSchedule, TrajectoryPlan, build_plan

__all__ = ["TaskConfig", "load_config", "NoiseSchedule", "TrajectoryPlan", "build_plan"]
