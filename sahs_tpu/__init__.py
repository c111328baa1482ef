"""sahs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of jematy/SAHS-Deformable-Nerf: semantic-aware hyper-space
deformable NeRF facial avatars (Stage I) + SPADE texture refinement
(Stage II), built from scratch for TPU hardware.
"""

from .config import Config, load_config  # noqa: F401

__version__ = "0.1.0"
