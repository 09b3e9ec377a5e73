"""occformer_tpu: TPU-native camera-only 3D semantic occupancy framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OccFormer
(zhangyp15/OccFormer): LSS depth-distribution lifting, dual-path 3D
transformer encoding, deformable 3D pixel decoding and Mask2Former-style
occupancy prediction — expressed as statically-shaped, pjit-shardable XLA
programs (see SURVEY.md for the blueprint).
"""

__version__ = "0.1.0"

from . import config, registry  # noqa: F401
