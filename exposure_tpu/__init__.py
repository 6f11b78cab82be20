"""exposure_tpu: a TPU-native (JAX/XLA/Pallas/pjit) white-box photo
post-processing framework with the capabilities of yuanming-hu/exposure
(SIGGRAPH 2018).

Subpackages
-----------
- ``exposure_tpu.ops``      differentiable filter bank, categorical sampling,
  fused Pallas filter-chain kernels.
- ``exposure_tpu.models``   Flax policy (agent), critic and value networks.
- ``exposure_tpu.core``     losses, device-resident replay pool, train state,
  trainer, evaluator, checkpointing.
- ``exposure_tpu.data``     MIT-Adobe FiveK / artist / folder data providers.
- ``exposure_tpu.parallel`` mesh + sharding helpers (data-parallel over ICI).
- ``exposure_tpu.utils``    config Dict, color science, image IO, logging.
"""

__version__ = "0.1.0"
