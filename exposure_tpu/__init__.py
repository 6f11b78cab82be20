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

# Persistent XLA compilation cache: the big jitted programs (the fused
# outer train step, rollouts, chain kernels) compile once per machine
# instead of once per process.  Disable with EXPOSURE_TPU_NO_COMPILE_CACHE.
import os as _os

if not _os.environ.get("EXPOSURE_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("EXPOSURE_TPU_CACHE_DIR",
                            _os.path.expanduser("~/.cache/exposure_tpu_xla")))
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
