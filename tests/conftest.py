"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised host-side (stand-in for a v5e-8
slice), per SURVEY.md §4.

The session environment registers a remote-TPU PJRT plugin at interpreter
startup and programmatically sets ``jax_platforms``; an env var alone is not
enough, so we update the jax config after import and clear any backends that
were initialized during registration.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend, got %s" % jax.devices())


@pytest.fixture
def rng():
    return np.random.RandomState(0)
