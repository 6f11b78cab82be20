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


# ---------------------------------------------------------------------------
# slow tier: the full suite takes ~15-17 min on the 1-vCPU testbed
# (module-scoped compile fixtures dominate); `pytest -m "not slow"` is the
# <5-min developer loop.  Membership = measured >~10 s per test (or a
# whole module when its fixture is the cost) — re-derive with
# `pytest --durations=60` when it drifts.
# ---------------------------------------------------------------------------

_SLOW_NODES = (
    "test_graft_entry.py::test_dryrun_multichip_8",
    "test_e2e.py",
    "test_masking.py",
    "test_streaming.py",
    "test_streaming_trainer.py",
    "test_supervised.py",
    "test_train_step.py::test_fused_iterations_match_sequential",
    "test_train_step.py::test_pool_advances_and_terminates",
    "test_losses.py::TestGeneratorValueLoss::test_gradient_partitioning",
    "test_losses.py::TestCriticLoss::test_critic_grads_flow",
    "test_data.py::TestSyntheticSpread",
    "test_data.py::TestSyntheticTexture",
    "test_serving.py::test_map_batches_depth_invariant",
    "test_serving.py::test_grouped_serving_matches_single_jit",
    "test_pallas_chain.py::test_grouped_runner",
    "test_pallas_chain.py::test_every_single_filter_matches",
    "test_pallas_chain.py::test_masked_chain",
    "test_pallas_chain.py::test_superset_routing_matches_switch",
    "test_pallas_chain.py::test_warmup_superset_precompiles_layout",
    "test_serving.py::test_warmup_superset_one_dispatch_replay",
    "test_serving.py::test_auto_superset_stream_matches_grouped",
    "test_tools.py::TestSelectPolicy::test_select_end_to_end_with_promote",
    "test_tools.py::TestEditSequence",
    "test_fivek_path.py::test_import_validator",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy compile/training tests (full suite only; "
        "deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_NODES):
            item.add_marker(pytest.mark.slow)
