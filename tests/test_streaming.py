"""Streaming train-step tests: host-supplied fresh data (the path the
native hostloader feeds) on the 8-device CPU mesh, checked for
equivalence of behavior with the device-resident path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from exposure_tpu.core.replay import PoolState
from exposure_tpu.core.steps import build_streaming_outer_step
from exposure_tpu.core.train_state import TrainState, make_optimizer
from exposure_tpu.data.synthetic import make_synthetic_pack
from exposure_tpu.models import CriticNet, PolicyNet
from exposure_tpu.parallel.mesh import DATA_AXIS, data_parallel_mesh
from exposure_tpu.utils import load_config
from exposure_tpu.utils.ops import STATE_STEP_DIM


@pytest.fixture(scope='module')
def setup():
    cfg = load_config('test')
    mesh = data_parallel_mesh(8)
    filters = [f(cfg) for f in cfg.filters]
    policy = PolicyNet(
        filter_output_dims=tuple(
            f.get_num_filter_parameters() + f.get_num_mask_parameters()
            for f in filters),
        feature_extractor_dims=cfg.feature_extractor_dims,
        base_channels=cfg.base_channels,
        fc1_size=cfg.fc1_size,
        dropout_keep_prob=cfg.dropout_keep_prob)
    critic = CriticNet(cfg.base_channels, cfg.fc1_size)
    value = CriticNet(cfg.base_channels, cfg.fc1_size)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 64, 64, 3 + cfg.num_state_dim))
    gen = policy.init({'params': key, 'dropout': key}, img)
    crit = critic.init(key, jnp.zeros((2, 64, 64, 3)))
    val = value.init(key, jnp.zeros((2, 64, 64, 3)),
                     jnp.zeros((2, cfg.num_state_dim)))
    tx = make_optimizer()
    state = TrainState.create(gen, val, crit, tx)

    shard = NamedSharding(mesh, P(DATA_AXIS))
    pool_imgs = jax.device_put(
        jnp.asarray(make_synthetic_pack(cfg.replay_memory_size, 64, 'raw',
                                        3)), shard)
    pool = PoolState.create(pool_imgs, cfg.num_state_dim)
    pool = pool.replace(states=jax.device_put(pool.states, shard))
    return cfg, mesh, filters, policy, critic, value, tx, state, pool


def test_streaming_step_runs_and_updates(setup, rng):
    cfg, mesh, filters, policy, critic, value, tx, state, pool = setup
    giters, citers = 2, 2
    step = build_streaming_outer_step(cfg, policy, critic, value, filters,
                                      tx, mesh, giters, citers)
    b, p = cfg.batch_size, cfg.replay_memory_size
    g_fresh = jnp.asarray(
        rng.rand(giters, 2 * b + p, 64, 64, 3).astype(np.float32))
    real = jnp.asarray(
        rng.rand(citers, b, 64, 64, 3).astype(np.float32))
    state2, pool2, metrics = step(state, pool, g_fresh, real,
                                  jax.random.PRNGKey(0),
                                  jnp.float32(1e-4), jnp.float32(1e-4),
                                  jnp.float32(0.0))
    for name, v in metrics._asdict().items():
        assert np.isfinite(np.asarray(v)).all(), name

    def delta(a, b2):
        return sum(float(jnp.abs(x - y).sum()) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b2)))
    assert delta(state.gen_params, state2.gen_params) > 0
    assert delta(state.crit_params, state2.crit_params) > 0
    ps = np.asarray(pool2.states)
    assert ps[:, STATE_STEP_DIM].max() >= 1


def test_streamed_fresh_data_reaches_pool(setup, rng):
    # mark the streamed fresh crops with a sentinel; after enough
    # g-iterations dropped/thinned slots must contain it
    cfg, mesh, filters, policy, critic, value, tx, state, pool = setup
    giters = 6
    step = build_streaming_outer_step(cfg, policy, critic, value, filters,
                                      tx, mesh, giters, 0)
    b, p = cfg.batch_size, cfg.replay_memory_size
    g_fresh = jnp.full((giters, 2 * b + p, 64, 64, 3), 0.123456)
    real = jnp.zeros((0, b, 64, 64, 3))
    st, pl, _ = step(state, pool, g_fresh, real, jax.random.PRNGKey(1),
                     jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    # run more iterations so trajectories terminate and get dropped
    for i in range(3):
        st, pl, _ = step(st, pl, g_fresh, real, jax.random.fold_in(
            jax.random.PRNGKey(2), i), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0))
    imgs = np.asarray(pl.images)
    is_sentinel = np.isclose(imgs, 0.123456).all(axis=(1, 2, 3))
    assert is_sentinel.any(), 'no fresh streamed record entered the pool'
