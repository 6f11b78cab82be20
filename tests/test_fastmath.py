"""Accuracy bounds for the polynomial/bit-trick math used by the fast
kernel path (exposure_tpu/ops/fastmath.py).  The serving tolerances
these must stay far inside: u8 quantization step 1/255 ~= 4e-3, f32
chain-equality budget 1e-4 (tools/verify_kernel.py)."""

import jax.numpy as jnp
import numpy as np

from exposure_tpu.ops import fastmath as fm


def test_fast_pow_gamma_range():
    # gamma filter exponents are exp(tanh_range(+-ln 3)) in [1/3, 3];
    # inputs are max(x, 1e-3) chain intermediates
    x = np.linspace(1e-3, 2.0, 40001).astype(np.float32)
    for g in (1.0 / 3, 0.7, 1.0, 1.7, 3.0):
        got = np.asarray(fm.fast_pow(jnp.asarray(x), g))
        ref = x.astype(np.float64) ** g
        sel = ref <= 1.3  # display range + headroom
        assert np.abs(got - ref)[sel].max() < 5e-5, g


def test_fast_half_cos_pi():
    x = np.linspace(0.0, 1.0, 40001).astype(np.float32)
    got = np.asarray(fm.fast_half_cos_pi(jnp.asarray(x)))
    ref = -np.cos(np.pi * x) * 0.5 + 0.5
    assert np.abs(got - ref).max() < 2e-6


def test_fast_rcp():
    x = np.linspace(1e-3, 4.0, 40001).astype(np.float32)
    got = np.asarray(fm.fast_rcp(jnp.asarray(x)))
    rel = np.abs(got * x.astype(np.float64) - 1.0)
    assert rel.max() < 1e-6


def test_curve_relu_matches_clip_form():
    # EXACT reformulation of the reference curve (filters.py:306-322),
    # including out-of-range inputs (chain intermediates exceed [0, 1])
    rng = np.random.RandomState(0)
    x = np.concatenate([np.linspace(-0.5, 2.0, 20001),
                        rng.rand(1000) * 3 - 1]).astype(np.float32)
    knots = list(0.5 + rng.rand(8) * 1.5)
    norm = 8.0 / sum(knots)
    clip_form = sum(np.clip(x - i / 8, 0, 1 / 8) * knots[i]
                    for i in range(8)) * norm
    relu_form = np.asarray(fm.curve_relu(jnp.asarray(x), knots, norm))
    assert np.abs(clip_form - relu_form).max() < 2e-6


def test_fast_log2_exp2_roundtrip():
    x = np.linspace(1e-3, 8.0, 40001).astype(np.float32)
    back = np.asarray(fm.fast_exp2(fm.fast_log2(jnp.asarray(x))))
    assert np.abs(back / x - 1.0).max() < 1e-4
