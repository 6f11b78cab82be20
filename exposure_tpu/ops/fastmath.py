"""Polynomial / bit-trick implementations of the expensive per-pixel
math in the filter kernels (pow, cos, reciprocal, the 8-knot curve).

The fused chain kernel is VPU-compute-bound (tools/bench_filters.py):
per-branch cost is proportional to elementwise op count, and Mosaic
lowers `pow`/`cos`/`div` to long multi-op sequences.  These versions
trade exactness for op count with bounded error far inside the serving
tolerances (u8 output quantizes at 1/255 ≈ 4e-3; the f32 chain-equality
budget is 1e-4):

- fast_half_cos_pi: -cos(pi x)/2 + 1/2 via an odd sin polynomial;
                   |err| <= ~1e-6 on [0, 1].  USED by the serving
                   kernels: Mosaic's cos costs 26.5 ms vs 4.5 ms for
                   the polynomial on a 256x512^2x5-step batch — 5.9x.
- curve_relu:      the reference 8-knot curve (filters.py:306-322)
                   rewritten as a telescoped max() sum with the
                   per-knot constants folded into scalars — EXACT math
                   (same piecewise-linear function, 3 vector ops/knot
                   vs 5 for the clip form); Tone branch 14.0 -> 10.1 ms
                   on device.  USED.
- fast_pow / fast_exp2 / fast_log2: polynomial exp2(g log2 x);
                   |err| <= ~4e-5 for outputs in [0, 1.2], exponents
                   in [1/3, 3] (the gamma range).  NOT wired into the
                   kernels (10.85 ms) — but the BUILTIN composition
                   jnp.exp2(g*jnp.log2(x)) measured 5.0x faster than
                   jnp.power (1.92 vs 9.66 ms) and IS the fast gamma
                   (ops/pallas_chain.py::_gamma_fast); the polynomial
                   stays as a library because the tradeoff is
                   toolchain-dependent.
- fast_rcp:        Newton iterations from the classic bit-trick seed;
                   relative error <= ~1e-6.  NOT wired in: hardware
                   f32 divide measured 1.6x FASTER than the Newton
                   sequence on this toolchain.

On-device numbers: tools/bench_fastmath.py (slope-timed).

All functions are jnp-only and compile both in XLA and inside Pallas
TPU kernels (bitcasts lower to tpu.bitcast; validated on-device by
tools/bench_fastmath.py and tools/verify_kernel.py).
"""

import jax
import jax.numpy as jnp

# minimax-fit coefficients (tools/bench_fastmath.py documents the fit
# and the measured max errors)
_LOG2_C = (0.04392957, -0.40948426, 1.61020813, -3.52027091,
           5.06979932, -2.79416749)
_EXP2_C = (0.00189511, 0.00894622, 0.05586326, 0.24014079,
           0.69315462, 0.9999999)
_SIN_C = (-0.55945275, 2.54400687, -5.16740635, 3.14159026)


def _poly(coeffs, x):
    acc = coeffs[0] * jnp.ones_like(x)
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def fast_log2(x):
    """log2(x) for x > 0 (f32): exponent from the float bits, mantissa
    via a degree-5 polynomial on [1, 2)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = jnp.right_shift(bits, 23) - 127
    m = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(bits, 0x007FFFFF), 0x3F800000),
        jnp.float32)
    return e.astype(jnp.float32) + _poly(_LOG2_C, m)


def fast_exp2(y):
    """2**y for y in roughly [-30, 30] (f32): integer part via exponent
    bits, fraction via a degree-5 polynomial on [0, 1)."""
    y = jnp.clip(y, -126.0, 126.0)
    k = jnp.floor(y)
    f = y - k
    scale = jax.lax.bitcast_convert_type(
        jnp.left_shift(k.astype(jnp.int32) + 127, 23), jnp.float32)
    return _poly(_EXP2_C, f) * scale


def fast_pow(x, g):
    """x**g for x > 0; g may be a scalar or broadcastable array."""
    return fast_exp2(g * fast_log2(x))


def fast_half_cos_pi(x):
    """-cos(pi x)/2 + 1/2 on x in [0, 1] (the ContrastFilter luminance
    remap, filters.py:411-419): cos(pi x) = -sin(pi (x - 1/2))."""
    u = x - 0.5
    return _poly(_SIN_C, u * u) * u * 0.5 + 0.5


def fast_rcp(x, iters=3):
    """1/x for x > 0 via bit-trick seed + Newton (y <- y (2 - x y))."""
    y = jax.lax.bitcast_convert_type(
        0x7EF311C3 - jax.lax.bitcast_convert_type(x, jnp.int32),
        jnp.float32)
    for _ in range(iters):
        y = y * (2.0 - x * y)
    return y


def curve_relu(x, knots, norm):
    """The reference piecewise-linear curve (filters.py:306-322)
    rewritten with one ``max`` per knot:

      sum_i t_i clip(x - i/K, 0, 1/K)
        = sum_i d_i relu(x - c_i) - t_{K-1} relu(x - 1)     (telescoped)
        = sum_i d_i max(x, c_i) - t_{K-1} max(x, 1) + C0    (max form)

    with d_i = t_i - t_{i-1}, c_i = i/K, and
    C0 = t_{K-1} - sum_i d_i c_i.  The max form drops the per-term
    subtraction (relu(x-c) = max(x,c) - c, and the -d_i*c_i constants
    fold into C0): 3 vector ops per knot instead of 4 — the
    curve branches are the chain kernel's most expensive
    (tools/bench_filters.py) and are pure VPU-compute-bound.

    ``knots`` are python/trace-time scalars (SMEM values in the
    kernel), so d_i and C0 fold into scalar-unit arithmetic; ``norm``
    is the K/sum(t) normalization."""
    k = len(knots)
    total = jnp.maximum(x, 0.0) * knots[0]
    c0 = knots[k - 1]
    for i in range(1, k):
        d = knots[i] - knots[i - 1]
        total = total + jnp.maximum(x, i / k) * d
        c0 = c0 - d * (i / k)
    total = total - jnp.maximum(x, 1.0) * knots[k - 1]
    return (total + c0) * norm
