"""On-device cost comparison of builtin vs polynomial/bit-trick math
for the expensive per-pixel filter primitives (pow, cos, divide, the
8-knot curve).  Mosaic lowers transcendentals and division to multi-op
VPU sequences; the kernel is compute-bound there, so cheaper exact-
enough formulations translate 1:1 into serving throughput
(tools/bench_filters.py is the per-branch truth table).

Each candidate runs as a 5-step mono kernel on a [B, 3, 512, 512] u8
batch — the same shape/layout as the serving chain.

Usage: python -m exposure_tpu.tools.bench_fastmath [--batch 256]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exposure_tpu.ops import fastmath as fm


def serialized_time(fn, x0, n_small=5, n_big=20, rounds=2):
    """Dependency-chained slope timing: ``block_until_ready`` can
    acknowledge before execution completes on the remote tunnel
    (CLAUDE.md / tools/bench_truth.py), so completion is forced by
    fetching a slice of the final output; the small-N run subtracts
    the fixed dispatch/fetch overhead."""
    def run(n):
        x = x0
        t0 = time.time()
        for _ in range(n):
            x = fn(x)
        np.asarray(x[0, 0, :2, :2])
        return time.time() - t0

    run(2)
    t_s = min(run(n_small) for _ in range(rounds))
    t_b = min(run(n_big) for _ in range(rounds))
    return max((t_b - t_s) / (n_big - n_small), 1e-9)


# ---- candidate per-channel ops (applied 5x to r,g,b) ----------------------

def op_copy(c):
    return c


def op_pow_builtin(c):
    return jnp.power(jnp.maximum(c, 0.001), 0.7)


def op_pow_fast(c):
    return fm.fast_pow(jnp.maximum(c, 0.001), 0.7)


def op_pow_exp2log2(c):
    # same function as the builtin on positive inputs, but skips the
    # general pow lowering's negative-base/edge-case handling
    return jnp.exp2(0.7 * jnp.log2(jnp.maximum(c, 0.001)))


def op_pow_explog(c):
    return jnp.exp(0.7 * jnp.log(jnp.maximum(c, 0.001)))


def op_cos_builtin(c):
    return -jnp.cos(jnp.pi * jnp.clip(c, 0.0, 1.0)) * 0.5 + 0.5


def op_cos_fast(c):
    return fm.fast_half_cos_pi(jnp.clip(c, 0.0, 1.0))


def op_div_builtin(c):
    return 0.5 / (c + 1e-6)


def op_div_fast(c):
    return 0.5 * fm.fast_rcp(c + 1e-6)


_T = [1.1, 0.9, 1.3, 0.7, 1.2, 0.8, 1.05, 0.95]


def op_curve_clip(c):
    total = c * 0
    for i in range(8):
        total = total + jnp.clip(c - i / 8.0, 0.0, 1.0 / 8.0) * _T[i]
    return total * (8.0 / sum(_T))


def op_curve_relu(c):
    return fm.curve_relu(c, _T, 8.0 / sum(_T))


OPS = {
    'copy': op_copy,
    'pow_builtin': op_pow_builtin,
    'pow_fast': op_pow_fast,
    'pow_exp2log2': op_pow_exp2log2,
    'pow_explog': op_pow_explog,
    'cos_builtin': op_cos_builtin,
    'cos_fast': op_cos_fast,
    'div_builtin': op_div_builtin,
    'div_fast': op_div_fast,
    'curve_clip': op_curve_clip,
    'curve_relu': op_curve_relu,
}


def _kernel(img_ref, out_ref, *, op, steps=5):
    def dq(x):
        return x.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    r, g, b = dq(img_ref[0, 0]), dq(img_ref[0, 1]), dq(img_ref[0, 2])
    for _ in range(steps):
        r, g, b = op(r), op(g), op(b)

    def q(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(
            jnp.int32).astype(jnp.uint8)
    out_ref[0, 0], out_ref[0, 1], out_ref[0, 2] = q(r), q(g), q(b)


def run_op(img, op, tile=(256, 256)):
    b, _, h, w = img.shape
    th, tw = tile
    return pl.pallas_call(
        functools.partial(_kernel, op=op),
        grid=(b, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, 3, th, tw),
                               lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, th, tw),
                               lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
    )(img)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--res', type=int, default=512)
    parser.add_argument('--only', default=None,
                        help='comma-separated op-name substrings to run')
    args = parser.parse_args()
    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(args.batch, 3, args.res, args.res) * 200
                       + 20).astype(np.uint8))

    # numeric sanity on-device (f32 path via dequantized u8 grid)
    report = {}
    subs = args.only.split(',') if args.only else None
    for name, op in OPS.items():
        if subs and not any(s in name for s in subs):
            continue
        fn = jax.jit(lambda x, o=op: run_op(x, o))
        dt = serialized_time(fn, img)
        report[name + '_ms'] = round(dt * 1000, 2)
        print('%-14s %7.2f ms/batch' % (name, dt * 1000))

    # accuracy spot checks vs float64 numpy
    x = np.linspace(1e-3, 1.2, 4097, dtype=np.float32)
    checks = {
        'pow_err': float(np.abs(
            np.asarray(jax.jit(op_pow_fast)(jnp.asarray(x)))
            - np.maximum(x, 0.001).astype(np.float64) ** 0.7).max()),
        'cos_err': float(np.abs(
            np.asarray(jax.jit(op_cos_fast)(jnp.asarray(x)))
            - (-np.cos(np.pi * np.clip(x, 0, 1)) * 0.5 + 0.5)).max()),
        'div_err': float(np.abs(
            np.asarray(jax.jit(op_div_fast)(jnp.asarray(x)))
            - 0.5 / (x.astype(np.float64) + 1e-6)).max()),
        'curve_err': float(np.abs(
            np.asarray(jax.jit(op_curve_relu)(jnp.asarray(x)))
            - np.asarray(jax.jit(op_curve_clip)(jnp.asarray(x)))).max()),
    }
    report.update(checks)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
