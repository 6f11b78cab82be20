"""Mosaic bf16-legalization probe for the fused chain kernels.

Round-2 finding: ``compute_dtype=jnp.bfloat16`` in ops/pallas_chain.py
fails to compile on-device because Mosaic does not legalize SCALAR bf16
arithmetic (arith.addf on bf16 scalars).  The VPU packs bf16 vectors
2x, so in-kernel bf16 is worth having for the compute-bound branches
(G pow, Ct cos, T/C curves) — IF the kernel keeps every scalar in f32
and only the PIXEL VECTORS in bf16.

This probe compiles and times minimal single-op kernels in three
styles, on the real device:
  f32        — baseline (current production kernels)
  bf16_cast  — pixel vectors bf16; scalar params stay f32 and are cast
               scalar-side (x.astype(bf16)) right before the vector op
  bf16_splat — pixel vectors bf16; scalar params broadcast to a vector
               in f32 THEN cast (no scalar bf16 values anywhere)

Each op is looped ``steps`` times in-kernel so math dominates the
HBM traffic.  Prints one JSON line per (op, style): compile ok + ms.

Usage: python -m exposure_tpu.tools.bench_bf16_probe [--batch 64]
"""

import argparse
import functools
import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exposure_tpu.ops import fastmath as fm


def _op_pow(x, gm):
    return jnp.power(jnp.maximum(x, 0.001), gm)


def _op_cos(x, t):
    lum = jnp.clip(x, 0.0, 1.0)
    clum = fm.fast_half_cos_pi(lum)
    return x + (clum - x) * t


def _op_curve(x, knots, norm):
    return fm.curve_relu(x, knots, norm)


def _op_mul(x, m):
    return x * m


def _probe_kernel(params_ref, img_ref, out_ref, *, steps, op, style):
    compute = jnp.bfloat16 if style.startswith('bf16') else jnp.float32

    def dq(v):
        return (v.astype(jnp.int32).astype(jnp.float32) *
                (1.0 / 255.0)).astype(compute)

    x = dq(img_ref[0, 0])

    # scalar params: ALWAYS materialized in f32 from SMEM
    p0 = params_ref[0]
    p1 = params_ref[1]

    def cast(s):
        if style == 'f32':
            return s
        if style == 'bf16_cast':
            return s.astype(jnp.bfloat16)          # scalar truncf
        # bf16_splat: broadcast f32 scalar to a vector, then cast —
        # no scalar bf16 value ever exists
        return jnp.broadcast_to(s, x.shape).astype(jnp.bfloat16)

    for _ in range(steps):
        if op == 'pow':
            x = _op_pow(x, cast(p0))
        elif op == 'cos':
            x = _op_cos(x, cast(p0))
        elif op == 'curve':
            # scalar-side f32 derivation (sum of knots), cast at use
            knots = [p0, p1, p0, p1, p0, p1, p0, p1]
            norm = 8.0 / (sum(knots) + 1e-30)      # f32 scalar math
            x = _op_curve(x, [cast(k) for k in knots], cast(norm))
        elif op == 'mul':
            x = _op_mul(x, cast(p0))

    xf = x.astype(jnp.float32)
    out_ref[0, 0] = jnp.round(jnp.clip(xf, 0.0, 1.0) * 255.0).astype(
        jnp.int32).astype(jnp.uint8)


def probe(op, style, batch, res, steps, interpret=False):
    tile = (256, 256)
    kern = functools.partial(_probe_kernel, steps=steps, op=op,
                             style=style)
    th, tw = tile

    @jax.jit
    def run(params, img):
        return pl.pallas_call(
            kern,
            grid=(img.shape[0], res // th, res // tw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, th, tw),
                             lambda bi, i, j: (bi, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, th, tw),
                                   lambda bi, i, j: (bi, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(img.shape, jnp.uint8),
            interpret=interpret,
        )(params, img)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (batch, 1, res, res), np.uint8))
    params = jnp.asarray([0.8, 1.3], jnp.float32)

    try:
        out = run(params, img)
        np.asarray(out[0, 0, :2, :2])
    except Exception as e:
        return {'op': op, 'style': style, 'ok': False,
                'error': str(e).split('\n')[0][:160]}

    def once():
        return run(params, img)

    # slope timing (tools/bench_truth.py methodology)
    def span(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = once()
        np.asarray(o[0, 0, :2, :2])
        return time.time() - t0

    span(2)
    t_s = min(span(5) for _ in range(2))
    t_b = min(span(20) for _ in range(2))
    ms = (t_b - t_s) / 15 * 1000
    return {'op': op, 'style': style, 'ok': True, 'ms': round(ms, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--steps', type=int, default=8)
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args()

    print('# bf16 probe: backend=%s' % jax.default_backend())
    for op in ('mul', 'pow', 'cos', 'curve'):
        for style in ('f32', 'bf16_cast', 'bf16_splat'):
            r = probe(op, style, args.batch, args.res, args.steps,
                      interpret=args.interpret)
            print(json.dumps(r))


if __name__ == '__main__':
    main()
