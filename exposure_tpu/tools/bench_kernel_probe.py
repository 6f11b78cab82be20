"""Kernel cost isolation probe (dependency-serialized timings).

Separates the fused chain's cost into: per-step lax.switch overhead,
single-branch math cost, pallas_call fixed cost, and compares against
the branchless jnp chain (XLA-fused) on identical inputs — the data
needed to decide which replay path is actually fastest on this
toolchain.

Usage: python -m exposure_tpu.tools.bench_kernel_probe [--batch 256]
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

from exposure_tpu.ops.chain import apply_filter_chain
from exposure_tpu.ops.filters import max_filter_parameters
from exposure_tpu.ops.pallas_chain import pallas_apply_filter_chain
from exposure_tpu.utils.config import load_config


def serialized_time(fn, x, iters, *args):
    x = fn(x, *args)
    x = jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(iters):
        x = fn(x, *args)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


# ---- switchless single-filter kernels -------------------------------------

def _mono_kernel(img_ref, out_ref, *, steps, op):
    def dq(x):
        return x.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    r, g, b = dq(img_ref[0, 0]), dq(img_ref[0, 1]), dq(img_ref[0, 2])
    for _ in range(steps):
        if op == 'E':
            r, g, b = r * 1.5, g * 1.5, b * 1.5
        elif op == 'G':
            r = jnp.power(jnp.maximum(r, 0.001), 0.8)
            g = jnp.power(jnp.maximum(g, 0.001), 0.8)
            b = jnp.power(jnp.maximum(b, 0.001), 0.8)
        elif op == 'copy':
            pass

    def q(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(
            jnp.int32).astype(jnp.uint8)
    out_ref[0, 0] = q(r)
    out_ref[0, 1] = q(g)
    out_ref[0, 2] = q(b)


def mono_chain(img, steps, op, tile=(256, 256)):
    b, h, w, c = img.shape
    planar = jnp.transpose(img, (0, 3, 1, 2))
    th, tw = tile
    kernel = functools.partial(_mono_kernel, steps=steps, op=op)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th, w // tw),
        in_specs=[pl.BlockSpec((1, 3, th, tw), lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, th, tw), lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(planar.shape, planar.dtype),
    )(planar)
    return jnp.transpose(out, (0, 2, 3, 1))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--res', type=int, default=512)
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()
    b, res = args.batch, args.res

    cfg = load_config('example')
    filters = [f(cfg) for f in cfg.filters]
    rng = np.random.RandomState(0)
    img8 = jnp.asarray((rng.rand(b, res, res, 3) * 200 + 20).astype(
        np.uint8))
    report = {'batch': b, 'res': res}

    # A. switchless pallas kernels
    for name, steps, op in (('pallas_copy_0step', 0, 'copy'),
                            ('pallas_E_1step', 1, 'E'),
                            ('pallas_E_5step', 5, 'E'),
                            ('pallas_G_5step', 5, 'G')):
        fn = jax.jit(lambda x, s=steps, o=op: mono_chain(x, s, o))
        dt = serialized_time(fn, img8, args.iters)
        report[name + '_ms'] = round(dt * 1000, 2)

    # B. the real switch kernel, 1 and 5 steps, all-E ids
    max_p = max_filter_parameters(filters)
    for k in (1, 5):
        ids = jnp.zeros((k, b), jnp.int32)  # all E
        params = jnp.zeros((k, b, max_p), jnp.float32)
        params = params.at[:, :, 0].set(0.5)
        fn = jax.jit(lambda x, i, p: pallas_apply_filter_chain(
            x, i, p, filters))
        dt = serialized_time(fn, img8, args.iters, ids, params)
        report['switch_E_%dstep_ms' % k] = round(dt * 1000, 2)

    # C. branchless jnp chain (XLA-fused), f32 I/O, 5 steps all-E
    imgf = img8.astype(jnp.float32) / 255.0
    ids = jnp.zeros((5, b), jnp.int32)
    params = jnp.zeros((5, b, max_p), jnp.float32).at[:, :, 0].set(0.5)
    jfn = jax.jit(lambda x, i, p: apply_filter_chain(x, i, p, filters))
    dt = serialized_time(jfn, imgf, args.iters, ids, params)
    report['jnp_chain_5step_f32_ms'] = round(dt * 1000, 2)

    # D. f32 switch kernel for an apples-to-apples vs C
    fnf = jax.jit(lambda x, i, p: pallas_apply_filter_chain(
        x, i, p, filters))
    dt = serialized_time(fnf, imgf, args.iters, ids, params)
    report['switch_E_5step_f32_ms'] = round(dt * 1000, 2)

    print(json.dumps(report))


if __name__ == '__main__':
    main()
