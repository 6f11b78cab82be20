"""Per-filter throughput microbenchmark for the fused chain kernel.

The kernel's cost is branch-dependent (lax.switch executes the selected
filter's math per image): a trained policy picks pow/HSV-heavy filters,
so serving throughput depends on the action mix.  This tool forces
every trajectory step to one filter at a time and reports per-filter
images/sec at the benchmark shape — the data needed to find and fix the
slow branch.

Usage: python -m exposure_tpu.tools.bench_filters [--batch 256]
       [--res 512] [--steps 5] [--f32] [--iters 5]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from exposure_tpu.ops.filters import max_filter_parameters
from exposure_tpu.ops.pallas_chain import pallas_apply_filter_chain
from exposure_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--res', type=int, default=512)
    parser.add_argument('--steps', type=int, default=5)
    parser.add_argument('--iters', type=int, default=5)
    parser.add_argument('--f32', action='store_true')
    parser.add_argument('--kernel-bf16', action='store_true')
    parser.add_argument('--interpret', action='store_true')
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        args.interpret = True

    cfg = load_config('example')
    filters = [f(cfg) for f in cfg.filters]
    max_p = max_filter_parameters(filters)
    rng = np.random.RandomState(0)

    b, res, k = args.batch, args.res, args.steps
    imgf = rng.rand(b, res, res, 3).astype(np.float32) * 0.9
    img = jnp.asarray(imgf if args.f32 else
                      (imgf * 255).round().astype(np.uint8))

    cdt = jnp.bfloat16 if args.kernel_bf16 else jnp.float32
    fn = jax.jit(lambda im, ids, params: pallas_apply_filter_chain(
        im, ids, params, filters, interpret=args.interpret,
        compute_dtype=cdt))

    results = {}
    for fid, f in enumerate(filters):
        n = f.get_num_filter_parameters()
        raw = rng.randn(b, n).astype(np.float32)
        reg = np.asarray(f.filter_param_regressor(jnp.asarray(raw)))
        params = np.zeros((k, b, max_p), np.float32)
        params[:, :, :n] = reg.reshape(1, b, n)
        ids = jnp.full((k, b), fid, jnp.int32)
        params = jnp.asarray(params)

        out = fn(img, ids, params)
        jax.block_until_ready(out)  # compile once (shape-identical; the
        # switch makes all ids one program, so only the first compiles)
        best = float('inf')
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(img, ids, params)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / args.iters)
        ips = b / best
        results[f.get_short_name()] = round(ips, 1)
        print('  %-3s %10.0f img/s  (%.2f ms/batch)'
              % (f.get_short_name(), ips, best * 1000))

    print(json.dumps({
        'metric': 'per_filter_images_per_sec',
        'shape': [b, res, res],
        'steps': k,
        'dtype': 'f32' if args.f32 else 'u8',
        'compute': 'bf16' if args.kernel_bf16 else 'f32',
        'per_filter': results,
    }))


if __name__ == '__main__':
    main()
