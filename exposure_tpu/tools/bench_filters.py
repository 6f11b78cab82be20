"""Per-filter throughput microbenchmark for the fused chain kernels.

Times a K-step chain of each single filter through the SWITCHLESS static
kernel (signature = (fid,)*K — what the grouped serving path runs), with
dependency-honest slope timing (see tools/bench_truth.py: on the
remote-TPU testbed ``block_until_ready`` can acknowledge early, so
naive loop timing lies).  This is the true per-branch cost table; the
``lax.switch`` kernel costs roughly the SUM of this table's rows per
step, because Mosaic's lowering executes every branch.

Usage: python -m exposure_tpu.tools.bench_filters [--batch 256]
       [--res 512] [--steps 5] [--f32]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from exposure_tpu.ops.filters import max_filter_parameters
from exposure_tpu.ops.pallas_chain import pallas_apply_filter_chain_static
from exposure_tpu.utils.config import load_config


def slope_time(fn, *args, n_small=5, n_big=20, rounds=2):
    def run(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(*args)
        np.asarray(out[0, :2, :2, 0])
        return time.time() - t0

    run(2)
    t_s = min(run(n_small) for _ in range(rounds))
    t_b = min(run(n_big) for _ in range(rounds))
    return max((t_b - t_s) / (n_big - n_small), 1e-9)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--res', type=int, default=512)
    parser.add_argument('--steps', type=int, default=5)
    parser.add_argument('--f32', action='store_true')
    parser.add_argument('--interpret', action='store_true')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--fast', action='store_true',
                        help='serving-default fast-math kernels '
                             '(poly-cos + relu curves)')
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

    results = {}
    total_ms = 0.0
    for fid, f in enumerate(filters):
        n = f.get_num_filter_parameters()
        raw = rng.randn(b, n).astype(np.float32) * 0.3
        reg = np.asarray(f.filter_param_regressor(jnp.asarray(raw)))
        params = np.zeros((k, b, max_p), np.float32)
        params[:, :, :n] = reg.reshape(1, b, n)
        params = jnp.asarray(params)
        sig = (fid,) * k
        fn = jax.jit(lambda im, p, s=sig: pallas_apply_filter_chain_static(
            im, s, p, filters, interpret=args.interpret,
            fast_math=args.fast))
        dt = slope_time(fn, img, params)
        ips = b / dt
        results[f.get_short_name()] = round(ips, 1)
        total_ms += dt * 1000
        print('  %-3s %10.0f img/s  (%.2f ms/batch, %d steps)'
              % (f.get_short_name(), ips, dt * 1000, k))

    print(json.dumps({
        'metric': 'per_filter_images_per_sec',
        'shape': [b, res, res],
        'steps': k,
        'dtype': 'f32' if args.f32 else 'u8',
        'kernel': 'static_switchless' + ('_fast' if args.fast else ''),
        'timing': 'serialized_slope',
        'per_filter': results,
        'sum_all_branches_ms': round(total_ms, 1),
    }))


if __name__ == '__main__':
    main()
