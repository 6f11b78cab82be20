"""Ground-truth serving measurement: dependency-serialized timing.

Remote-TPU backends can pipeline or acknowledge dispatches in ways that
make wall-clock-over-N-async-calls flatter the true device throughput.
This tool removes every ambiguity by FORCING serialization through data
dependency — each call's input IS the previous call's output (u8 chain:
same shape/dtype) — and by measuring a null program and a pure memcpy on
the same shapes to separate per-call overhead and HBM bandwidth from
filter math.

Reported lines:
  null_call_ms        per-call overhead (tiny dependent computation)
  memcpy_gbps         HBM copy bandwidth on the benchmark buffer
  chain_<mix>_img_s   dependency-serialized fused-chain throughput for a
                      cheap mix (all-Exposure), a trained-like mix
                      (E,G,Ct,S+,T round robin), and per worst filter.

Usage: python -m exposure_tpu.tools.bench_truth [--batch 256] [--res 512]
       [--iters 20]
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


def serialized_time(fn, x, iters, *args):
    """Median-free, fully ordered: x_{i+1} = fn(x_i, ...)."""
    x = fn(x, *args)
    x = jax.block_until_ready(x)  # warmup/compile
    t0 = time.time()
    for _ in range(iters):
        x = fn(x, *args)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


def make_traj(filters, mix, k, b):
    max_p = max_filter_parameters(filters)
    rng = np.random.RandomState(0)
    names = [f.get_short_name() for f in filters]
    ids = np.zeros((k, b), np.int32)
    for s in range(k):
        name = mix[s % len(mix)]
        ids[s, :] = names.index(name)
    params = np.zeros((k, b, max_p), np.float32)
    for s in range(k):
        f = filters[ids[s, 0]]
        n = f.get_num_filter_parameters()
        raw = rng.randn(b, n).astype(np.float32) * 0.3
        reg = np.asarray(f.filter_param_regressor(jnp.asarray(raw)))
        params[s, :, :n] = reg
    return jnp.asarray(ids), jnp.asarray(params)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--res', type=int, default=512)
    parser.add_argument('--steps', type=int, default=5)
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--interpret', action='store_true')
    args = parser.parse_args()
    b, res, k = args.batch, args.res, args.steps

    cfg = load_config('example')
    filters = [f(cfg) for f in cfg.filters]
    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(b, res, res, 3) * 200 + 20).astype(np.uint8))

    report = {'batch': b, 'res': res, 'steps': k,
              'device': str(jax.devices()[0].device_kind)}

    # 1. per-call overhead: tiny dependent op
    tiny = jnp.zeros((8, 128), jnp.float32)
    null_fn = jax.jit(lambda x: x + 1.0)
    report['null_call_ms'] = round(
        serialized_time(null_fn, tiny, args.iters) * 1000, 3)

    # 2. HBM copy bandwidth on the benchmark buffer (dependent add)
    copy_fn = jax.jit(lambda x: x + jnp.uint8(1))
    dt = serialized_time(copy_fn, img, args.iters)
    nbytes = img.size * 2  # read + write
    report['memcpy_ms'] = round(dt * 1000, 3)
    report['memcpy_gbps'] = round(nbytes / dt / (1 << 30), 1)

    # 3. dependency-serialized chains
    mixes = {
        'cheap_all_E': ['E'],
        'trained_EGCtSpT': ['E', 'G', 'Ct', 'S+', 'T'],
        'heavy_all_G': ['G'],
        'heavy_all_Sp': ['S+'],
        'heavy_all_C': ['C'],
    }
    for name, mix in mixes.items():
        ids, params = make_traj(filters, mix, k, b)
        fn = jax.jit(lambda x, i, p: pallas_apply_filter_chain(
            x, i, p, filters, interpret=args.interpret))
        dt = serialized_time(fn, img, args.iters, ids, params)
        report['chain_%s_ms' % name] = round(dt * 1000, 2)
        report['chain_%s_img_s' % name] = round(b / dt, 1)

    print(json.dumps(report))


if __name__ == '__main__':
    main()
