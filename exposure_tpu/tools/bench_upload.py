"""Probe host->device upload bandwidth through the remote-TPU tunnel.

Times jnp.asarray(host_array) + forced completion for a range of sizes,
slope-style (median of reps, fresh buffers each rep so no caching), to
establish whether streaming-training bundle uploads are tunnel-bound.

Usage: python -m exposure_tpu.tools.bench_upload [--mb 27 270] [--reps 5]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mb', type=int, nargs='+', default=[1, 27, 270])
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print('# device:', dev)
    # force one tiny op first (warm the tunnel)
    jnp.zeros(8).block_until_ready()

    out = {}
    for mb in args.mb:
        n = mb * (1 << 20) // 4
        times = []
        for r in range(args.reps):
            host = np.random.rand(n).astype(np.float32)
            t0 = time.perf_counter()
            d = jax.device_put(host, dev)
            # force completion: reduce to a scalar and fetch it (a tiny
            # fetch, so fetch bandwidth doesn't pollute the number)
            float(jnp.sum(d[:: max(n // 64, 1)]))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        out[mb] = {'median_s': round(med, 4),
                   'mb_per_s': round(mb / med, 1),
                   'all_s': [round(t, 3) for t in times]}
        print(mb, 'MB:', out[mb], flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
