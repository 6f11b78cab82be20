"""Host<->device primitive-latency probe for the remote-TPU tunnel.

Times the host-side cost of the primitives the train loop uses per
chunk: eager array creation (host->device transfer), eager key folding,
jitted-call dispatch (async send), and small device->host fetches.  The
numbers tell which hot-loop host operations are worth eliminating
(CLAUDE.md: every eager op pays a dispatch round trip on this testbed).

Usage: python -m exposure_tpu.tools.bench_dispatch
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n=20, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append((time.time() - t0) * 1000)
    return round(float(np.median(ts)), 2), round(float(np.max(ts)), 1)


def main():
    report = {'device': str(jax.devices()[0].device_kind)}
    small = np.zeros((100,), np.float32)
    key = jax.random.PRNGKey(0)

    report['eager_asarray_small_ms'] = timed(
        lambda: jax.block_until_ready(jnp.asarray(small)))
    report['eager_float32_scalar_ms'] = timed(
        lambda: jax.block_until_ready(jnp.float32(1.5)))
    report['eager_fold_in_ms'] = timed(
        lambda: jax.block_until_ready(jax.random.fold_in(key, 7)))

    noop = jax.jit(lambda x: x + 1.0)
    dev = jnp.zeros((100,), jnp.float32)
    jax.block_until_ready(noop(dev))
    report['jit_dispatch_send_ms'] = timed(lambda: noop(dev))
    report['jit_dispatch_roundtrip_ms'] = timed(
        lambda: np.asarray(noop(dev)))

    # numpy arg binding: does passing np arrays into jit cost extra?
    report['jit_dispatch_np_args_ms'] = timed(lambda: noop(small))

    big = jnp.zeros((4 * 1024 * 1024,), jnp.float32)  # 16 MB
    jax.block_until_ready(big)
    report['fetch_16mb_ms'] = timed(lambda: np.asarray(big), n=8)

    print(json.dumps(report))


if __name__ == '__main__':
    main()
