"""Fire the auto-superset RE-FREEZE on the real chip (VERDICT r4 #3).

The record->freeze->monitor->re-freeze logic of
``RetouchPipeline(auto_superset=True)`` is unit-tested on CPU
(tests/test_serving.py) and the round-4 real-chip drive saw same-mix
traffic only (0 re-freezes).  This drive makes the re-freeze actually
fire on hardware: it streams batches through one policy until the
layout freezes and steady-state replay is measured, then SWAPS THE
CHECKPOINT mid-stream (a different policy family picks a different
action mix -> different signature universe), and records:

- the drift window crossing (per-batch merge-fallback fraction),
- the re-freeze trigger batch and the background warm -> swap latency,
- per-batch wall times before / during / after, so the in-stream cost
  of the one re-compile is visible,
- recovered steady-state throughput under the frozen NEW layout.

Usage (real TPU):
  python -m exposure_tpu.tools.drive_refreeze \
      --run-a synthetic_explore/best --run-b synthetic_inject15/best \
      [--batch 256] [--res 512] [--pre 24] [--post 60] \
      [--out REFREEZE_R5.json]

Reference anchor: the reference has no serving runtime at all
(net.py:796-821 is one sess.run per image); this tool validates the
part of the rebuild's serving story that only exists here.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _load(run, batch, res):
    from exposure_tpu.core.artifacts import restore_for_serving
    from exposure_tpu.core.trainer import build_models, init_train_state
    from exposure_tpu.utils.config import load_config

    cfg = load_config(run.split('/', 1)[0])
    cfg.name = run
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, seed=0)
    state, step, src = restore_for_serving(run, state)
    print('# restored %s at step %d (%s)' % (run, step, src),
          file=sys.stderr)
    prov = cfg.fake_data_provider_test()
    base, _ = prov.get_next_batch(batch)
    imgs = jnp.asarray(np.clip(base, 0.0, 1.0))
    imgs = jax.image.resize(imgs, (batch, res, res, 3), method='linear')
    imgs = (imgs * 255).astype(jnp.uint8)
    return cfg, state, jax.block_until_ready(imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-a', default='synthetic_explore/best')
    ap.add_argument('--run-b', default='synthetic_inject15/best')
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--pre', type=int, default=24,
                    help='batches under policy A (freeze + steady state)')
    ap.add_argument('--post', type=int, default=60,
                    help='batches under policy B (drift -> re-freeze -> '
                         'recovery)')
    ap.add_argument('--record', type=int, default=8)
    ap.add_argument('--max-wait', type=int, default=2400,
                    help='extra drift-phase batches to keep streaming '
                         'while the background warm compiles')
    ap.add_argument('--recover', type=int, default=20,
                    help='batches measured under the re-frozen layout')
    ap.add_argument('--out', default='REFREEZE_R5.json')
    args = ap.parse_args()

    from exposure_tpu.core.serving import RetouchPipeline

    cfg, state_a, imgs = _load(args.run_a, args.batch, args.res)
    _, state_b, _ = _load(args.run_b, args.batch, args.res)

    pipe = RetouchPipeline(cfg, state_a, bf16=True, auto_superset=True,
                           auto_record_batches=args.record)

    trace = []
    refreeze_seen_at = None
    swap_at = args.pre

    def drive(i, phase):
        nonlocal refreeze_seen_at
        t0 = time.time()
        out = pipe(imgs, seed=i, device_out=True)
        # force completion with a tiny fetch (block_until_ready can
        # acknowledge early through the tunnel)
        np.asarray(out[0, :2, :2, 0])
        dt = time.time() - t0
        rep = pipe.superset_report()
        row = {'batch': i, 'phase': phase, 'wall_s': round(dt, 4),
               'frozen_slots': rep['frozen_slots'],
               'drift_mean': rep['drift_mean'],
               'refreezes': rep['refreezes'],
               'warm_pending': rep['refreeze_warm_pending']}
        trace.append(row)
        if rep['refreezes'] >= 1 and refreeze_seen_at is None:
            refreeze_seen_at = i
            print('# RE-FREEZE observed at batch %d' % i,
                  file=sys.stderr)
        if i % 10 == 0 or rep['refreeze_warm_pending']:
            print('# batch %3d [%s] %.3fs slots=%s drift=%s refreezes=%d'
                  ' warm_pending=%s'
                  % (i, phase, dt, rep['frozen_slots'], rep['drift_mean'],
                     rep['refreezes'], rep['refreeze_warm_pending']),
                  file=sys.stderr)
        return dt

    for i in range(args.pre):
        drive(i, 'A')
    print('# swapping checkpoint %s -> %s at batch %d'
          % (args.run_a, args.run_b, swap_at), file=sys.stderr)
    pipe.state = state_b
    for i in range(args.pre, args.pre + args.post):
        drive(i, 'B')
    # The background warm of the new layout is a multi-minute remote
    # compile; keep realistic traffic flowing until the re-freeze
    # actually swaps in (or the wait cap trips), then measure the
    # recovered steady state under the NEW frozen layout.
    i = args.pre + args.post
    waited = 0
    while (refreeze_seen_at is None and waited < args.max_wait
           and pipe.superset_report()['refreeze_warm_pending']):
        drive(i, 'B')
        i += 1
        waited += 1
    if refreeze_seen_at is not None:
        # only measure the 'recovered' phase when the re-freeze actually
        # swapped in — otherwise these batches would measure the OLD
        # layout paying merge fallback and the artifact would mislabel
        # them (recovered fields stay null in that case)
        for _ in range(args.recover):
            drive(i, 'R')
            i += 1

    def steady(rows):
        """Median wall of the last 10 batches of a span."""
        w = [r['wall_s'] for r in rows][-10:]
        return round(float(np.median(w)), 4) if w else None

    a_rows = [r for r in trace if r['phase'] == 'A']
    b_rows = [r for r in trace if r['phase'] == 'B']
    r_rows = [r for r in trace if r['phase'] == 'R']
    rep = pipe.superset_report()
    result = {
        'run_a': args.run_a, 'run_b': args.run_b,
        'batch': args.batch, 'res': args.res,
        'auto_record_batches': args.record,
        'refreezes': rep['refreezes'],
        'refreeze_first_seen_batch': refreeze_seen_at,
        'swap_batch': swap_at,
        'steady_wall_A_s': steady(a_rows),
        'steady_wall_B_s': steady(b_rows),
        'steady_imgs_per_s_A': (round(args.batch / steady(a_rows), 1)
                                if steady(a_rows) else None),
        'steady_imgs_per_s_B': (round(args.batch / steady(b_rows), 1)
                                if steady(b_rows) else None),
        'steady_wall_recovered_s': steady(r_rows),
        'steady_imgs_per_s_recovered': (
            round(args.batch / steady(r_rows), 1)
            if steady(r_rows) else None),
        'max_wall_after_swap_s': round(max(
            (r['wall_s'] for r in b_rows), default=0.0), 4),
        'final_report': rep,
        'trace': trace,
    }
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != 'trace'},
                     indent=1))
    print('# wrote %s' % args.out)


if __name__ == '__main__':
    main()
