"""Serving warmup / AOT precompile: measure and kill cold-start.

Round-3 left one serving gap (VERDICT r3 item 4): steady-state compile
churn is tamed (14-16 cached programs per dropout-varied stream), but a
FRESH process still pays a multi-minute remote compile the first time
each (signature, bucket) program is touched by live traffic.  The
reference's tiny version of the same problem is its per-resolution
cached reuse graph (reference net.py:683-709, built lazily per first
contact too).

``RetouchPipeline.warmup`` fixes it: plan ``--probes`` batches through
the real policy (dropout keys are the churn source), record exactly
which programs ``__call__`` would touch (``GroupedChainRunner.
program_plan``), compile each once on padded-only rows.  This tool
drives that on the real device and measures the user-visible number:
wall-clock latency of the FIRST live batch, cold vs after warmup.

Usage (real TPU, trained checkpoint):
  python -m exposure_tpu.tools.warmup_serving \
      --run synthetic/final-r4 [--batch 512] [--res 512] [--probes 6] \
      [--skip-cold] [--out WARMUP.json]

``--skip-cold`` skips the cold-pipeline measurement (saves the
multi-minute cold compile when only the warm path is of interest).
The recorded budget is emitted in the JSON; a server can replay it
verbatim via ``RetouchPipeline.warmup(images, budget=...)`` without
probing.
"""

import argparse
import json
import sys
import time

import numpy as np


def first_batch_latency(pipe, images, seed):
    """Wall-clock of ONE first __call__ (plan + ids fetch + replay),
    completion forced by fetching a tiny slice of the DEVICE output.
    This is a LATENCY measurement (the user-visible cold-start number),
    not a throughput slope — but it deliberately excludes the
    full-batch output transfer: on this remote-tunnel testbed a 512x
    512px fetch moves at ~5 MB/s (minutes/batch), which would swamp
    the compile cost this tool exists to measure."""
    t0 = time.time()
    out = pipe(images, seed=seed, device_out=True)
    np.asarray(out[0, :2, :2])
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run', required=True,
                    help='<config>/<run> trained checkpoint')
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--probes', type=int, default=6)
    ap.add_argument('--seeds', type=int, default=3,
                    help='live batches to time after the first (each a '
                         'new dropout key, i.e. a new signature set)')
    ap.add_argument('--skip-cold', action='store_true')
    ap.add_argument('--superset', action='store_true',
                    help='freeze the recorded budget into ONE fused '
                         'replay program (one dispatch per live batch; '
                         'GroupedChainRunner.call_superset) instead of '
                         'per-(sig,bucket) accumulate programs')
    ap.add_argument('--decompose', action='store_true',
                    help='split the first post-warmup batch into phases '
                         '(re-execute warmed program / plan dispatch / '
                         'ids fetch / replay dispatch / completion '
                         'force) with jax compile logging on, to '
                         'attribute the residual first-batch latency '
                         '(VERDICT r4 #8: 72.7 s unexplained)')
    ap.add_argument('--dynamic', action='store_true',
                    help='measure the dynamic one-program default '
                         'instead: cold = its single compile, then '
                         'fresh-dropout-key batches (no budget, no '
                         'misses possible)')
    ap.add_argument('--out', default='WARMUP.json')
    args = ap.parse_args()

    from exposure_tpu.core.serving import RetouchPipeline
    from exposure_tpu.utils.config import load_config

    config_name, run = args.run.split('/', 1)
    cfg = load_config(config_name)
    cfg.name = args.run

    rng = np.random.RandomState(0)
    images = (rng.rand(args.batch, args.res, args.res, 3) *
              255).astype(np.uint8)
    # device-commit the batch ONCE before any timing: a host-numpy
    # batch would re-upload ~400 MB through the tunnel on EVERY
    # __call__ (measured 35-155 s/batch at the tunnel's 3-47 MB/s —
    # swamping the compile cost this tool measures; production serving
    # keeps batches device-resident, core/serving.py map_batches)
    import jax
    import jax.numpy as jnp
    images = jnp.asarray(images)
    jax.block_until_ready(images)

    report = {'run': args.run, 'batch': args.batch, 'res': args.res}

    if args.dynamic:
        # the round-5 serving default: ONE compiled program for any
        # action mix, so cold start == the single compile and a budget
        # miss is IMPOSSIBLE — every later dropout key reuses the same
        # program.  This is the cold-start SLO answer the grouped-path
        # budget tooling above approximates.
        pipe = RetouchPipeline.from_run(cfg, bf16=True)
        assert pipe.dynamic, 'expected dynamic default on accelerator'
        report['mode'] = 'dynamic'
        cold = first_batch_latency(pipe, images, seed=100)
        report['cold_first_batch_s'] = round(cold, 1)
        print('# dynamic cold first batch (one compile): %.1f s'
              % cold, file=sys.stderr)
        lats = []
        for s in range(args.seeds):
            lats.append(first_batch_latency(pipe, images, seed=200 + s))
            print('# dynamic batch %d (fresh dropout key): %.2f s'
                  % (s, lats[-1]), file=sys.stderr)
        report['warm_next_batches_s'] = [round(x, 2) for x in lats]
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report))
        print('# wrote', args.out, file=sys.stderr)
        return

    def build():
        # GROUPED stream-serving configuration (explicit since the
        # round-5 default flipped to the dynamic one-program path,
        # which needs no warmup beyond its single compile): grouped
        # runner, per-(sig,bucket) programs only (fused_set_limit=0 —
        # set-keyed fused programs are the compile hazard warmup
        # exists to avoid)
        return RetouchPipeline.from_run(cfg, bf16=True, grouped=True,
                                        fused_set_limit=0)

    if not args.skip_cold:
        pipe = build()
        cold = first_batch_latency(pipe, images, seed=100)
        report['cold_first_batch_s'] = round(cold, 1)
        print('# cold first batch: %.1f s' % cold, file=sys.stderr)

    pipe = build()
    wrep = pipe.warmup(images, probe_batches=args.probes, seed=0,
                       superset=args.superset)
    report['warmup'] = wrep
    print('# warmup: %d programs in %.1f s'
          % (wrep['programs_compiled'], wrep['warmup_seconds']),
          file=sys.stderr)

    if args.decompose:
        import jax
        import jax.numpy as jnp
        # hidden-recompile detector: any XLA compile during the phases
        # below shows up on stderr with a timestamp
        jax.config.update('jax_log_compiles', True)
        decomp = {}
        n_fns_before = len(pipe._runner._fns)

        # phase 0: replay the warmup's own probe batch (seed 0, same
        # images) — the signature set warmup recorded, so every program
        # touched is already compiled.  If THIS is slow, the stall is
        # first-execution alloc / tunnel, not anything compile- or
        # signature-specific.
        t0 = time.time()
        out0 = pipe(images, seed=0, device_out=True)
        np.asarray(out0[0, :2, :2])
        decomp['reexec_probe_batch_s'] = round(time.time() - t0, 2)

        # phases of the first FRESH batch (a dropout key the probe
        # never saw; 50 is outside both the probe range and the timed
        # seeds below), mirroring __call__'s grouped path step by step.
        # NOTE: with --decompose these two batches run BEFORE the
        # warm_first_batch_s measurement, which then reflects batch 3+.
        key = jax.random.PRNGKey(50)
        t0 = time.time()
        ids_d, params_d, mask_d = pipe._plan_for(images, key)
        decomp['plan_dispatch_s'] = round(time.time() - t0, 2)
        t0 = time.time()
        ids = np.asarray(ids_d)
        decomp['ids_fetch_s'] = round(time.time() - t0, 2)
        t0 = time.time()
        out = pipe._replay(images, ids, params_d, mask_d,
                           device_out=True)
        decomp['replay_dispatch_s'] = round(time.time() - t0, 2)
        t0 = time.time()
        np.asarray(out[0, :2, :2])
        decomp['completion_force_s'] = round(time.time() - t0, 2)
        decomp['lazily_compiled_programs'] = \
            len(pipe._runner._fns) - n_fns_before
        report['first_batch_decomposition'] = decomp
        print('# decomposition: %s' % json.dumps(decomp),
              file=sys.stderr)
        jax.config.update('jax_log_compiles', False)

    lats = []
    for s in range(args.seeds):
        # seeds 100+s differ from the probe keys: the measurement is
        # honest only if warm traffic uses dropout keys the probe never
        # saw (program reuse must come from (sig,bucket) coverage, not
        # from replaying the probe's exact signature sets)
        lats.append(first_batch_latency(pipe, images, seed=100 + s))
        print('# warm batch %d: %.2f s' % (s, lats[-1]),
              file=sys.stderr)
    report['warm_first_batch_s'] = round(lats[0], 2)
    report['warm_next_batches_s'] = [round(x, 2) for x in lats[1:]]
    # programs compiled lazily DESPITE warmup (budget misses): the
    # honest coverage metric
    n_after = len(pipe._runner._fns)
    report['programs_after_traffic'] = n_after
    report['budget_misses'] = n_after - wrep['programs_compiled']

    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != 'warmup'} |
                     {'programs_compiled':
                      wrep['programs_compiled']}))
    print('# wrote', args.out, file=sys.stderr)


if __name__ == '__main__':
    main()
