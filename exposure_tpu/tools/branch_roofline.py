"""Per-branch VPU roofline: elementwise-op counts vs measured ms.

VERDICT r4 #4 asks either for branch sum <= 38 ms or per-branch
roofline notes showing the heavy branches are VPU-bound.  This tool
supplies the op-count side mechanically: it traces every planar branch
(the exact functions the fused chain kernels inline,
ops/pallas_chain.py::planar_branches) to a jaxpr on one (8, 128) f32
vreg tile and counts the VECTOR primitives — every one of those
occupies at least one VPU issue slot per vreg.

Combined with FILTER_BENCH.json per-branch ms (5-step chains, 256 x
512x512 u8 = 67.1M pixels), the achieved elem-op rate per branch is

    rate = steps * 3_planes_adjusted * ops_per_plane * 67.1e6 / ms

and the EMPIRICAL issue-rate calibration is the E branch (pure
per-channel multiply, trivially optimal).  Branches whose achieved
rate matches or exceeds E's are VPU-issue-bound: no scheduling or
dispatch overhead is left, only op-count reduction or bf16 packing
can make them faster.

Usage:
  python -m exposure_tpu.tools.branch_roofline [--fast/--exact]
      [--bench FILTER_BENCH.json] [--out BRANCH_ROOFLINE.json]
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

# primitives that cost multiple VPU slots (lowered to sequences)
_HEAVY = {'div': 7, 'exp2': 6, 'log2': 6, 'exp': 6, 'log': 6,
          'pow': 25, 'cos': 12, 'sin': 12, 'rsqrt': 6, 'sqrt': 6,
          'integer_pow': 2}
# structural / free-at-tile-level primitives
_FREE = {'convert_element_type', 'broadcast_in_dim', 'reshape',
         'squeeze', 'transpose', 'stop_gradient', 'copy', 'iota',
         'reduce_max', 'reduce_min', 'reduce_sum'}


def _walk(jaxpr, names):
    slots = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        # recurse into call primitives (pjit, custom_jvp, ...)
        inner = [v for k, v in eqn.params.items()
                 if k in ('jaxpr', 'call_jaxpr', 'fun_jaxpr')]
        if inner:
            for sub in inner:
                slots += _walk(getattr(sub, 'jaxpr', sub), names)
            continue
        # scalar-only equations cost scalar-unit slots, not VPU
        if all(getattr(v.aval, 'shape', ()) == () for v in eqn.invars):
            continue
        if name in _FREE:
            continue
        slots += _HEAVY.get(name, 1)
        names[name] = names.get(name, 0) + 1
    return slots


def count_vector_ops(fn, n_args=3):
    """Trace fn(r, g, b) on (8,128) planes; count vector-op slots."""
    tile = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    jaxpr = jax.make_jaxpr(fn)(*([tile] * n_args))
    names = {}
    slots = _walk(jaxpr.jaxpr, names)
    return slots, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--exact', action='store_true',
                    help='count the exact (non-fast-math) branches')
    ap.add_argument('--bench', default='FILTER_BENCH.json')
    ap.add_argument('--out', default='BRANCH_ROOFLINE.json')
    args = ap.parse_args()

    from exposure_tpu.ops.filters import max_filter_parameters
    from exposure_tpu.ops.pallas_chain import planar_branches
    from exposure_tpu.utils.config import load_config

    cfg = load_config('example')
    filters = [f(cfg) for f in cfg.filters]
    branches = planar_branches(filters, fast_math=not args.exact)
    short = [f.get_short_name() for f in filters]
    max_p = max_filter_parameters(filters)

    counts = {}
    for name, branch in zip(short, branches):
        # scalar params (SMEM values in the kernel): python floats so
        # they trace as scalars, exactly like the kernel
        p = [np.float32(0.3 + 0.1 * j) for j in range(max_p)]
        gx = gy = jnp.zeros((1, 1), jnp.float32)

        def fn(r, g, b, branch=branch, p=p):
            return branch(r, g, b, p, gx, gy)

        slots, prims = count_vector_ops(fn)
        counts[name] = {'vpu_slots_per_step': slots, 'primitives': prims}

    result = {
        'description': 'VPU issue-slot counts per branch step (traced '
                       'on one (8,128) vreg; heavy primitives weighted '
                       'by their lowered sequence length: div=7, '
                       'exp2/log2=6, pow=25, cos=12).',
        'fast_math': not args.exact,
        'branches': counts,
    }

    try:
        with open(args.bench) as f:
            bench = json.load(f)
        ms = bench.get('per_filter_ms_after') or bench['per_filter_ms']
        steps = bench.get('steps', 5)
        px = float(np.prod(bench.get('shape', [256, 512, 512])))
        # calibrate the achievable issue rate on T: the max-form curve
        # is ALL plain single-slot ops (max/mul/add — zero weighting
        # uncertainty) and the largest op count, so its achieved rate
        # is the empirical VPU issue bound.  Tiny branches (E/W: 3
        # ops) are dominated by the per-step fixed cost (scratch
        # read/write), not issue slots — they are NOT the calibration.
        if 'T' in ms and 'T' in counts:
            t_rate = (steps * counts['T']['vpu_slots_per_step'] * px /
                      (ms['T'] * 1e-3))
            result['calibration'] = {
                'branch': 'T',
                'achieved_slots_per_sec': round(t_rate / 1e12, 3),
                'unit': 'T slot-ops/s',
                'note': 'T = plain max/mul/add only; its achieved rate '
                        'is the empirical VPU issue bound',
            }
        for name, row in counts.items():
            if name not in ms:
                continue
            rate = (steps * row['vpu_slots_per_step'] * px /
                    (ms[name] * 1e-3))
            row['measured_ms_5step'] = ms[name]
            row['achieved_Tslots_per_s'] = round(rate / 1e12, 3)
            if 'calibration' in result:
                row['vs_issue_bound'] = round(
                    rate * 1e-12 /
                    result['calibration']['achieved_slots_per_sec'], 2)
    except FileNotFoundError:
        pass

    print(json.dumps(result, indent=1))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print('# wrote %s' % args.out)


if __name__ == '__main__':
    main()
