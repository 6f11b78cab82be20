"""On-device verification of the fused Pallas chain kernel.

The pytest suite proves kernel==jnp-chain equality in *interpreter* mode
on CPU (tests/test_pallas_chain.py); this tool proves it for the
Mosaic-COMPILED kernel on the actual accelerator, across resolutions
(64 / 512 / non-multiples of the tile), dtypes (f32 and the uint8
serving path), and masking modes (unmasked, 6-param linear masks,
elliptical vignette, inactive-step identity).  A miscompile — tile
boundary bug, u8 rounding, switch branch ordering — fails loudly here
instead of shipping silently at serving speed.

The reference gets this correctness for free by replaying through the
single shared TF graph (reference filters.py:89-98, net.py:683-709); our
dual implementation (jnp chain for training/gradients, fused kernel for
serving) is why this check exists.

Usage:
  python -m exposure_tpu.tools.verify_kernel [--out KERNELCHECK.json]
                                             [--interpret]

Exit code 0 iff every case passes (f32 max-abs-diff <= 1e-4,
u8 <= 2 LSB).  Writes a JSON artifact for the record.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from exposure_tpu.ops.chain import apply_filter_chain
from exposure_tpu.ops.filters import VignetFilter, max_filter_parameters
from exposure_tpu.ops.pallas_chain import pallas_apply_filter_chain
from exposure_tpu.utils.config import load_config

F32_TOL = 1e-4
U8_TOL = 2  # LSB


def random_trajectory(rng, filters, k, b):
    """Random (ids, packed regressed params) like a rollout would emit."""
    max_p = max_filter_parameters(filters)
    ids = rng.randint(0, len(filters), (k, b)).astype(np.int32)
    params = np.zeros((k, b, max_p), np.float32)
    for s in range(k):
        for i in range(b):
            f = filters[ids[s, i]]
            n = f.get_num_filter_parameters()
            raw = rng.randn(1, n).astype(np.float32)
            reg = np.asarray(f.filter_param_regressor(jnp.asarray(raw)))
            params[s, i, :n] = reg.reshape(-1)
    return jnp.asarray(ids), jnp.asarray(params)


def run_case(name, rng, filters, shape, steps, dtype='f32', masked=False,
             active=False, interpret=False, grouped=False,
             fast_math=False, dynamic=False):
    b, h, w = shape
    imgf = rng.rand(b, h, w, 3).astype(np.float32) * 0.9
    ids, params = random_trajectory(rng, filters, steps, b)
    mask_params = None
    if masked:
        max_mask = max(f.get_num_mask_parameters() for f in filters)
        mask_params = jnp.asarray(
            rng.randn(steps, b, max_mask).astype(np.float32))
    active_steps = None
    if active:
        act = np.ones((steps, b), np.float32)
        act[steps // 2:] = 0.0
        active_steps = jnp.asarray(act)

    jnp_chain = jax.jit(lambda im: apply_filter_chain(
        im, ids, params, filters, active_steps=active_steps,
        mask_params=mask_params))
    if grouped:
        from exposure_tpu.ops.pallas_chain import GroupedChainRunner
        runner = GroupedChainRunner(filters, interpret=interpret,
                                    fast_math=fast_math)
        pallas = lambda im: runner(  # noqa: E731
            im, ids, params, active_steps=active_steps,
            mask_params=mask_params)
    elif dynamic:
        from exposure_tpu.ops.pallas_chain import (
            pallas_apply_filter_chain_dynamic,
        )
        pallas = jax.jit(lambda im: pallas_apply_filter_chain_dynamic(
            im, ids, params, filters, active_steps=active_steps,
            mask_params=mask_params, interpret=interpret,
            fast_math=fast_math))
    else:
        pallas = jax.jit(lambda im: pallas_apply_filter_chain(
            im, ids, params, filters, active_steps=active_steps,
            mask_params=mask_params, interpret=interpret,
            fast_math=fast_math))

    t0 = time.time()
    expected = np.asarray(jnp_chain(jnp.asarray(imgf)))
    if dtype == 'u8':
        img8 = (imgf * 255).round().astype(np.uint8)
        got = np.asarray(pallas(jnp.asarray(img8)))
        assert got.dtype == np.uint8, got.dtype
        # the u8 path dequantizes its own input; re-derive the expectation
        # from the dequantized image for an apples-to-apples compare
        expected = np.asarray(jnp_chain(
            jnp.asarray(img8.astype(np.float32) / 255.0)))
        expected_q = np.round(np.clip(expected, 0, 1) * 255.0)
        diffs = np.abs(got.astype(np.int64) - expected_q.astype(np.int64))
        diff = float(diffs.max())
        tol = U8_TOL
        outlier_span = 64          # bounded by the S+ hue span s2*v
    else:
        got = np.asarray(pallas(jnp.asarray(imgf)))
        diffs = np.abs(got - expected)
        diff = float(diffs.max())
        tol = F32_TOL
        outlier_span = 0.25
    outlier_frac = float((diffs > tol).mean())
    if fast_math:
        # The S+ filter (HSV) is DISCONTINUOUS at exact gray: chains
        # that saturate all channels manufacture exactly-gray pixels,
        # and ANY cross-implementation difference (even FMA
        # reordering) flips pixels at the discontinuity across a
        # bounded span (~s2*v).  The fast kernels pin a 2e-4 relative
        # gray band (ops/pallas_chain.py::_saturation_fast) so the
        # manufactured case is consistent; pixels genuinely AT the
        # band edge remain set-valued.  The exemption is ATTRIBUTED:
        # only images whose trajectory contains S+ may have set-valued
        # pixels (outlier fraction <= 1e-4, bounded by the
        # discontinuity span); every other image is held to the normal
        # tolerance, so an unrelated fast-kernel regression cannot
        # hide behind the S+ allowance.
        sat_ids = [i for i, f in enumerate(filters)
                   if type(f).__name__ == 'SaturationPlusFilter']
        ids_np = np.asarray(ids)  # [K, B]
        has_sat = np.isin(ids_np, sat_ids).any(axis=0)  # [B]
        plain = diffs[~has_sat]
        satd = diffs[has_sat]
        plain_ok = plain.size == 0 or bool(plain.max() <= tol)
        sat_ok = satd.size == 0 or (
            bool((satd > tol).mean() <= 1e-4) and
            bool(satd.max() <= outlier_span))
        ok = plain_ok and sat_ok
    else:
        ok = bool(diff <= tol)
    ok = ok and bool(np.isfinite(got.astype(np.float64)).all())
    return {
        'case': name,
        'shape': list(shape),
        'steps': steps,
        'dtype': dtype,
        'masked': masked,
        'active_mask': active,
        'fast_math': fast_math,
        'max_abs_diff': diff,
        'outlier_frac': outlier_frac,
        'tol': tol,
        'ok': ok,
        'seconds': round(time.time() - t0, 2),
    }


def verify(interpret=False, seed=0):
    rng = np.random.RandomState(seed)
    cfg = load_config('example')
    filters = [f(cfg) for f in cfg.filters]
    mcfg = cfg.copy()
    mcfg.masking = True
    mfilters = [f(mcfg) for f in mcfg.filters]
    vfilters = mfilters + [VignetFilter(mcfg)]

    cases = [
        ('f32_64', filters, (4, 64, 64), 5, 'f32', False, False),
        ('f32_512', filters, (2, 512, 512), 5, 'f32', False, False),
        ('f32_odd_96x160', filters, (2, 96, 160), 5, 'f32', False, False),
        ('f32_odd_300x200', filters, (1, 300, 200), 5, 'f32', False, False),
        ('f32_active_steps', filters, (2, 64, 64), 5, 'f32', False, True),
        ('u8_512', filters, (2, 512, 512), 5, 'u8', False, False),
        ('u8_odd_200x300', filters, (1, 200, 300), 5, 'u8', False, False),
        ('masked_64x128', mfilters, (2, 64, 128), 3, 'f32', True, False),
        ('masked_odd_96x128', mfilters, (1, 96, 128), 3, 'f32', True, False),
        ('vignette_96x128', vfilters, (1, 96, 128), 3, 'f32', True, False),
        # the signature-grouped switchless serving path
        ('grouped_u8_512', filters, (4, 512, 512), 5, 'u8', False, False,
         True),
        ('grouped_masked', mfilters, (2, 64, 128), 3, 'f32', True, False,
         True),
        # polynomial fast-math kernels (the serving default,
        # ops/fastmath.py): same tolerances as the exact kernels
        ('fast_f32_512', filters, (2, 512, 512), 5, 'f32', False, False,
         False, True),
        ('fast_u8_512', filters, (2, 512, 512), 5, 'u8', False, False,
         False, True),
        ('fast_grouped_u8', filters, (4, 512, 512), 5, 'u8', False,
         False, True, True),
        # masking x fast-math x u8 x grouped combinations (the gray-band
        # S+ subtlety interacts with mask blending; hold masked images
        # to the same attributed criterion)
        ('fast_masked', mfilters, (2, 64, 128), 3, 'f32', True, False,
         False, True),
        ('grouped_masked_u8', mfilters, (2, 128, 256), 3, 'u8', True,
         False, True, False),
        ('fast_grouped_masked_u8', mfilters, (2, 128, 256), 3, 'u8',
         True, False, True, True),
        # the pl.when-dispatched DYNAMIC kernel (per-image ids on
        # device, selected-branch cost — the fused single-dispatch
        # serving path): full dtype x masking x fast-math matrix
        ('dyn_u8_512', filters, (2, 512, 512), 5, 'u8', False, False,
         False, False, True),
        ('dyn_f32_odd_96x160', filters, (2, 96, 160), 5, 'f32', False,
         False, False, False, True),
        ('dyn_active_steps', filters, (2, 64, 64), 5, 'f32', False,
         True, False, False, True),
        ('fast_dyn_u8_512', filters, (2, 512, 512), 5, 'u8', False,
         False, False, True, True),
        ('dyn_masked', mfilters, (2, 64, 128), 3, 'f32', True, False,
         False, False, True),
        ('fast_dyn_masked_u8', mfilters, (2, 128, 256), 3, 'u8', True,
         False, False, True, True),
    ]
    results = []
    for case in cases:
        name, flt, shape, steps, dtype, masked, active = case[:7]
        grouped = case[7] if len(case) > 7 else False
        fast = case[8] if len(case) > 8 else False
        dynamic = case[9] if len(case) > 9 else False
        r = run_case(name, rng, flt, shape, steps, dtype=dtype,
                     masked=masked, active=active, interpret=interpret,
                     grouped=grouped, fast_math=fast, dynamic=dynamic)
        print('  %-20s %-12s diff=%.3g tol=%g %s (%.1fs)' %
              (r['case'], 'x'.join(map(str, r['shape'])),
               r['max_abs_diff'], r['tol'],
               'OK' if r['ok'] else 'FAIL', r['seconds']))
        results.append(r)

    dev = jax.devices()[0]
    report = {
        'backend': jax.default_backend(),
        'device': str(dev.device_kind),
        'n_devices': len(jax.devices()),
        'interpret': interpret,
        'jax_version': jax.__version__,
        'cases': results,
        'ok': all(r['ok'] for r in results),
    }
    return report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default=None,
                        help='write the JSON report here')
    parser.add_argument('--interpret', action='store_true',
                        help='interpreter mode (CPU testing)')
    parser.add_argument('--cpu', action='store_true',
                        help='force the CPU backend (implies --interpret)')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        args.interpret = True

    print('# verify_kernel: backend=%s devices=%r' %
          (jax.default_backend(), [str(d) for d in jax.devices()[:4]]))
    report = verify(interpret=args.interpret, seed=args.seed)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print('# wrote', args.out)
    def worst(dtype, fast):
        vals = [r['max_abs_diff'] for r in report['cases']
                if r['dtype'] == dtype and r.get('fast_math') == fast]
        return max(vals) if vals else None

    print(json.dumps({
        'kernel_check_ok': report['ok'],
        'device': report['device'],
        'worst_f32': worst('f32', False),
        'worst_u8_lsb': worst('u8', False),
        # fast cases pass on (outlier_frac, bounded span) — the S+
        # hue discontinuity makes a handful of band-edge pixels
        # set-valued (see run_case)
        'worst_fast_u8_lsb': worst('u8', True),
        'worst_fast_outlier_frac': max(
            (r['outlier_frac'] for r in report['cases']
             if r.get('fast_math')), default=None),
    }))
    sys.exit(0 if report['ok'] else 1)


if __name__ == '__main__':
    main()
