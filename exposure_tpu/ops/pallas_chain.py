"""Fused Pallas TPU kernel: apply a whole K-step filter chain in ONE pass.

The reference replays a trajectory on a full-resolution image as K
sequential graph ops with a host round trip per step (net.py:796-821) —
K HBM reads + K HBM writes.  Filter math is pure per-pixel arithmetic, so
the chain is perfectly fusable: this kernel reads each pixel tile into
VMEM once, applies all K steps with REAL control flow (lax.switch on the
per-image filter id prefetched into SMEM — only the selected filter's math
executes, unlike the branchless jnp chain which must compute all K
filters), and writes once.  The kernel is the benchmark fast path for the
>=10k img/s @512px target (BASELINE.md).

Layout: channels-planar [B, 3, H, W] so tiles are clean (sublane, 128-lane)
2-D planes per channel; the NHWC wrapper transposes/pads around the call.

Scope: the 9 pointwise filters (E, G, W, S+, T, Ct, BW, C, Le) plus an
identity slot used for inactive trajectory steps; with cfg.masking on,
the 6-param spatial masks (and the vignette's elliptical mask) are
evaluated in-kernel from the global pixel grid.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exposure_tpu.ops import fastmath as fm

# ---------------------------------------------------------------------------
# Planar per-filter math: (r, g, b, params_ref_row) -> (r, g, b)
# Each matches the NHWC implementation in ops/filters.py (which carries the
# reference parity); params are already regressed values.
# ---------------------------------------------------------------------------


def _exposure(r, g, b, p):
    m = jnp.exp(p[0] * math.log(2.0))
    return r * m, g * m, b * m


def _gamma(r, g, b, p):
    gm = p[0]
    return (jnp.power(jnp.maximum(r, 0.001), gm),
            jnp.power(jnp.maximum(g, 0.001), gm),
            jnp.power(jnp.maximum(b, 0.001), gm))


def _white_balance(r, g, b, p):
    return r * p[0], g * p[1], b * p[2]


def _curve_apply(x, p, offset, steps):
    total = x * 0
    psum = 1e-30
    for i in range(steps):
        psum = psum + p[offset + i]
    for i in range(steps):
        total = total + jnp.clip(x - i / steps, 0.0, 1.0 / steps) * \
            p[offset + i]
    return total * (steps / psum)


def _tone(steps):
    def fn(r, g, b, p):
        return (_curve_apply(r, p, 0, steps), _curve_apply(g, p, 0, steps),
                _curve_apply(b, p, 0, steps))
    return fn


def _color(steps):
    def fn(r, g, b, p):
        return (_curve_apply(r, p, 0 * steps, steps),
                _curve_apply(g, p, 1 * steps, steps),
                _curve_apply(b, p, 2 * steps, steps))
    return fn


def _contrast(r, g, b, p):
    lum = jnp.clip(0.27 * r + 0.67 * g + 0.06 * b, 0.0, 1.0)
    clum = -jnp.cos(math.pi * lum) * 0.5 + 0.5
    scale = clum / (lum + 1e-6)
    t = p[0]
    return (r + (r * scale - r) * t, g + (g * scale - g) * t,
            b + (b * scale - b) * t)


def _bw(r, g, b, p):
    lum = 0.27 * r + 0.67 * g + 0.06 * b
    t = p[0]
    return (r + (lum - r) * t, g + (lum - g) * t, b + (lum - b) * t)


def _level(r, g, b, p):
    lo = p[0]
    hi = p[1] + 1.0
    inv = 1.0 / (hi - lo + 1e-6)
    return (jnp.clip((r - lo) * inv, 0.0, 1.0),
            jnp.clip((g - lo) * inv, 0.0, 1.0),
            jnp.clip((b - lo) * inv, 0.0, 1.0))


def _saturation(r, g, b, p):
    # HSV round trip expressed channel-wise: with value v and saturation s,
    # every RGB channel is v*(1 - s*w); boosting s to s2 maps
    # c -> v - (v-c)*(s2/s).  Gray pixels (range==0) take the explicit
    # hue-0 path of hsv_to_rgb (r=v, g=b=v*(1-s2)), matching
    # ops/color_space.py and reference tf.image semantics.
    #
    # ONE divide instead of two (round 4+; the VPU lowers f32 divide to
    # a multi-op sequence, and this branch is compute-bound —
    # tools/bench_filters.py): with k the saturation boost weight and
    # s2 = s + (1-s)*k, algebra removes the s = rng/v divide entirely —
    #   s2*v = (1-k)*rng + k*v        (v > 0; rng_pos handles v <= 0)
    #   vg = v*(1-s2) = (1-k)*(v - rng_pos)
    # so only the final ratio = s2*v/rng divide remains.
    r1 = jnp.minimum(r, 1.0)
    g1 = jnp.minimum(g, 1.0)
    b1 = jnp.minimum(b, 1.0)
    v = jnp.maximum(jnp.maximum(r1, g1), b1)
    mn = jnp.minimum(jnp.minimum(r1, g1), b1)
    rng = v - mn
    k = (0.5 - jnp.abs(0.5 - v)) * 0.8
    one_m_k = 1.0 - k
    vpos = v > 0
    safe_v = jnp.where(vpos, v, 1.0)
    rng_pos = jnp.where(vpos, rng, 0.0)
    gray = rng <= 0
    ratio = (one_m_k * rng_pos + k * safe_v) / \
        jnp.where(gray, 1.0, rng)

    def enhance(c, gray_val):
        full = jnp.where(gray, gray_val, v - (v - c) * ratio)
        t = p[0]
        return c * (1.0 - t) + full * t

    vg = one_m_k * (v - rng_pos)
    return enhance(r1, v), enhance(g1, vg), enhance(b1, vg)


# ---------------------------------------------------------------------------
# fast-math variants (ops/fastmath.py), chosen by ON-DEVICE measurement
# (tools/bench_fastmath.py, 256x512^2 u8, slope-timed):
#   cos:   builtin 26.5 ms vs sin-poly 4.5 ms  -> 5.9x, USED (Contrast)
#   curve: clip 11.8 / relu 10.9 / max-form (3 ops/knot, constants
#          folded into scalars) — EXACT same piecewise-linear function,
#          USED (Tone 14.0 -> 10.1 ms, Color 14.8 -> 11.5 ms per-branch)
#   pow:   builtin 9.66 ms vs explicit exp2(g*log2(x)) 1.92 ms -> 5.0x,
#          USED (Gamma branch 13.0 -> 2.9 ms; the builtin's generic
#          lowering pays for negative-base/edge handling).  The
#          POLYNOMIAL exp2/log2 (10.85 ms) stays library-only.
#   div:   builtin 2.8 ms vs Newton rcp 4.5     -> builtin wins, NOT used
# Poly-cos error <= ~1e-6, exp2log2 pow <= ~7e-6 — invisible after u8
# quantization (1 LSB = 1/255) and far inside the 1e-4 f32 verify
# budget (tests/test_fastmath.py).
# ---------------------------------------------------------------------------


def _saturation_fast(r, g, b, p):
    """S+ for the fast chain: identical math to ``_saturation`` except
    the gray special-case threshold is widened from ``rng <= 0`` to a
    small RELATIVE band.  The HSV hue is DISCONTINUOUS at exact gray;
    upstream chains that saturate all channels (curve clamp + exposure)
    manufacture exactly-gray pixels, and the fast branches' ~1e-6
    differences would otherwise flip those pixels from the hue-0 path
    onto the ratio path, changing the output by up to s2*v (~25 u8
    LSB).  Pixels with chroma below 2e-4 are perceptually gray (< 0.05
    u8 LSB of chroma), so pinning them to the hue-0 path is exact for
    the manufactured case and harmless otherwise.

    Same one-divide algebra as ``_saturation`` (see its comment)."""
    r1 = jnp.minimum(r, 1.0)
    g1 = jnp.minimum(g, 1.0)
    b1 = jnp.minimum(b, 1.0)
    v = jnp.maximum(jnp.maximum(r1, g1), b1)
    mn = jnp.minimum(jnp.minimum(r1, g1), b1)
    rng = v - mn
    k = (0.5 - jnp.abs(0.5 - v)) * 0.8
    one_m_k = 1.0 - k
    vpos = v > 0
    safe_v = jnp.where(vpos, v, 1.0)
    rng_pos = jnp.where(vpos, rng, 0.0)
    gray = rng <= 2e-4 * safe_v
    ratio = (one_m_k * rng_pos + k * safe_v) / \
        jnp.where(gray, 1.0, rng)

    def enhance(c, gray_val):
        full = jnp.where(gray, gray_val, v - (v - c) * ratio)
        t = p[0]
        return c * (1.0 - t) + full * t

    vg = one_m_k * (v - rng_pos)
    return enhance(r1, v), enhance(g1, vg), enhance(b1, vg)


def _gamma_fast(r, g, b, p):
    """Gamma via explicit exp2(g*log2(x)) — mathematically the same
    function as ``jnp.power`` on the positive-clamped inputs, but
    skips the general pow lowering's negative-base/edge-case handling.
    Differences vs the builtin are pure rounding (~1-2 ulp).
    Measured ON-DEVICE 5.0x cheaper (tools/bench_fastmath.py --only
    pow: builtin 9.66 ms vs exp2log2 1.92 ms per 256x512^2 u8 batch,
    5 steps; err vs float64 <= ~7e-6 across the gamma range)."""
    gm = p[0]
    return (jnp.exp2(gm * jnp.log2(jnp.maximum(r, 0.001))),
            jnp.exp2(gm * jnp.log2(jnp.maximum(g, 0.001))),
            jnp.exp2(gm * jnp.log2(jnp.maximum(b, 0.001))))


def _contrast_fast(r, g, b, p):
    lum = jnp.clip(0.27 * r + 0.67 * g + 0.06 * b, 0.0, 1.0)
    clum = fm.fast_half_cos_pi(lum)
    scale = clum / (lum + 1e-6)
    t = p[0]
    return (r + (r * scale - r) * t, g + (g * scale - g) * t,
            b + (b * scale - b) * t)


def _curve_fast_apply(x, p, offset, steps):
    psum = 1e-30
    for i in range(steps):
        psum = psum + p[offset + i]
    knots = [p[offset + i] for i in range(steps)]
    return fm.curve_relu(x, knots, steps / psum)


def _tone_fast(steps):
    def fn(r, g, b, p):
        return (_curve_fast_apply(r, p, 0, steps),
                _curve_fast_apply(g, p, 0, steps),
                _curve_fast_apply(b, p, 0, steps))
    return fn


def _color_fast(steps):
    def fn(r, g, b, p):
        return (_curve_fast_apply(r, p, 0 * steps, steps),
                _curve_fast_apply(g, p, 1 * steps, steps),
                _curve_fast_apply(b, p, 2 * steps, steps))
    return fn


_PLANAR_IMPL = {
    'ExposureFilter': lambda cfg: _exposure,
    'GammaFilter': lambda cfg: _gamma,
    'ImprovedWhiteBalanceFilter': lambda cfg: _white_balance,
    'SaturationPlusFilter': lambda cfg: _saturation,
    'ToneFilter': lambda cfg: _tone(cfg.curve_steps),
    'ContrastFilter': lambda cfg: _contrast,
    'WNBFilter': lambda cfg: _bw,
    'ColorFilter': lambda cfg: _color(cfg.curve_steps),
    'LevelFilter': lambda cfg: _level,
}

_PLANAR_IMPL_FAST = dict(_PLANAR_IMPL)
_PLANAR_IMPL_FAST.update({
    'GammaFilter': lambda cfg: _gamma_fast,
    'SaturationPlusFilter': lambda cfg: _saturation_fast,
    'ToneFilter': lambda cfg: _tone_fast(cfg.curve_steps),
    'ContrastFilter': lambda cfg: _contrast_fast,
    'ColorFilter': lambda cfg: _color_fast(cfg.curve_steps),
})


def _with_mask(fn, mask_offset, cfg):
    """Wrap a planar filter op with the 6-param spatial mask blend
    (filters.py:110-148): mask params are packed at ``mask_offset`` in
    the parameter row; gx/gy are the normalized centered grid planes."""
    fir = 5.0  # filter_input_range

    def run(r, g, b, p, gx, gy):
        r2, g2, b2 = fn(r, g, b, p)
        # tanh_range(-5, 5, initial=0)(x) == tanh(x) * 5
        mp = [jnp.tanh(p[mask_offset + j]) * fir for j in range(6)]
        lum = 0.27 * r + 0.67 * g + 0.06 * b
        inp = (gx * mp[0] + gy * mp[1] + mp[2] * (lum - 0.5) + mp[3] * 2)
        inp = inp * (cfg.maximum_sharpness * mp[4] / fir)
        mask = jax.nn.sigmoid(inp)
        mask = mask * (mp[5] / fir * 0.5 + 0.5) * \
            (1 - cfg.minimum_strength) + cfg.minimum_strength
        return (r + (r2 - r) * mask, g + (g2 - g) * mask,
                b + (b2 - b) * mask)

    return run


def _vignet_masked(cfg, mask_offset):
    """Vignette: elliptical 5-param mask blending toward black
    (filters.py:341-401)."""
    fir = 5.0

    def run(r, g, b, p, gx, gy):
        # filter param p[0] (sigmoid) is unused by process (returns 0 img)
        mp = [jnp.tanh(p[mask_offset + j]) * fir for j in range(5)]
        inp = ((gx * mp[0]) ** 2 + (gy * mp[1]) ** 2 + mp[2] - fir)
        inp = inp * (cfg.maximum_sharpness * mp[3] / fir)
        mask = jax.nn.sigmoid(inp) * (mp[4] / fir * 0.5 + 0.5)
        inv = 1.0 - mask
        return r * inv, g * inv, b * inv

    return run


def planar_branches(filters, mask_offset=None, fast_math=False):
    """Branch list for the kernel switch: one per filter + identity last.

    Each branch consumes (r, g, b, p, gx, gy) where p packs
    [filter_params (padded) | mask_params] and gx/gy are the spatial grid
    planes (ignored by unmasked branches).  ``mask_offset`` is where the
    mask parameters start in the packed row (required when any filter has
    masking enabled).  ``fast_math`` swaps the pow/cos/div-heavy
    branches for the polynomial variants (error <= ~4e-5 — exact after
    u8 quantization).
    """
    impl = _PLANAR_IMPL_FAST if fast_math else _PLANAR_IMPL
    branches = []
    for f in filters:
        name = type(f).__name__
        if name not in impl and name != 'VignetFilter':
            raise NotImplementedError(
                'pallas chain does not support %s; use the jnp chain'
                % name)
        if f.use_masking():
            assert mask_offset is not None, (
                'mask_params must be provided for masked filters')
            if name == 'VignetFilter':
                branches.append(_vignet_masked(f.cfg, mask_offset))
            else:
                base = impl[name](f.cfg)
                branches.append(_with_mask(base, mask_offset, f.cfg))
        else:
            if name == 'VignetFilter':
                raise NotImplementedError(
                    'VignetFilter without masking zeroes the image '
                    '(dormant); use the jnp chain')
            base = impl[name](f.cfg)
            branches.append(
                lambda r, g, b, p, gx, gy, fn=base: fn(r, g, b, p))
    branches.append(lambda r, g, b, p, gx, gy: (r, g, b))  # identity
    return branches


def _chain_kernel(ids_ref, params_ref, img_ref, out_ref, *, branches,
                  num_steps, max_p, grid_dims, tile,
                  compute_dtype=jnp.float32):
    bi = pl.program_id(0)
    quantized = img_ref.dtype == jnp.uint8
    if grid_dims is not None:
        # normalized centered (x, y) grid planes for spatial masks
        # (filters.py:123-133), from global pixel coordinates
        h, w = grid_dims
        th, tw = tile
        shorter = float(min(h, w))
        # Mosaic requires integer iota (tpu.iota verifies int result);
        # build int32 grids and cast — a float iota compiles only in
        # interpreter mode and fails on-device.
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                .astype(jnp.float32) +
                pl.program_id(1).astype(jnp.float32) * th)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
                .astype(jnp.float32) +
                pl.program_id(2).astype(jnp.float32) * tw)
        gx = (rows + (shorter - h) / 2.0) / shorter - 0.5
        gy = (cols + (shorter - w) / 2.0) / shorter - 0.5
    else:
        gx = gy = jnp.zeros((1, 1), jnp.float32)
    if quantized:
        # Serving fast path: fixed-point [0,1] in uint8 — 4x less HBM
        # traffic than f32 on a bandwidth-bound kernel; math in
        # ``compute_dtype`` (f32 default; bf16 opt-in packs the VPU 2x).
        # Mosaic has no direct u8<->f32 cast; hop through int32.
        def dq(x):
            return (x.astype(jnp.int32).astype(jnp.float32) *
                    (1.0 / 255.0)).astype(compute_dtype)
        r = dq(img_ref[0, 0])
        g = dq(img_ref[0, 1])
        b = dq(img_ref[0, 2])
    else:
        r = img_ref[0, 0].astype(compute_dtype)
        g = img_ref[0, 1].astype(compute_dtype)
        b = img_ref[0, 2].astype(compute_dtype)
    if grid_dims is not None:
        gx = gx.astype(compute_dtype)
        gy = gy.astype(compute_dtype)
    for k in range(num_steps):
        fid = ids_ref[bi, k]
        # SMEM supports scalar loads only: read the packed parameter row
        # element-wise (static unroll) into a python list of scalars.
        p = [params_ref[bi, k, j].astype(compute_dtype)
             for j in range(max_p)]

        def make_branch(fn):
            def run(operands):
                rr, gg, bb = operands
                return fn(rr, gg, bb, p, gx, gy)
            return run

        r, g, b = jax.lax.switch(fid, [make_branch(fn) for fn in branches],
                                 (r, g, b))
    if quantized:
        def q(x):
            x = x.astype(jnp.float32)  # quantize at full precision
            return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        r, g, b = q(r), q(g), q(b)
    else:
        r = r.astype(img_ref.dtype)
        g = g.astype(img_ref.dtype)
        b = b.astype(img_ref.dtype)
    out_ref[0, 0] = r
    out_ref[0, 1] = g
    out_ref[0, 2] = b


def _static_chain_kernel(n_ref, params_ref, img_ref, out_ref, *,
                         branch_seq, max_p, grid_dims, tile,
                         chunk_offset=0):
    """Switchless chain: the per-step branch sequence is STATIC (Python
    level), so only the selected filters' math is in the program.

    Rationale: Mosaic lowers ``lax.switch`` over vector-valued branches
    by executing EVERY branch and selecting (measured: the 10-branch
    switch costs the sum of all branches, ~45 ms/256x512^2 regardless of
    the ids) — but the ids are known before replay, and trained policies
    reuse a handful of distinct trajectory signatures, so grouping by
    signature and compiling one static kernel per signature recovers the
    selected-branch-only cost.

    ``n_ref`` (SMEM scalar) is the DYNAMIC count of real images in this
    call's batch: grid steps with global batch index >= n_ref[0] skip
    all compute (their output blocks are garbage and the caller drops
    them at scatter time).  Group sizes are padded to bucketed shapes so
    compiled variants stay few, but the padded slots cost only their
    block DMA — not 5 steps of filter math."""
    bi = pl.program_id(0)
    # program_id reads stay OUTSIDE the pl.when body (inside they end up
    # in a lax.cond branch, which interpret mode cannot lower on CPU)
    if grid_dims is not None:
        h, w = grid_dims
        th, tw = tile
        shorter = float(min(h, w))
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                .astype(jnp.float32) +
                pl.program_id(1).astype(jnp.float32) * th)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
                .astype(jnp.float32) +
                pl.program_id(2).astype(jnp.float32) * tw)
        gx = (rows + (shorter - h) / 2.0) / shorter - 0.5
        gy = (cols + (shorter - w) / 2.0) / shorter - 0.5
    else:
        gx = gy = jnp.zeros((1, 1), jnp.float32)

    @pl.when(bi + chunk_offset < n_ref[0])
    def _body():
        quantized = img_ref.dtype == jnp.uint8
        if quantized:
            def dq(x):
                return x.astype(jnp.int32).astype(jnp.float32) * \
                    (1.0 / 255.0)
            r, g, b = dq(img_ref[0, 0]), dq(img_ref[0, 1]), \
                dq(img_ref[0, 2])
        else:
            r, g, b = img_ref[0, 0], img_ref[0, 1], img_ref[0, 2]
        for k, branch_fn in enumerate(branch_seq):
            p = [params_ref[bi, k, j] for j in range(max_p)]
            r, g, b = branch_fn(r, g, b, p, gx, gy)
        if quantized:
            def q(x):
                return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(
                    jnp.int32).astype(jnp.uint8)
            r, g, b = q(r), q(g), q(b)
        out_ref[0, 0] = r
        out_ref[0, 1] = g
        out_ref[0, 2] = b


def _dyn_chain_kernel(ids_ref, params_ref, img_ref, out_ref, s_r, s_g,
                      s_b, *, branches, num_steps, max_p, grid_dims,
                      tile, dispatch='when'):
    """Per-image DYNAMIC chain with selected-branch-only cost.

    ``lax.switch`` over vector-valued branches lowers to
    execute-everything-and-select under Mosaic (the measured ~45 ms
    every-branch cost that motivated the grouped static kernels) — but
    ``pl.when`` on an SMEM scalar lowers to REAL control flow (scf.if),
    and the per-image filter id is uniform across the whole tile
    (grid dim 0 is the batch index), so guarding each filter's math
    with ``pl.when(id == f)`` executes exactly the selected branch at
    runtime.  The pixel state rides in VMEM scratch planes between the
    guarded regions (a region cannot return a value).

    This removes the grouped runner's entire host side — the ids
    fetch, the numpy grouping, the per-group gather/scatter dispatches,
    and the per-signature compile churn: ONE compiled program serves
    every trajectory mix, and the ids can stay on device end-to-end
    (core/serving.py ``dynamic=True`` replays + plans in a single
    dispatch per batch).  Measured on-chip (round 5, 256x512px batch,
    trained-like 6-signature mix, post-kernel-campaign branches;
    tools/bench_dyn_probe): dispatch='when' 5.76 ms/batch and 'tree'
    5.62 vs the grouped runner's 21.2 (incl. host grouping) and the
    every-branch switch kernel's 37.9 — after the round-4 fast-gamma/
    max-form-curve campaign the unfired-guard overhead is noise and
    the chained scf.ifs run at selected-branch cost, so this is the
    serving DEFAULT (the round-4 30.4 ms 'serialization tax' was the
    old expensive branches, not the guards).  dispatch='switch'
    (scf.index_switch, 38.9 ms) confirms lax.switch still lowers to
    execute-everything even per-step."""
    bi = pl.program_id(0)
    if grid_dims is not None:
        h, w = grid_dims
        th, tw = tile
        shorter = float(min(h, w))
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                .astype(jnp.float32) +
                pl.program_id(1).astype(jnp.float32) * th)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
                .astype(jnp.float32) +
                pl.program_id(2).astype(jnp.float32) * tw)
        gx = (rows + (shorter - h) / 2.0) / shorter - 0.5
        gy = (cols + (shorter - w) / 2.0) / shorter - 0.5
    else:
        gx = gy = jnp.zeros((1, 1), jnp.float32)
    quantized = img_ref.dtype == jnp.uint8
    if quantized:
        def dq(x):
            return x.astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        s_r[...] = dq(img_ref[0, 0])
        s_g[...] = dq(img_ref[0, 1])
        s_b[...] = dq(img_ref[0, 2])
    else:
        s_r[...] = img_ref[0, 0]
        s_g[...] = img_ref[0, 1]
        s_b[...] = img_ref[0, 2]
    n_real = len(branches) - 1  # last branch = identity
    for k in range(num_steps):
        fid = ids_ref[bi, k]
        p = [params_ref[bi, k, j] for j in range(max_p)]
        if dispatch == 'switch':
            # one n-way scf.index_switch per step instead of n chained
            # scf.ifs — the round-5 probe for the pl.when serialization
            # overhead (VERDICT r4 #5).  lax.switch clamps the index,
            # so the identity id lands on the last (pass-through) case.
            def _mk(branch_fn):
                def _case(r, g, b):
                    return branch_fn(r, g, b, p, gx, gy)
                return _case
            fns = [_mk(bf) for bf in branches[:-1]] + \
                [lambda r, g, b: (r, g, b)]
            r, g, b = jax.lax.switch(fid, fns, s_r[...], s_g[...],
                                     s_b[...])
            s_r[...] = r
            s_g[...] = g
            s_b[...] = b
        elif dispatch == 'tree':
            # two-level guard tree: the skipped HALF costs one predicate
            # instead of half the branch guards
            half = (n_real + 1) // 2
            for lo, hi in ((0, half), (half, n_real)):
                @pl.when(jnp.logical_and(fid >= lo, fid < hi))
                def _span(lo=lo, hi=hi):
                    for f_idx in range(lo, hi):
                        @pl.when(fid == f_idx)
                        def _apply(branch_fn=branches[f_idx]):
                            r, g, b = s_r[...], s_g[...], s_b[...]
                            r, g, b = branch_fn(r, g, b, p, gx, gy)
                            s_r[...] = r
                            s_g[...] = g
                            s_b[...] = b
        else:
            # identity (id == n_real) matches no guard: scratch passes
            # through unchanged — inactive steps are free
            for f_idx, branch_fn in enumerate(branches[:-1]):
                @pl.when(fid == f_idx)
                def _apply(branch_fn=branch_fn):
                    r, g, b = s_r[...], s_g[...], s_b[...]
                    r, g, b = branch_fn(r, g, b, p, gx, gy)
                    s_r[...] = r
                    s_g[...] = g
                    s_b[...] = b
    if quantized:
        def q(x):
            return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        out_ref[0, 0] = q(s_r[...])
        out_ref[0, 1] = q(s_g[...])
        out_ref[0, 2] = q(s_b[...])
    else:
        out_ref[0, 0] = s_r[...].astype(img_ref.dtype)
        out_ref[0, 1] = s_g[...].astype(img_ref.dtype)
        out_ref[0, 2] = s_b[...].astype(img_ref.dtype)


def pallas_apply_filter_chain_dynamic(img, filter_ids, packed_params,
                                      filters, active_steps=None,
                                      mask_params=None, tile=(256, 256),
                                      batch_chunk=8, interpret=False,
                                      fast_math=False, dispatch='when'):
    """Fused chain replay with PER-IMAGE dynamic ids at selected-branch
    cost (see ``_dyn_chain_kernel``).  Same contract as
    ``pallas_apply_filter_chain``; ids/params may be device arrays that
    never visit the host."""
    masking = any(f.use_masking() for f in filters)
    max_p = packed_params.shape[-1]
    branches = planar_branches(
        filters, mask_offset=max_p if masking else None,
        fast_math=fast_math)
    identity_id = len(branches) - 1

    ids = jnp.transpose(filter_ids, (1, 0)).astype(jnp.int32)  # [B, K]
    params = jnp.transpose(packed_params, (1, 0, 2))           # [B, K, P]
    if masking:
        assert mask_params is not None, (
            'masking filters require mask_params')
        params = jnp.concatenate(
            [params, jnp.transpose(mask_params, (1, 0, 2))], axis=-1)
    if active_steps is not None:
        act = jnp.transpose(active_steps, (1, 0))
        ids = jnp.where(act > 0, ids, identity_id)

    b, h, w, c = img.shape
    assert c == 3
    sublane = 32 if img.dtype == jnp.uint8 else 8
    th, tw = tile
    th = min(_round_up(th, sublane), _round_up(h, sublane))
    tw = min(tw, _round_up(w, 128))
    hp, wp = _round_up(h, th), _round_up(w, tw)
    planar = jnp.transpose(img, (0, 3, 1, 2))
    planar = jnp.pad(planar, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    grid_dims = (h, w) if masking else None
    num_steps = ids.shape[1]
    max_pp = params.shape[-1]

    outs = []
    for s in range(0, b, batch_chunk):
        e = min(s + batch_chunk, b)
        chunk = planar[s:e]
        kernel = functools.partial(
            _dyn_chain_kernel, branches=branches, num_steps=num_steps,
            max_p=max_pp, grid_dims=grid_dims, tile=(th, tw),
            dispatch=dispatch)
        outs.append(pl.pallas_call(
            kernel,
            grid=(e - s, hp // th, wp // tw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, th, tw),
                             lambda bi, i, j: (bi, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 3, th, tw),
                                   lambda bi, i, j: (bi, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(chunk.shape, chunk.dtype),
            scratch_shapes=[pltpu.VMEM((th, tw), jnp.float32)
                            for _ in range(3)],
            interpret=interpret,
        )(ids[s:e], params[s:e], chunk))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))


def pallas_apply_filter_chain_static(img, signature, packed_params,
                                     filters, mask_params=None,
                                     tile=(256, 256), batch_chunk=8,
                                     interpret=False, fast_math=False,
                                     n_active=None):
    """Fused chain replay for ONE static trajectory signature.

    Args:
      img: [B, H, W, 3] float32 or uint8.
      signature: tuple of K python-int filter indices (len(filters) =
        identity / inactive step) — shared by ALL images in the batch.
      packed_params: [K, B, max_p] float32.
      mask_params: optional [K, B, max_mask] (masking configs).
      n_active: optional DYNAMIC int32 scalar — only the first
        ``n_active`` images get computed (grouped-path bucket padding;
        outputs beyond it are garbage the caller must drop).
    Returns: [B, H, W, 3] same dtype as img.
    """
    masking = any(f.use_masking() for f in filters)
    max_p = packed_params.shape[-1]
    branches = planar_branches(
        filters, mask_offset=max_p if masking else None,
        fast_math=fast_math)
    branch_seq = tuple(branches[int(s)] for s in signature)

    params = jnp.transpose(packed_params, (1, 0, 2))
    if masking:
        assert mask_params is not None
        params = jnp.concatenate(
            [params, jnp.transpose(mask_params, (1, 0, 2))], axis=-1)

    b, h, w, c = img.shape
    assert c == 3
    sublane = 32 if img.dtype == jnp.uint8 else 8
    th, tw = tile
    th = min(_round_up(th, sublane), _round_up(h, sublane))
    tw = min(tw, _round_up(w, 128))
    hp, wp = _round_up(h, th), _round_up(w, tw)
    planar = jnp.transpose(img, (0, 3, 1, 2))
    planar = jnp.pad(planar, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    grid_dims = (h, w) if masking else None
    max_pp = params.shape[-1]
    if n_active is None:
        n_arr = jnp.asarray([b], jnp.int32)
    else:
        n_arr = jnp.asarray(n_active, jnp.int32).reshape(1)

    outs = []
    for s in range(0, b, batch_chunk):
        e = min(s + batch_chunk, b)
        chunk = planar[s:e]
        kernel = functools.partial(
            _static_chain_kernel, branch_seq=branch_seq, max_p=max_pp,
            grid_dims=grid_dims, tile=(th, tw), chunk_offset=s)
        outs.append(pl.pallas_call(
            kernel,
            grid=(e - s, hp // th, wp // tw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, th, tw),
                             lambda bi, i, j: (bi, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 3, th, tw),
                                   lambda bi, i, j: (bi, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(chunk.shape, chunk.dtype),
            interpret=interpret,
        )(n_arr, params[s:e], chunk))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))


class GroupedChainRunner:
    """Host-orchestrated signature-grouped replay.

    Groups a batch by its per-image trajectory signature and runs one
    switchless static kernel per distinct signature (compiled once per
    (signature, bucketed size, resolution) and cached).  Trained
    policies reuse a handful of signatures, so this recovers
    selected-branch-only cost — ~7x over the lax.switch kernel, whose
    Mosaic lowering executes every branch.

    Falls back to the switch kernel when a batch has more than
    ``max_signatures`` distinct signatures (e.g. random-walk eval).
    """

    def __init__(self, filters, interpret=False, max_signatures=16,
                 tile=(256, 256), batch_chunk=8, fast_math=False,
                 fused_set_limit=4, merge_below=8):
        self.filters = filters
        self.interpret = interpret
        self.max_signatures = max_signatures
        self.tile = tile
        self.batch_chunk = batch_chunk
        self.fast_math = fast_math
        # signature SETS vary per batch under dropout, and every new set
        # is a fresh fused-program compile (minutes on remote backends).
        # After ``fused_set_limit`` distinct sets, switch to per-group
        # accumulate programs cached by (signature, bucket) — those are
        # REUSED across sets, so compiles converge while dispatch count
        # rises from 1 to #groups (all async, hidden by pipelining).
        self.fused_set_limit = fused_set_limit
        # groups smaller than this merge into ONE switch-kernel call:
        # sub-bucket padding waste and per-tiny-group dispatches both go
        # away; the switch kernel's every-branch cost only applies to the
        # few remainder images.
        self.merge_below = merge_below
        self._fns = {}
        self._n_multi = 0

    def _single_fn(self, sig, size, res_shape, dtype, masked):
        key = ('single', sig, size, res_shape, jnp.dtype(dtype).name)
        if key not in self._fns:
            if masked:
                fn = jax.jit(lambda im, p, m, s=sig:
                             pallas_apply_filter_chain_static(
                                 im, s, p, self.filters, mask_params=m,
                                 tile=self.tile,
                                 batch_chunk=self.batch_chunk,
                                 interpret=self.interpret,
                                 fast_math=self.fast_math))
            else:
                fn = jax.jit(lambda im, p, s=sig:
                             pallas_apply_filter_chain_static(
                                 im, s, p, self.filters,
                                 tile=self.tile,
                                 batch_chunk=self.batch_chunk,
                                 interpret=self.interpret,
                                 fast_math=self.fast_math))
            self._fns[key] = fn
        return self._fns[key]

    def _multi_fn(self, sig_sizes, res_shape, dtype, masked):
        """ONE jitted function doing every group's gather -> static chain
        -> scatter — a single dispatch per batch (dozens of eager ops per
        call would each pay host-dispatch latency).

        Group sizes are BUCKETED (static shapes keep this function's jit
        cache small), but the per-group REAL count arrives as a dynamic
        ``n_arr`` argument: the static kernels skip all compute for
        padded slots (pl.when on the batch index) and their garbage
        outputs are dropped at scatter time (out-of-range index +
        mode='drop'), so padding costs block DMA only — not filter
        math."""
        key = ('multi', sig_sizes, res_shape, jnp.dtype(dtype).name)
        if key not in self._fns:
            # group indices arrive as ONE packed array (single host->
            # device upload); static offsets slice it per group
            offsets = []
            o = 0
            for _, size in sig_sizes:
                offsets.append((o, o + size))
                o += size

            def fn(img, params, mask, packed_idx, n_arr):
                out = jnp.zeros(img.shape, img.dtype)
                nb = img.shape[0]
                for gi, ((sig, size), (s, e)) in enumerate(
                        zip(sig_sizes, offsets)):
                    ix = packed_idx[s:e]
                    n_g = n_arr[gi]
                    sub_img = jnp.take(img, ix, axis=0)
                    sub_p = jnp.take(params, ix, axis=1)
                    sub_m = jnp.take(mask, ix, axis=1) if masked else None
                    res = pallas_apply_filter_chain_static(
                        sub_img, sig, sub_p, self.filters,
                        mask_params=sub_m, tile=self.tile,
                        batch_chunk=self.batch_chunk,
                        interpret=self.interpret,
                        fast_math=self.fast_math,
                        n_active=n_g)
                    # padded slots were skipped in-kernel (garbage rows):
                    # route them out of range and drop at scatter
                    drop_ix = jnp.where(jnp.arange(size) < n_g, ix, nb)
                    out = out.at[drop_ix].set(res, mode='drop')
                return out

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _zeros_fn(self, shape, dtype):
        key = ('zeros', shape, jnp.dtype(dtype).name)
        if key not in self._fns:
            self._fns[key] = jax.jit(
                lambda: jnp.zeros(shape, dtype))
        return self._fns[key]

    def program_plan(self, ids):
        """Which compiled programs a batch with these ids would touch.

        ``ids``: [K, B] host-side filter ids AFTER identity masking
        (inactive steps already set to ``len(filters)``), exactly what
        ``__call__`` groups on.  Returns a dict:
        ``{'kind': 'fallback'|'single'|'groups', 'single_size': B?,
        'big': [(sig, bucket), ...], 'merge': remainder_bucket|None}``.
        Used by ``RetouchPipeline.warmup`` to record a signature budget
        from probe plans without executing any replay."""
        import numpy as np

        k, b = ids.shape
        cols = np.ascontiguousarray(ids.astype(np.int64, copy=False).T)
        uniq, inv = np.unique(cols, axis=0, return_inverse=True)
        if len(uniq) > self.max_signatures:
            return {'kind': 'fallback'}
        sizes = np.bincount(inv, minlength=len(uniq))
        if len(uniq) == 1:
            return {'kind': 'single',
                    'sig': tuple(int(x) for x in uniq[0]),
                    'single_size': b}
        items = sorted((tuple(int(x) for x in uniq[g]), int(sizes[g]))
                       for g in range(len(uniq)))
        big = [(sig, n) for sig, n in items if n >= self.merge_below]
        small = [(sig, n) for sig, n in items if n < self.merge_below]
        if len(small) == 1:
            big.append(small[0])
            small = []
        return {
            'kind': 'groups',
            'big': [(sig, _bucket_size(n)) for sig, n in big],
            'merge': _bucket_size(sum(n for _, n in small))
            if small else None,
        }

    def warmup(self, budget, img_shape, dtype, num_steps, max_p,
               masked=False, mask_p=1, merge_sizes=()):
        """Precompile the per-(signature, bucket) replay programs for a
        declared traffic budget BEFORE serving (VERDICT r3 item 4: a
        fresh signature/bucket otherwise costs a multi-minute remote
        compile on first contact — the reference's tiny version of the
        same problem is its per-resolution cached reuse graph,
        net.py:683-709).

        Args:
          budget: iterable of ``(signature, bucket_size)`` pairs —
            typically recorded by ``RetouchPipeline.warmup`` from probe
            batches planned through the real policy.
          img_shape: full batch shape [B, H, W, 3] traffic will use.
          dtype: traffic image dtype (uint8 or float32).
          num_steps / max_p: trajectory length and packed-param width.
          masked / mask_p: mask machinery on, mask-param width.
          merge_sizes: remainder bucket sizes to precompile the merged
            small-group switch program for.

        Returns the number of programs compiled (0 when all cached).
        Each program is COMPILED AND EXECUTED once with ``n_active=0``
        (all rows padded), so the jit caches used by live ``__call__``
        traffic are populated and first real batches pay dispatch cost
        only.
        """
        import numpy as np

        before = len(self._fns)
        b = img_shape[0]
        res_shape = tuple(img_shape[1:3])
        img = jnp.zeros(img_shape, dtype)
        params = jnp.zeros((num_steps, b, max_p), jnp.float32)
        mask = jnp.zeros((num_steps, b, mask_p), jnp.float32)
        out = None
        for sig, size in budget:
            ix = jnp.zeros((size,), jnp.int32)
            args = (img, params, mask, ix, np.int32(0))
            # both accumulate variants serve live traffic: ``creates``
            # opens a batch (first big group), the donating variant
            # chains the rest
            fn_c = self._acc_fn(sig, size, res_shape, dtype, masked,
                                creates=True)
            out = fn_c(*args)
            fn_a = self._acc_fn(sig, size, res_shape, dtype, masked,
                                creates=False)
            out = fn_a(out, *args)  # donates out; n=0 keeps it zeros
        for size in merge_sizes:
            ix = jnp.zeros((size,), jnp.int32)
            sub_ids = jnp.full((num_steps, size), len(self.filters),
                               jnp.int32)
            fn_m = self._merge_fn(size, num_steps, res_shape, dtype,
                                  masked)
            buf = out if out is not None else \
                self._zeros_fn(img.shape, dtype)()
            out = fn_m(buf, img, params, mask, ix, sub_ids, np.int32(0))
        if out is not None:
            jax.block_until_ready(out)
        return len(self._fns) - before

    def warmup_superset(self, layout, img_shape, dtype, num_steps,
                        max_p, masked=False, mask_p=1, merge_sizes=()):
        """Precompile the FROZEN-layout fused program (+ the leftover
        merge programs) for ``call_superset`` traffic — one big compile
        ahead of traffic instead of per-(sig, bucket) programs, and one
        dispatch per batch afterwards.  Returns programs compiled."""
        import numpy as np

        before = len(self._fns)
        b = img_shape[0]
        res_shape = tuple(img_shape[1:3])
        img = jnp.zeros(img_shape, dtype)
        params = jnp.zeros((num_steps, b, max_p), jnp.float32)
        mask = jnp.zeros((num_steps, b, mask_p), jnp.float32)
        total = sum(size for _, size in layout)
        fn = self._multi_fn(tuple(layout), res_shape, dtype, masked)
        out = fn(img, params, mask, jnp.zeros((total,), jnp.int32),
                 np.zeros(len(layout), np.int32))
        for size in merge_sizes:
            fn_m = self._merge_fn(size, num_steps, res_shape, dtype,
                                  masked)
            sub_ids = jnp.full((num_steps, size), len(self.filters),
                               jnp.int32)
            out = fn_m(out, img, params, mask,
                       jnp.zeros((size,), jnp.int32), sub_ids,
                       np.int32(0))
        jax.block_until_ready(out)
        return len(self._fns) - before

    def _acc_fn(self, sig, size, res_shape, dtype, masked,
                creates=False):
        """Per-group gather -> static chain -> scatter-accumulate into a
        DONATED output buffer.  Cached by (signature, bucketed size) —
        reused across whatever signature SETS batches produce, unlike
        ``_multi_fn`` whose cache key is the whole set."""
        key = ('acc', sig, size, res_shape, jnp.dtype(dtype).name,
               masked, creates)
        if key not in self._fns:
            def fn(*args):
                if creates:
                    # first-group variant: allocate the zeroed output
                    # INSIDE the program (XLA fuses zeros into the
                    # scatter) — one fewer dispatch per batch than a
                    # standalone zeros call
                    img, params, mask, ix, n_g = args
                    out = jnp.zeros(img.shape, img.dtype)
                else:
                    out, img, params, mask, ix, n_g = args
                sub_img = jnp.take(img, ix, axis=0)
                sub_p = jnp.take(params, ix, axis=1)
                sub_m = jnp.take(mask, ix, axis=1) if masked else None
                res = pallas_apply_filter_chain_static(
                    sub_img, sig, sub_p, self.filters,
                    mask_params=sub_m, tile=self.tile,
                    batch_chunk=self.batch_chunk,
                    interpret=self.interpret,
                    fast_math=self.fast_math, n_active=n_g)
                drop_ix = jnp.where(jnp.arange(size) < n_g, ix,
                                    out.shape[0])
                return out.at[drop_ix].set(res, mode='drop')

            self._fns[key] = jax.jit(
                fn, donate_argnums=() if creates else (0,))
        return self._fns[key]

    def _merge_fn(self, size, k, res_shape, dtype, masked):
        """Sub-``merge_below`` groups merged through ONE switch-kernel
        call (every-branch cost, but only on the few remainder images):
        kills their per-group padding waste and dispatches, and its cache
        key is shape-only — no signature in it at all."""
        key = ('mergerem', size, k, res_shape, jnp.dtype(dtype).name,
               masked)
        if key not in self._fns:
            def fn(out, img, params, mask, ix, sub_ids, n_g):
                sub_img = jnp.take(img, ix, axis=0)
                sub_p = jnp.take(params, ix, axis=1)
                sub_m = jnp.take(mask, ix, axis=1) if masked else None
                res = pallas_apply_filter_chain(
                    sub_img, sub_ids, sub_p, self.filters,
                    mask_params=sub_m, tile=self.tile,
                    batch_chunk=self.batch_chunk,
                    interpret=self.interpret,
                    fast_math=self.fast_math)
                drop_ix = jnp.where(jnp.arange(size) < n_g, ix,
                                    out.shape[0])
                return out.at[drop_ix].set(res, mode='drop')

            self._fns[key] = jax.jit(fn, donate_argnums=(0,))
        return self._fns[key]

    def call_superset(self, img, ids, packed_params, layout,
                      mask_params=None):
        """Replay a batch through ONE fixed fused program (round 4).

        The per-(sig, bucket) accumulate path issues ~#groups dispatches
        per batch; through a remote-accelerator tunnel each dispatch is
        an RPC, and the measured residual between the streamed pipeline
        and its device-bound ceiling (~3-4 ms per 512-batch, PROFILE.md)
        is exactly that per-dispatch host cost.  This path collapses it:
        ``layout`` is a FROZEN tuple of (signature, bucket) slots —
        recorded ahead of traffic by ``RetouchPipeline.warmup`` — and
        every batch routes its groups into those slots and replays in a
        single ``_multi_fn`` dispatch (same program every batch: zero
        set-churn compiles).  Images whose signature is missing from the
        layout, or that overflow their slot's bucket, fall through to
        one merged switch-kernel call (every-branch cost on the few
        stragglers only).  Empty slots cost block DMA of padded rows
        only — the static kernels skip all math for rows >= n_real
        (``pl.when`` on the batch index) and their garbage rows are
        dropped at scatter.

        ``ids``: [K, B] HOST-side int array, identity-masked (inactive
        steps already = len(filters)) — same contract as ``__call__``
        after its fetch.
        """
        import numpy as np

        masking = any(f.use_masking() for f in self.filters)
        k, b = ids.shape
        cols = np.ascontiguousarray(
            ids.astype(np.int64, copy=False).T)
        uniq, inv = np.unique(cols, axis=0, return_inverse=True)
        order = np.argsort(inv, kind='stable')
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        res_shape = img.shape[1:3]
        if len(uniq) == 1:
            # single-signature batch (argmax policies): the whole-batch
            # static kernel beats squeezing 512 rows through a bucket
            sig = tuple(int(x) for x in uniq[0])
            fn = self._single_fn(sig, b, res_shape, img.dtype, masking)
            return fn(img, packed_params, mask_params) if masking \
                else fn(img, packed_params)
        mask_arg = mask_params if masking else \
            jnp.zeros((k, b, 1), jnp.float32)

        slot_of = {sig: g for g, (sig, _) in enumerate(layout)}
        offsets = []
        o = 0
        for _, size in layout:
            offsets.append(o)
            o += size
        packed = np.zeros(o, np.int32)
        n_real = np.zeros(len(layout), np.int32)
        leftover = []
        for g in range(len(uniq)):
            sig = tuple(int(x) for x in uniq[g])
            idxs = order[bounds[g]:bounds[g + 1]]
            slot = slot_of.get(sig)
            if slot is None:
                leftover.extend(idxs.tolist())
                continue
            size = layout[slot][1]
            take = min(len(idxs), size)
            s = offsets[slot]
            packed[s:s + take] = idxs[:take]
            if take < size:  # pad repeats an in-range row (skipped)
                packed[s + take:s + size] = idxs[0]
            n_real[slot] = take
            leftover.extend(idxs[take:].tolist())
        # empty slots gather row 0 with n_real=0: skipped + dropped

        fn = self._multi_fn(tuple(layout), res_shape, img.dtype,
                            masking)
        out = fn(img, packed_params, mask_arg, jnp.asarray(packed),
                 np.asarray(n_real, np.int32))
        if leftover:
            n = len(leftover)
            size = _bucket_size(n)
            pad = leftover + [leftover[0]] * (size - n)
            ix = np.asarray(pad, np.int32)
            sub_ids = ids[:, ix].astype(np.int32)
            fn_m = self._merge_fn(size, k, res_shape, img.dtype,
                                  masking)
            out = fn_m(out, img, packed_params, mask_arg,
                       jnp.asarray(ix), jnp.asarray(sub_ids),
                       np.int32(n))
        return out

    def __call__(self, img, filter_ids, packed_params, filters=None,
                 active_steps=None, mask_params=None):
        import numpy as np

        filters = filters or self.filters
        masking = any(f.use_masking() for f in filters)
        ids = np.asarray(filter_ids)  # [K, B] — tiny host fetch
        if active_steps is not None:
            act = np.asarray(active_steps)
            ids = np.where(act > 0, ids, len(filters))
        k, b = ids.shape
        # vectorized grouping (a per-image Python loop costs ~1 ms at
        # b=512 — real money in the serving hot loop): unique rows give
        # the signatures, a stable argsort over the inverse map gives
        # each group's image indices in ascending order — exactly the
        # dict-of-lists the Python loop used to build
        cols = np.ascontiguousarray(
            ids.astype(np.int64, copy=False).T)  # [B, K]
        uniq, inv = np.unique(cols, axis=0, return_inverse=True)
        order = np.argsort(inv, kind='stable')
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        sigs = {tuple(int(x) for x in uniq[g]):
                order[bounds[g]:bounds[g + 1]].tolist()
                for g in range(len(uniq))}
        if len(sigs) > self.max_signatures:
            # signature-diverse batch (e.g. random-walk eval): one jitted
            # switch-kernel call
            fkey = ('fallback', img.shape, jnp.dtype(img.dtype).name,
                    masking, active_steps is not None)
            if fkey not in self._fns:
                self._fns[fkey] = jax.jit(
                    lambda im, i, p, a, m: pallas_apply_filter_chain(
                        im, i, p, self.filters,
                        active_steps=a,
                        mask_params=m if masking else None,
                        tile=self.tile, batch_chunk=self.batch_chunk,
                        interpret=self.interpret,
                        fast_math=self.fast_math),
                    static_argnames=())
            k_, b_ = ids.shape
            mask_arg = mask_params if masking else \
                jnp.zeros((k_, b_, 1), jnp.float32)
            act_arg = active_steps if active_steps is not None else \
                jnp.ones((k_, b_), jnp.float32)
            return self._fns[fkey](img, filter_ids, packed_params,
                                   act_arg, mask_arg)

        if len(sigs) == 1:
            # whole batch shares one signature (argmax policies usually
            # do): no gather/scatter, one static call on the batch as-is
            (sig, _), = sigs.items()
            fn = self._single_fn(sig, b, img.shape[1:3], img.dtype,
                                 masking)
            return fn(img, packed_params, mask_params) if masking \
                else fn(img, packed_params)

        # deterministic group order; pad group indices to bucketed sizes
        # (the pad repeats the group's first index so gathers stay in
        # range; the kernels SKIP padded slots — see _multi_fn)
        items = sorted(sigs.items())
        res_shape = img.shape[1:3]
        mask_arg = mask_params if masking else \
            jnp.zeros((k, b, 1), jnp.float32)

        fused_key = ('multi',
                     tuple((sig, _bucket_size(len(ix)))
                           for sig, ix in items),
                     res_shape, jnp.dtype(img.dtype).name)
        if fused_key in self._fns or \
                self._n_multi < self.fused_set_limit:
            # fused path: every group in ONE dispatch, compiled per
            # signature SET (first few sets only — see __init__)
            if fused_key not in self._fns:
                self._n_multi += 1
            sig_sizes = []
            packed = []
            n_real = []
            for sig, idxs in items:
                n = len(idxs)
                size = _bucket_size(n)
                packed.extend(idxs + [idxs[0]] * (size - n))
                sig_sizes.append((sig, size))
                n_real.append(n)
            fn = self._multi_fn(tuple(sig_sizes), res_shape, img.dtype,
                                masking)
            return fn(img, packed_params, mask_arg,
                      jnp.asarray(np.asarray(packed, np.int32)),
                      np.asarray(n_real, np.int32))

        # per-group accumulate path: programs cached by (sig, bucket)
        # survive set churn; small groups merge through one switch call
        big = [(sig, idxs) for sig, idxs in items
               if len(idxs) >= self.merge_below]
        small = [(sig, idxs) for sig, idxs in items
                 if len(idxs) < self.merge_below]
        if len(small) == 1:  # a lone small group: its own kernel is
            big.append(small[0])  # cheaper than the every-branch switch
            small = []
        out = None
        for sig, idxs in big:
            n = len(idxs)
            size = _bucket_size(n)
            ix = np.asarray(idxs + [idxs[0]] * (size - n), np.int32)
            fn = self._acc_fn(sig, size, res_shape, img.dtype, masking,
                              creates=out is None)
            args = (img, packed_params, mask_arg, jnp.asarray(ix),
                    np.int32(n))
            out = fn(*args) if out is None else fn(out, *args)
        if small:
            idxs = [i for _, ix_l in small for i in ix_l]
            n = len(idxs)
            size = _bucket_size(n)
            pad = idxs + [idxs[0]] * (size - n)
            ix = np.asarray(pad, np.int32)
            sub_ids = ids[:, ix].astype(np.int32)  # [K, size] host-side
            fn = self._merge_fn(size, k, res_shape, img.dtype, masking)
            if out is None:
                # >=2 small groups and no big one: merge still needs a
                # buffer to scatter into
                out = self._zeros_fn(img.shape, img.dtype)()
            out = fn(out, img, packed_params, mask_arg, jnp.asarray(ix),
                     jnp.asarray(sub_ids), np.int32(n))
        return out


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bucket_size(n):
    """Group-size bucket: the next value in {8, 12, 16, 24, 32, 48, ...}
    (powers of two and their 1.5x midpoints).  Pure pow2 buckets padded
    a measured trained mix to 1.7x its real size (each padded slot
    replays a duplicate image); 1.5x-granularity caps over-padding at
    1.33x while keeping the set of distinct kernel shapes — and thus
    compile variants on a slow-compile toolchain — small."""
    if n <= 8:
        return 8
    p = 1 << (n - 1).bit_length()        # next pow2 >= n
    mid = p // 2 + p // 4                # 1.5 * previous pow2
    return mid if n <= mid else p


def _chain_call(planar, ids, params, branches, tile, interpret,
                grid_dims=None, compute_dtype=jnp.float32):
    """One pallas_call on a batch chunk (ids/params whole in SMEM)."""
    b, _, hp, wp = planar.shape
    num_steps = ids.shape[1]
    max_p = params.shape[-1]
    th, tw = tile
    kernel = functools.partial(_chain_kernel, branches=branches,
                               num_steps=num_steps, max_p=max_p,
                               grid_dims=grid_dims, tile=tile,
                               compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, th, tw), lambda bi, i, j: (bi, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, th, tw), lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, hp, wp), planar.dtype),
        interpret=interpret,
    )(ids, params, planar)


def pallas_apply_filter_chain(img, filter_ids, packed_params, filters,
                              active_steps=None, mask_params=None,
                              tile=(256, 256), batch_chunk=8,
                              interpret=False,
                              compute_dtype=jnp.float32,
                              fast_math=False):
    """Fused chain replay.

    Args:
      img: [B, H, W, 3] float32 NHWC image (linear domain).
      filter_ids: [K, B] int32 per-step choices (rollout layout).
      packed_params: [K, B, max_p] float32 packed parameters.
      filters: instantiated filter list.
      active_steps: optional [K, B] 0/1; inactive steps become identity.
      mask_params: [K, B, max_mask] raw mask-head outputs — REQUIRED when
        any filter has masking enabled.
      tile: (sublane, lane) tile; multiples of (8, 128).
      batch_chunk: images per pallas_call — bounds the SMEM footprint of
        the per-image trajectory scalars.
      interpret: run in interpreter mode (CPU testing).
      compute_dtype: in-kernel pixel math precision.  f32 (default)
        matches the jnp chain bit-near.  jnp.bfloat16 is MEASURED
        library-only (tools/bench_bf16_probe.py, on-device round 3):
        bf16 vectors with f32 scalar params compile but run SLOWER than
        f32 (curve 2.39 vs 1.64 ms, cos 1.12 vs 0.50 — conversion
        traffic eats the 2x VPU packing), and full bf16-cast chains
        MISCOMPILE (remote tpu_compile_helper exit 1 on the curve
        accumulation).  Verified numerically in interpreter mode
        (tests/test_pallas_chain.py::test_bf16_compute_mode); serving's
        ``bf16=True`` therefore means the POLICY PLAN only
        (core/serving.py), a measured 1.5x plan-program win.

    Returns: [B, H, W, 3] float32.
    """
    masking = any(f.use_masking() for f in filters)
    max_p = packed_params.shape[-1]
    branches = planar_branches(
        filters, mask_offset=max_p if masking else None,
        fast_math=fast_math)
    identity_id = len(branches) - 1

    ids = jnp.transpose(filter_ids, (1, 0)).astype(jnp.int32)  # [B, K]
    params = jnp.transpose(packed_params, (1, 0, 2))           # [B, K, P]
    if masking:
        assert mask_params is not None, (
            'masking filters require mask_params')
        params = jnp.concatenate(
            [params, jnp.transpose(mask_params, (1, 0, 2))], axis=-1)
    if active_steps is not None:
        act = jnp.transpose(active_steps, (1, 0))
        ids = jnp.where(act > 0, ids, identity_id)

    b, h, w, c = img.shape
    assert c == 3
    sublane = 32 if img.dtype == jnp.uint8 else 8
    th, tw = tile
    th = min(_round_up(th, sublane), _round_up(h, sublane))
    tw = min(tw, _round_up(w, 128))
    hp, wp = _round_up(h, th), _round_up(w, tw)
    planar = jnp.transpose(img, (0, 3, 1, 2))  # [B, 3, H, W]
    # gamma/pow sees max(x, 1e-3), so zero padding is numerically safe
    planar = jnp.pad(planar, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    grid_dims = (h, w) if masking else None
    outs = []
    for s in range(0, b, batch_chunk):
        e = min(s + batch_chunk, b)
        outs.append(_chain_call(planar[s:e], ids[s:e], params[s:e],
                                branches, (th, tw), interpret,
                                grid_dims=grid_dims,
                                compute_dtype=compute_dtype))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))
