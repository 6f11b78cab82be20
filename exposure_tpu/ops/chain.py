"""Filter-chain replay: apply a recorded (filter_id, params) trajectory to
an image at any resolution.

This is the white-box replay primitive (reference filters.py:89-98,
net.py:683-709): the policy decides on the 64x64 proxy, and the chosen
operations are replayed losslessly on the full-resolution image.  The
reference rebuilds a TF graph per resolution and round-trips per step;
here the chain is a single jitted function (this module) or a single
fused Pallas kernel (``exposure_tpu.ops.pallas_chain``) for the TPU fast
path.

The jnp implementation evaluates all K filters per step and selects
(branchless — the XLA-friendly formulation under vmap); the Pallas kernel
does real control flow per step and reads each pixel exactly once for the
whole chain."""

import jax
import jax.numpy as jnp


def apply_filter_step(img, filter_id, packed_params, filters,
                      mask_params=None):
    """Apply one recorded step to [B, H, W, C] given per-sample ids.

    Args:
      img: [B, H, W, C].
      filter_id: [B] int32.
      packed_params: [B, max_p] regressed parameters (zero-padded).
      mask_params: optional [B, max_mask] raw mask-head outputs
        (masking mode).
    """
    outs = []
    for f in filters:
        n = f.get_num_filter_parameters()
        mp = None
        if mask_params is not None and f.use_masking():
            mp = mask_params[:, :f.get_num_mask_parameters()]
        out, _, _ = f.apply(img, specified_parameter=packed_params[:, :n],
                            mask_parameters=mp)
        outs.append(out)
    stacked = jnp.stack(outs, axis=1)  # [B, K, H, W, C]
    one_hot = jax.nn.one_hot(filter_id, len(filters), dtype=img.dtype)
    return jnp.sum(stacked * one_hot[:, :, None, None, None], axis=1)


def apply_filter_chain(img, filter_ids, packed_params, filters,
                       active_steps=None, mask_params=None):
    """Replay a K-step trajectory.

    Args:
      img: [B, H, W, C] input image (linear RAW domain).
      filter_ids: [K, B] int32 per-step filter choices.
      packed_params: [K, B, max_p] per-step packed parameters.
      active_steps: optional [K, B] 0/1 mask (1 = apply step); lets a
        jitted caller stop trajectories early without dynamic shapes.
      mask_params: optional [K, B, max_mask] per-step raw mask-head
        outputs (masking mode).

    Returns:
      [B, H, W, C] output image.
    """
    num_steps = filter_ids.shape[0]

    def body(carry, xs):
        fid, par, act, mp = xs
        out = apply_filter_step(carry, fid, par, filters, mask_params=mp)
        if act is not None:
            out = jnp.where(act[:, None, None, None] > 0, out, carry)
        return out, None

    # lax.scan requires uniform xs; thread absent optionals as None via
    # a python-level wrapper over per-step slices
    def scan_like(body_fn, init):
        carry = init
        for i in range(num_steps):
            act = active_steps[i] if active_steps is not None else None
            mp = mask_params[i] if mask_params is not None else None
            carry, _ = body_fn(carry, (filter_ids[i], packed_params[i],
                                       act, mp))
        return carry

    if active_steps is None and mask_params is None:
        xs = (filter_ids, packed_params)

        def simple_body(carry, xs_):
            fid, par = xs_
            return apply_filter_step(carry, fid, par, filters), None

        out, _ = jax.lax.scan(simple_body, img, xs, length=num_steps)
        return out
    return scan_like(body, img)
