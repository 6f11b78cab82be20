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


def apply_filter_step(img, filter_id, packed_params, filters):
    """Apply one recorded step to [B, H, W, C] given per-sample ids.

    Args:
      img: [B, H, W, C].
      filter_id: [B] int32.
      packed_params: [B, max_p] regressed parameters (zero-padded).
    """
    outs = []
    for f in filters:
        n = f.get_num_filter_parameters()
        out, _, _ = f.apply(img, specified_parameter=packed_params[:, :n])
        outs.append(out)
    stacked = jnp.stack(outs, axis=1)  # [B, K, H, W, C]
    one_hot = jax.nn.one_hot(filter_id, len(filters), dtype=img.dtype)
    return jnp.sum(stacked * one_hot[:, :, None, None, None], axis=1)


def apply_filter_chain(img, filter_ids, packed_params, filters,
                       active_steps=None):
    """Replay a K-step trajectory.

    Args:
      img: [B, H, W, C] input image (linear RAW domain).
      filter_ids: [K, B] int32 per-step filter choices.
      packed_params: [K, B, max_p] per-step packed parameters.
      active_steps: optional [K, B] 0/1 mask (1 = apply step); lets a
        jitted caller stop trajectories early without dynamic shapes.

    Returns:
      [B, H, W, C] output image.
    """
    num_steps = filter_ids.shape[0]

    def body(carry, xs):
        if active_steps is None:
            fid, par = xs
            out = apply_filter_step(carry, fid, par, filters)
        else:
            fid, par, act = xs
            out = apply_filter_step(carry, fid, par, filters)
            out = jnp.where(act[:, None, None, None] > 0, out, carry)
        return out, None

    xs = ((filter_ids, packed_params) if active_steps is None
          else (filter_ids, packed_params, active_steps))
    out, _ = jax.lax.scan(body, img, xs, length=num_steps)
    return out
