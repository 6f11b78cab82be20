"""On-device trajectory rollout: K policy steps under one lax.scan.

The reference unrolls the trajectory on the HOST, one sess.run per step
with feed-dict round trips (net.py:441-448 for training viz, net.py:796-821
for eval).  Here the whole K-step rollout is a single jitted scan over the
agent step — the policy runs K times on the 64x64 proxy with no host sync,
emitting the packed (filter_id, params) trajectory that the fused Pallas
chain kernel replays at full resolution."""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from exposure_tpu.models.agent import agent_step, initial_states


class Trajectory(NamedTuple):
    images: jnp.ndarray        # [K, B, S, S, C] per-step outputs
    states: jnp.ndarray        # [K, B, D]
    filter_ids: jnp.ndarray    # [K, B]
    params: jnp.ndarray        # [K, B, max_p]
    mask_params: jnp.ndarray   # [K, B, max_mask] raw mask-head outputs
    pdfs: jnp.ndarray          # [K, B, num_filters]
    surrogates: jnp.ndarray    # [K, B, 1]
    final_image: jnp.ndarray   # [B, S, S, C]
    final_state: jnp.ndarray   # [B, D]


def rollout(policy, gen_params, images, key, *, cfg, filters, is_train=0,
            num_steps=None, progress=1.0):
    """Run ``num_steps`` (default cfg.test_steps) agent steps on device."""
    if num_steps is None:
        num_steps = cfg.test_steps
    batch = images.shape[0]
    states0 = initial_states(batch, cfg.num_state_dim, images.dtype)

    def body(carry, k):
        img, st = carry
        out = agent_step(policy, gen_params, img, st, key=k,
                         is_train=is_train, progress=progress, cfg=cfg,
                         filters=filters)
        ys = (out.image, out.new_states, out.selected_filter_id,
              out.selected_params, out.selected_mask_params, out.pdf,
              out.surrogate)
        return (out.image, out.new_states), ys

    keys = jax.random.split(key, num_steps)
    (final_img, final_st), ys = jax.lax.scan(body, (images, states0), keys)
    imgs, sts, ids, params, mask_params, pdfs, surs = ys
    return Trajectory(images=imgs, states=sts, filter_ids=ids, params=params,
                      mask_params=mask_params, pdfs=pdfs, surrogates=surs,
                      final_image=final_img, final_state=final_st)
