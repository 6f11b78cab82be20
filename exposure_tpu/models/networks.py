"""Flax network definitions: policy (generator), critic and value CNNs.

Architecture parity with the reference:

- ``FeatureExtractor``: the agent CNN (reference agent.py:11-37) — input
  minus 0.5, stride-2 4x4 convs with lrelu(0.2) doubling channels from
  ``base_channels`` down to a 4x4 map whose channel count is
  ``output_dim / 16``, flattened to ``output_dim`` and passed through
  dropout.  NOTE: the reference applies dropout *unconditionally* (even at
  eval time, agent.py:36); trajectory diversity at test time comes from
  dropout, not from the z noise (reference README.md:76-79).  We keep that
  behavior: callers must always provide a ``dropout`` rng.
- ``PolicyNet``: shared feature extractor -> per-filter 2-layer heads
  (fc 128 lrelu -> n_params + n_mask_params raw outputs, reference
  filters.py:28-44) plus a *separate* feature extractor -> fc 128 -> fc K
  for action selection (reference agent.py:80-99).
- ``CriticNet``: hand-crafted stats channels (luminance mean/variance,
  saturation) + optional state channels appended to the image, a conv
  stack with NO normalization, then fc 128 lrelu -> fc 1 (reference
  critics.py:6-98).  The same module doubles as the value network when
  ``states`` is passed (reference net.py:76-90, config_example.py:100).

All dense/conv kernels use Glorot-uniform initialization to match
tf.contrib.layers defaults (xavier_initializer).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from exposure_tpu.utils.ops import lrelu

_glorot = nn.initializers.glorot_uniform()


class FeatureExtractor(nn.Module):
    """Strided-conv feature pyramid -> flat feature vector with dropout."""

    output_dim: int
    base_channels: int = 32
    dropout_keep_prob: float = 0.5
    min_feature_map_size: int = 4

    @nn.compact
    def __call__(self, x):
        assert self.output_dim % (self.min_feature_map_size ** 2) == 0
        x = x - 0.5
        size = x.shape[2]
        channels = self.base_channels
        x = nn.Conv(channels, (4, 4), strides=(2, 2), padding='SAME',
                    kernel_init=_glorot)(x)
        x = lrelu(x)
        size //= 2
        while size > self.min_feature_map_size:
            if size == self.min_feature_map_size * 2:
                channels = self.output_dim // (self.min_feature_map_size ** 2)
            else:
                channels *= 2
            x = nn.Conv(channels, (4, 4), strides=(2, 2), padding='SAME',
                        kernel_init=_glorot)(x)
            x = lrelu(x)
            size //= 2
        x = x.reshape((x.shape[0], self.output_dim))
        x = nn.Dropout(rate=1.0 - self.dropout_keep_prob,
                       deterministic=False)(x)
        return x


class PolicyNet(nn.Module):
    """Produces per-filter raw parameter vectors and selector logits.

    The actual filter application / sampling / state-machine logic lives in
    ``exposure_tpu.models.agent.agent_step`` so it can be reused by the
    high-resolution replay path with the same weights.
    """

    filter_output_dims: Sequence[int]  # n_params + n_mask_params per filter
    feature_extractor_dims: int = 4096
    base_channels: int = 32
    fc1_size: int = 128
    dropout_keep_prob: float = 0.5

    @nn.compact
    def __call__(self, enriched):
        shared = FeatureExtractor(
            self.feature_extractor_dims, self.base_channels,
            self.dropout_keep_prob, name='shared_extractor')(enriched)
        raw_params = []
        for j, out_dim in enumerate(self.filter_output_dims):
            h = nn.Dense(self.fc1_size, kernel_init=_glorot,
                         name='filter_%d_fc1' % j)(shared)
            h = lrelu(h)
            h = nn.Dense(out_dim, kernel_init=_glorot,
                         name='filter_%d_fc2' % j)(h)
            raw_params.append(h)

        sel = FeatureExtractor(
            self.feature_extractor_dims, self.base_channels,
            self.dropout_keep_prob, name='selector_extractor')(enriched)
        sel = nn.Dense(self.fc1_size, kernel_init=_glorot,
                       name='selector_fc1')(sel)
        sel = lrelu(sel)
        logits = nn.Dense(len(self.filter_output_dims), kernel_init=_glorot,
                          name='selector_fc2')(sel)
        return raw_params, logits


def critic_stats(images):
    """Hand-crafted stats: [lum mean, lum variance, saturation mean]
    (reference critics.py:47-74)."""
    lum = (images[..., 0] * 0.27 + images[..., 1] * 0.67 +
           images[..., 2] * 0.06 + 1e-5)
    luminance = jnp.mean(lum, axis=(1, 2))
    contrast = jnp.var(lum, axis=(1, 2))
    clipped = jnp.clip(images, 0.0, 1.0)
    i_max = jnp.max(clipped, axis=3)
    i_min = jnp.min(clipped, axis=3)
    sat = (i_max - i_min) / (jnp.minimum(i_max + i_min, 2.0 - i_max - i_min)
                             + 1e-2)
    saturation = jnp.mean(sat, axis=(1, 2))
    return jnp.stack([luminance, contrast, saturation], axis=1)


class CriticNet(nn.Module):
    """WGAN critic / value network with stats (+state) channels."""

    base_channels: int = 32
    fc1_size: int = 128

    @nn.compact
    def __call__(self, images, states=None):
        stat = critic_stats(images)
        if states is None:
            states = stat
        else:
            states = jnp.concatenate([states, stat], axis=1)
        # Broadcast per-image scalars as constant channels
        # (reference critics.py:82-87).
        bcast = states[:, None, None, :] + images[:, :, :, 0:1] * 0
        x = jnp.concatenate([images, bcast], axis=3)

        x = x - 0.5
        size = x.shape[2]
        channels = self.base_channels
        x = nn.Conv(channels, (4, 4), strides=(2, 2), padding='SAME',
                    kernel_init=_glorot)(x)
        x = lrelu(x)
        size //= 2
        while size > 4:
            channels *= 2
            size //= 2
            x = nn.Conv(channels, (4, 4), strides=(2, 2), padding='SAME',
                        kernel_init=_glorot)(x)
            x = lrelu(x)
        x = x.reshape((x.shape[0], 4 * 4 * channels))
        x = nn.Dense(self.fc1_size, kernel_init=_glorot)(x)
        x = lrelu(x)
        logit = nn.Dense(1, kernel_init=_glorot)(x)
        return logit
