"""Small numeric building blocks shared across the framework.

These are jnp re-designs of the scalar helpers the reference keeps in
util.py (state constants util.py:13-16, lrelu util.py:225-229, rgb2lum
util.py:271-274, tanh01/tanh_range util.py:277-294, lerp util.py:307-308).
All functions are pure and jit/vmap/grad friendly.
"""

import math

import jax.numpy as jnp

# Trajectory-state vector layout (reference util.py:6-16):
#   [0] got-reward flag, [1] stopped flag, [2] step count,
#   [3:3+K] per-filter usage bits.
STATE_REWARD_DIM = 0
STATE_STOPPED_DIM = 1
STATE_STEP_DIM = 2
STATE_DROPOUT_BEGIN = 3


def lrelu(x, leak=0.2):
    """Leaky ReLU written as an abs-combination (reference util.py:225-229)."""
    f1 = 0.5 * (1 + leak)
    f2 = 0.5 * (1 - leak)
    return f1 * x + f2 * jnp.abs(x)


def rgb2lum(image):
    """Luminance of an NHWC image, keepdims (reference util.py:271-274)."""
    lum = (0.27 * image[..., 0] + 0.67 * image[..., 1] + 0.06 * image[..., 2])
    return lum[..., None]


def tanh01(x):
    return jnp.tanh(x) * 0.5 + 0.5


def tanh_range(l, r, initial=None):
    """Bounded activation mapping R -> (l, r).

    ``initial`` shifts the pre-activation so that x=0 maps to ``initial``
    (reference util.py:281-294).  All shipped configs end up with bias 0,
    but the machinery is kept for parity.
    """

    def activation(x):
        if initial is not None:
            bias = math.atanh(2 * (initial - l) / (r - l) - 1)
        else:
            bias = 0.0
        return tanh01(x + bias) * (r - l) + l

    return activation


def lerp(a, b, t):
    return (1 - t) * a + t * b
