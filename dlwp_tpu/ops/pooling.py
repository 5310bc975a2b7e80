"""Pooling and upsampling on the trailing (lat, lon) axes.

Functional equivalents of the Keras ``MaxPooling2D`` / ``AveragePooling2D`` /
``UpSampling2D`` layers used by the reference's conv-pool-upsample tower
(examples/train.py:142-221), built on ``lax.reduce_window`` / ``jnp.repeat``
so they lower to native TPU windowed ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool(x, window, strides, init, op):
    if strides is None:
        strides = window
    dims = (1,) * (x.ndim - 2) + tuple(window)
    strd = (1,) * (x.ndim - 2) + tuple(strides)
    return lax.reduce_window(x, init, op, dims, strd, "VALID")


def max_pool2d(x: jax.Array, window=(2, 2), strides=None) -> jax.Array:
    """Max pooling over the trailing two axes (VALID, Keras default)."""
    return _pool(x, window, strides, -jnp.inf, lax.max)


def avg_pool2d(x: jax.Array, window=(2, 2), strides=None) -> jax.Array:
    """Average pooling over the trailing two axes."""
    s = _pool(x, window, strides, 0.0, lax.add)
    return s / (window[0] * window[1])


def upsample2d(x: jax.Array, factor=(2, 2)) -> jax.Array:
    """Nearest-neighbor upsampling (Keras ``UpSampling2D`` semantics)."""
    x = jnp.repeat(x, factor[0], axis=-2)
    return jnp.repeat(x, factor[1], axis=-1)
