"""Skip-connection (U-Net-style) model architectures.

The reference's functional API builds a skip-connection variant of the
tower (``examples/train_functional.py:248-276``): after each
encoder conv, the channels are *split* -- part continues down through
pooling, part is carried across as a skip -- and the skips are
concatenated back in on the upsampling path. This module provides the
building blocks (:class:`SliceChannels`, channel concatenation inside
:class:`SkipTower`) and the complete flax equivalent of the reference's
``skip_model``, with fused spherical convs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dlwp_tpu.models.layers import (
    ConvLSTM2D,
    CyclicConv2D,
    MaxPool2D,
    Reshape,
    SplitConvPool2D,
    UpSampling2D,
)


class SliceChannels(nn.Module):
    """Channel slice (the reference's ``slice_layer``, custom.py:675-692)."""

    start: int
    stop: int
    axis: int = -3

    def __call__(self, x):
        idx = [slice(None)] * x.ndim
        idx[self.axis] = slice(self.start, self.stop)
        return x[tuple(idx)]


class SkipTower(nn.Module):
    """The reference ``skip_model`` (train_functional.py:248-276):

    conv(32) -> split 16/16 (skip1) -> pool -> conv(64) -> split 32/32
    (skip2) -> pool -> conv(128) -> up -> conv(64) -> concat skip2 -> up ->
    conv(32) -> concat skip1 -> conv(c_out, 5x5), all with
    periodic-longitude boundaries. Filter counts scale with ``width``.

    For recurrent inputs (B, T, C, H, W) set ``time_steps`` > 0 to enable
    the ConvLSTM front end + reshape bridge (train_functional.py:222-244).
    """

    c_out: int
    width: int = 32
    time_steps: int = 0
    lstm_features: int = 8
    activation: str = "tanh"
    spatial: object = None  # SpatialSharding for lat-band sharded convs

    @nn.compact
    def __call__(self, x):
        w = self.width
        sp = self.spatial
        if self.time_steps:
            B, T, C, H, W = x.shape
            x = ConvLSTM2D(self.lstm_features, 3, dilation=2,
                           return_sequences=True, spatial=sp)(x)
            x = x.reshape(B, T * self.lstm_features, H, W)

        if sp is None:
            # Fused conv -> split -> pool: only the skip half is computed
            # at full resolution (the pooled half runs on quarter-res
            # parity planes). Explicit names keep the parameter tree
            # identical to the unfused composition below.
            x, skip1 = SplitConvPool2D(
                w, keep=w // 2, kernel_size=3, dilation=2,
                activation=self.activation, name="CyclicConv2D_0",
            )(x)
        else:
            x = CyclicConv2D(w, 3, dilation=2, activation=self.activation,
                             spatial=sp, name="CyclicConv2D_0")(x)
            x, skip1 = x[:, : w // 2], x[:, w // 2 :]
            x = MaxPool2D(2)(x)
        x = CyclicConv2D(2 * w, 3, activation=self.activation, spatial=sp,
                         name="CyclicConv2D_1")(x)
        x, skip2 = x[:, :w], x[:, w:]
        x = MaxPool2D(2)(x)
        x = CyclicConv2D(4 * w, 3, activation=self.activation, spatial=sp,
                         name="CyclicConv2D_2")(x)
        if sp is None:
            # Algebraic upsample+conv collapse (ops.conv.conv_after_upsample2)
            from dlwp_tpu.models.layers import UpConv2D

            x = UpConv2D(2 * w, 3, activation=self.activation)(x)
            x = jnp.concatenate([x, skip2], axis=-3)
            x = UpConv2D(w, 3, dilation=2, activation=self.activation)(x)
        else:
            x = UpSampling2D(2)(x)
            x = CyclicConv2D(2 * w, 3, activation=self.activation,
                             spatial=sp, name="CyclicConv2D_3")(x)
            x = jnp.concatenate([x, skip2], axis=-3)
            x = UpSampling2D(2)(x)
            x = CyclicConv2D(w, 3, dilation=2, activation=self.activation,
                             spatial=sp, name="CyclicConv2D_4")(x)
        x = jnp.concatenate([x, skip1], axis=-3)
        # Final conv: auto-naming historically gave _3 on the fused branch
        # (UpConv2D takes the up-convs there) and _5 on the spatial branch.
        x = CyclicConv2D(self.c_out, 5, activation="linear", spatial=sp,
                         name="CyclicConv2D_3" if sp is None else
                         "CyclicConv2D_5")(x)
        return x
