"""Stencil ops and losses for spherical-geometry CNNs."""

from dlwp_tpu.ops.padding import pad_periodic, pad_fill, pad_constant, pad_reflect
from dlwp_tpu.ops.conv import (
    cyclic_conv2d,
    row_conv2d,
)
from dlwp_tpu.ops.pooling import max_pool2d, avg_pool2d, upsample2d
from dlwp_tpu.ops.losses import (
    latitude_weighted_loss,
    anomaly_correlation,
    anomaly_correlation_loss,
    mse,
    mae,
)

__all__ = [
    "pad_periodic",
    "pad_fill",
    "pad_constant",
    "pad_reflect",
    "cyclic_conv2d",
    "row_conv2d",
    "max_pool2d",
    "avg_pool2d",
    "upsample2d",
    "latitude_weighted_loss",
    "anomaly_correlation",
    "anomaly_correlation_loss",
    "mse",
    "mae",
]
