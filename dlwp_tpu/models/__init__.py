"""Neural-network model API: flax layers, declarative builder, wrapper."""

from dlwp_tpu.models.layers import (
    CyclicConv2D,
    RowConv2D,
    ConvLSTM2D,
    MaxPool2D,
    AvgPool2D,
    UpSampling2D,
    Reshape,
    Activation,
    get_activation,
)
from dlwp_tpu.models.cnn import SequentialModel, build_sequential, LAYER_REGISTRY
from dlwp_tpu.models.api import DLWPNeuralNet, DLWPFunctional, shape_series
from dlwp_tpu.models.unet import SkipTower, SliceChannels
from dlwp_tpu.models.spherical import S2Convolution, SO3Convolution

__all__ = [
    "CyclicConv2D",
    "RowConv2D",
    "ConvLSTM2D",
    "MaxPool2D",
    "AvgPool2D",
    "UpSampling2D",
    "Reshape",
    "Activation",
    "get_activation",
    "SequentialModel",
    "build_sequential",
    "LAYER_REGISTRY",
    "DLWPNeuralNet",
    "DLWPFunctional",
    "shape_series",
    "SkipTower",
    "SliceChannels",
    "S2Convolution",
    "SO3Convolution",
]
