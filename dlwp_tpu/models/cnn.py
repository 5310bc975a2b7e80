"""Declarative sequential model builder.

The reference's model-architecture "config language" is a list of
``(layer_name, args, kwargs)`` tuples resolved by reflection against
``keras.layers`` then ``DLWP.custom`` (models.py:63-103, util.py:82-93).
This module keeps that declarative surface -- specs are data, resolvable from
a registry by name -- but resolves into flax modules composed in a single
:class:`SequentialModel`, and also accepts flax module instances directly.

Registry names cover both the TPU-native fused layers (``CyclicConv2D``,
``RowConv2D``, ...) and reference-style aliases (``PeriodicPadding2D``,
``ZeroPadding2D``, ``Conv2D``, ``MaxPooling2D``, ``UpSampling2D``,
``ConvLSTM2D``, ``Reshape``) so reference architectures translate
line-for-line when desired.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from dlwp_tpu.models.layers import (
    Activation,
    AvgPool2D,
    ConvLSTM2D,
    CyclicConv2D,
    MaxPool2D,
    Reshape,
    RowConv2D,
    UpSampling2D,
    get_activation,
    _pair,
)


class _Pad(nn.Module):
    """Standalone padding layer over the trailing axes.

    ``padding`` follows the Keras convention of the matching reference
    layers: an int or per-axis amounts for the trailing len(padding) axes.
    """

    padding: Any = 1
    mode: str = "periodic"  # periodic | zero | fill

    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            amounts = [(pad, pad), (pad, pad)]
        else:
            amounts = [(p, p) if isinstance(p, int) else tuple(p) for p in pad]
        full = [(0, 0)] * (x.ndim - len(amounts)) + amounts
        if self.mode == "periodic":
            return jnp.pad(x, full, mode="wrap")
        if self.mode == "zero":
            return jnp.pad(x, full)
        if self.mode == "fill":
            return jnp.pad(x, full, mode="edge")
        raise ValueError(self.mode)


class PeriodicPadding2D(_Pad):
    mode: str = "periodic"


class ZeroPadding2D(_Pad):
    mode: str = "zero"


class FillPadding2D(_Pad):
    mode: str = "fill"


# 3-D variants are the same op over three trailing axes.
PeriodicPadding3D = PeriodicPadding2D
ZeroPadding3D = ZeroPadding2D
FillPadding3D = FillPadding2D


class TFPadding2D(nn.Module):
    """`tf.pad`-mode padding layer (reference ``TFPadding2D``,
    custom.py:527-599): CONSTANT / SYMMETRIC / REFLECT modes over the two
    trailing spatial axes, with ``constant_values`` for CONSTANT mode."""

    padding: Any = (1, 1)
    mode: str = "CONSTANT"
    constant_values: float = 0.0
    n_axes: int = 2

    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            amounts = [(pad, pad)] * self.n_axes
        else:
            amounts = [(p, p) if isinstance(p, int) else tuple(p) for p in pad]
        full = [(0, 0)] * (x.ndim - len(amounts)) + amounts
        mode = self.mode.upper()
        if mode == "CONSTANT":
            return jnp.pad(x, full, constant_values=self.constant_values)
        if mode == "SYMMETRIC":
            return jnp.pad(x, full, mode="symmetric")
        if mode == "REFLECT":
            return jnp.pad(x, full, mode="reflect")
        raise ValueError(f"unknown tf.pad mode {self.mode!r}")


class TFPadding3D(TFPadding2D):
    """3-axis variant (reference ``TFPadding3D``, custom.py:602-672)."""

    padding: Any = (1, 1, 1)
    n_axes: int = 3


class Conv2D(nn.Module):
    """Plain Keras-style Conv2D (channels-first), VALID or SAME padding.

    For reference-style specs that do their own explicit padding layers
    before a VALID conv (train.py:152-158).
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: tuple[int, int] = (1, 1)
    padding: str = "valid"
    dilation_rate: int | tuple[int, int] = 1
    activation: str | Callable | None = "linear"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        c_in = x.shape[-3]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=1, out_axis=0),
            (self.features, c_in, kh, kw),
            x.dtype,
        )
        batch_shape = x.shape[:-3]
        x4 = x.reshape((-1,) + x.shape[-3:])
        y = lax.conv_general_dilated(
            x4,
            kernel,
            window_strides=self.strides,
            padding=self.padding.upper(),
            rhs_dilation=_pair(self.dilation_rate),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        y = y.reshape(batch_shape + y.shape[1:])
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), x.dtype
            )
            y = y + bias[..., :, None, None]
        return get_activation(self.activation)(y)


class Dense(nn.Module):
    features: int
    activation: str | Callable | None = "linear"

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, name="dense")(x)
        return get_activation(self.activation)(y)


def _maxpool(*args, **kw):
    # Keras passes pool_size positionally, possibly as scalar.
    size = args[0] if args else kw.pop("pool_size", 2)
    if isinstance(size, tuple) and len(size) == 1:
        size = size[0]
    kw.pop("data_format", None)
    return MaxPool2D(window=size)


def _avgpool(*args, **kw):
    size = args[0] if args else kw.pop("pool_size", 2)
    if isinstance(size, tuple) and len(size) == 1:
        size = size[0]
    kw.pop("data_format", None)
    return AvgPool2D(window=size)


def _upsample(*args, **kw):
    size = args[0] if args else kw.pop("size", 2)
    if isinstance(size, tuple) and len(size) == 1:
        size = size[0]
    kw.pop("data_format", None)
    return UpSampling2D(factor=size)


def _reshape(*args, **kw):
    shape = args[0] if args else kw["target_shape"]
    return Reshape(shape=shape)


def _keras_conv(cls):
    def build(*args, **kw):
        kw.pop("data_format", None)
        kw.pop("input_shape", None)
        kw.pop("kernel_regularizer", None)  # handled via optimizer weight decay
        kw.pop("return_sequences", None)
        if cls is Conv2D:
            kw.setdefault("dilation_rate", kw.pop("dilation", 1))
        else:
            # Fused layers call it `dilation`; drop the VALID-padding flag
            # (boundary handling is built in).
            if "dilation_rate" in kw:
                kw["dilation"] = kw.pop("dilation_rate")
            kw.pop("padding", None)
        if len(args) >= 2:
            return cls(features=args[0], kernel_size=args[1], **kw)
        if len(args) == 1:
            return cls(features=args[0], **kw)
        return cls(**kw)

    return build


def _convlstm(*args, **kw):
    kw.pop("data_format", None)
    kw.pop("input_shape", None)
    kw.pop("kernel_regularizer", None)
    kw.pop("padding", None)  # boundary handling is built in
    kw["dilation"] = kw.pop("dilation_rate", kw.pop("dilation", 1))
    if len(args) >= 2:
        return ConvLSTM2D(features=args[0], kernel_size=args[1], **kw)
    return ConvLSTM2D(features=args[0], **kw) if args else ConvLSTM2D(**kw)


def _pad_layer(cls):
    def build(*args, **kw):
        kw.pop("data_format", None)
        kw.pop("input_shape", None)
        pad = args[0] if args else kw.get("padding", 1)
        return cls(padding=pad)

    return build


def _tf_pad_layer(cls):
    def build(*args, **kw):
        kw.pop("data_format", None)
        kw.pop("input_shape", None)
        pad = args[0] if args else kw.get("padding", cls.padding)
        return cls(
            padding=pad,
            mode=kw.get("mode", "CONSTANT"),
            constant_values=kw.get("constant_values", 0.0),
        )

    return build


def _slice_layer(*args, **kw):
    # reference slice_layer(start, stop, axis) factory (custom.py:675-692)
    from dlwp_tpu.models.unet import SliceChannels

    if args:
        start, stop = args[0], args[1]
        axis = args[2] if len(args) > 2 else kw.get("axis", -3)
    else:
        start, stop, axis = kw["start"], kw["stop"], kw.get("axis", -3)
    # Keras axis=1 == channels-first channel axis == our -3.
    if axis == 1:
        axis = -3
    return SliceChannels(start=start, stop=stop, axis=axis)


LAYER_REGISTRY: dict[str, Callable[..., nn.Module]] = {
    # TPU-native fused layers
    "CyclicConv2D": _keras_conv(CyclicConv2D),
    "RowConv2D": _keras_conv(RowConv2D),
    "RowConnected2D": _keras_conv(RowConv2D),  # reference name, custom.py:695
    "slice_layer": _slice_layer,  # reference name, custom.py:675
    "ConvLSTM2D": _convlstm,
    # Reference-style aliases (keras.layers + DLWP.custom vocabulary)
    "Conv2D": _keras_conv(Conv2D),
    "Dense": _keras_conv(Dense),
    "MaxPooling2D": _maxpool,
    "AveragePooling2D": _avgpool,
    "UpSampling2D": _upsample,
    "Reshape": _reshape,
    "Activation": lambda *a, **k: Activation(fn=a[0] if a else k.get("activation", "linear")),
    "PeriodicPadding2D": _pad_layer(PeriodicPadding2D),
    "PeriodicPadding3D": _pad_layer(PeriodicPadding3D),
    "ZeroPadding2D": _pad_layer(ZeroPadding2D),
    "ZeroPadding3D": _pad_layer(ZeroPadding3D),
    "FillPadding2D": _pad_layer(FillPadding2D),
    "FillPadding3D": _pad_layer(FillPadding3D),
    "TFPadding2D": _tf_pad_layer(TFPadding2D),
    "TFPadding3D": _tf_pad_layer(TFPadding3D),
}


def _s2conv(name):
    # Reference spec tuples (train_torch.py:103-110): positional
    # (nfeature_in, nfeature_out, b_in, b_out, grid), kwargs mean_gamma /
    # activation. Resolved lazily so the spectral stack only imports when
    # spherical layers are actually used.
    def build(*args, **kw):
        from dlwp_tpu.models import spherical as S

        return getattr(S, name)(*args, **kw)

    return build


def _torch_linear(*args, **kw):
    # torch.nn.Linear spec (in_features, out_features) as used by
    # train_torch.py:112; in_features is implied by the input here.
    if len(args) >= 2:
        return Dense(features=args[1], **kw)
    return Dense(features=kw.pop("out_features", args[0] if args else kw.pop("features")), **kw)


def _torch_reshape(*args, **kw):
    # Reference TorchReshape takes the FULL shape including the batch -1
    # (models_torch.py usage, train_torch.py:111); Keras/our Reshape takes
    # trailing dims only.
    shape = args[0] if args else kw["shape"]
    shape = tuple(shape)
    if shape and shape[0] == -1:
        shape = shape[1:]
    elif shape:
        # A torch view spec always leads with the batch dim; an explicit
        # value there (e.g. (64, 3, 19, 36)) passed on to Reshape's
        # trailing dims would silently ADD a dimension (ADVICE r4).
        raise ValueError(
            f"TorchReshape shape {shape} must lead with -1 (the batch "
            f"dimension, as in the reference's torch view specs); got "
            f"{shape[0]!r}"
        )
    return Reshape(shape=shape)


LAYER_REGISTRY["S2Convolution"] = _s2conv("S2Convolution")
LAYER_REGISTRY["SO3Convolution"] = _s2conv("SO3Convolution")
LAYER_REGISTRY["Linear"] = _torch_linear
LAYER_REGISTRY["TorchReshape"] = _torch_reshape


def _fused_layer(name):
    def build(*args, **kw):
        from dlwp_tpu.models import layers as L

        cls = getattr(L, name)
        kw.pop("data_format", None)
        kw.pop("input_shape", None)
        if "dilation_rate" in kw:
            kw["dilation"] = kw.pop("dilation_rate")
        if len(args) >= 2:
            return cls(features=args[0], kernel_size=args[1], **kw)
        return cls(features=args[0], **kw) if args else cls(**kw)

    return build


# Direct declarative access to the fused layers (the peephole pass in
# build_sequential produces these automatically from conv+pool and
# upsample+conv pairs; these names let users write them explicitly).
LAYER_REGISTRY["FusedConvPool2D"] = _fused_layer("FusedConvPool2D")
LAYER_REGISTRY["UpConv2D"] = _fused_layer("UpConv2D")


def resolve_layer(spec) -> nn.Module:
    """Resolve one layer spec: a flax Module, or (name, args, kwargs)."""
    if isinstance(spec, nn.Module):
        return spec
    name, args, kwargs = spec
    args = args or ()
    kwargs = dict(kwargs or {})
    try:
        builder = LAYER_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown layer {name!r}; registered: {sorted(LAYER_REGISTRY)}"
        ) from None
    return builder(*args, **kwargs)


def _peephole_fuse(layers: tuple) -> tuple:
    """Fuse adjacent layer pairs that have cheaper fused forms, preserving
    the parameter tree (pool/upsample layers carry no parameters, so a
    fused layer takes the conv's slot and an Identity fills the other):

    - CyclicConv2D(3x3, tanh, stride 1, zero lat) + MaxPool2D(2)
      -> FusedConvPool2D (one Pallas kernel on TPU; the full-resolution
         conv activation never reaches HBM);
    - UpSampling2D(2) + CyclicConv2D(zero lat, stride 1)
      -> UpConv2D (algebraic small-grid collapse, pure XLA).
    """
    from dlwp_tpu.models.layers import (
        _MONOTONE_ACTIVATIONS,
        FusedConvPool2D,
        Identity,
        UpConv2D,
    )

    out = list(layers)
    for i in range(len(out) - 1):
        a, b = out[i], out[i + 1]
        if (
            isinstance(a, CyclicConv2D)
            and isinstance(b, MaxPool2D)
            and _pair(b.window) == (2, 2)
            and _pair(a.kernel_size) == (3, 3)
            and a.strides == (1, 1)
            and a.lat_mode == "zero"
            and a.activation in _MONOTONE_ACTIVATIONS
            and a.spatial is None
        ):
            out[i] = FusedConvPool2D(
                features=a.features,
                kernel_size=a.kernel_size,
                dilation=a.dilation,
                activation=a.activation,
                use_bias=a.use_bias,
                dtype=a.dtype,
            )
            out[i + 1] = Identity()
        elif (
            isinstance(a, UpSampling2D)
            and _pair(a.factor) == (2, 2)
            and isinstance(b, CyclicConv2D)
            and b.strides == (1, 1)
            and b.lat_mode == "zero"
            and b.spatial is None
            and _pair(b.kernel_size)[0] == _pair(b.kernel_size)[1]
        ):
            out[i] = Identity()
            out[i + 1] = UpConv2D(
                features=b.features,
                kernel_size=b.kernel_size,
                dilation=b.dilation,
                activation=b.activation,
                use_bias=b.use_bias,
                dtype=b.dtype,
            )
    # Second pass: a dilation-2 UpConv's output is itself an upsample of a
    # small grid, so a following conv collapses too -- defer the upsample
    # into the consumer (param slots unchanged).
    for i in range(len(out) - 1):
        a, b = out[i], out[i + 1]
        if (
            isinstance(a, UpConv2D)
            and not a.emit_small
            and _pair(a.dilation) == (2, 2)
            and isinstance(b, CyclicConv2D)
            and b.strides == (1, 1)
            and b.lat_mode == "zero"
            and b.spatial is None
            and _pair(b.kernel_size)[0] == _pair(b.kernel_size)[1]
            and _pair(b.kernel_size)[0] <= 5
            and _pair(b.dilation) in ((1, 1), (2, 2))
        ):
            out[i] = a.clone(emit_small=True)
            out[i + 1] = UpConv2D(
                features=b.features,
                kernel_size=b.kernel_size,
                dilation=b.dilation,
                activation=b.activation,
                use_bias=b.use_bias,
                dtype=b.dtype,
                input_small=True,
            )
    return tuple(out)


def build_sequential(
    specs: Sequence, spatial=None, fuse: bool = True
) -> "SequentialModel":
    """Build a SequentialModel from a list of specs (reference
    ``build_model`` layer-tuple semantics, models.py:63-103).

    ``spatial``: optional
    :class:`~dlwp_tpu.parallel.spatial.SpatialSharding`; attached to every
    layer that supports it so convs run the explicit lat-band sharded path.

    ``fuse``: apply the parameter-preserving peephole fusions
    (:func:`_peephole_fuse`) -- conv+pool and upsample+conv pairs collapse
    into fused layers with identical parameter trees and equivalent math.
    """
    layers = tuple(resolve_layer(s) for s in specs)
    if spatial is not None:
        from dlwp_tpu.parallel.spatial import attach_spatial

        layers = tuple(attach_spatial(l, spatial) for l in layers)
    if fuse:
        layers = _peephole_fuse(layers)
    return SequentialModel(layers=layers)


class SequentialModel(nn.Module):
    """Apply a fixed sequence of layers (the reference's Keras
    ``Sequential`` equivalent)."""

    layers: tuple

    @nn.compact
    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x
