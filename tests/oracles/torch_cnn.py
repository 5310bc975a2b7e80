"""Independent PyTorch implementation of the spherical CNN layer semantics.

Parity oracle, NOT production code: a second, from-the-spec implementation
of the layers the flagship model is built from — periodic-longitude
convolution (reference ``PeriodicPadding2D + ZeroPadding2D + Conv2D``,
custom.py:139-214 + train.py:152-158), Keras-default max pooling /
nearest-neighbor upsampling (train.py:159-218), and a ConvLSTM cell with
standalone-Keras gate semantics (i, f, g, o; hard_sigmoid gates — the Keras
default the reference leaves in place by passing only activation='tanh' —
tanh candidate/output; models the reference's ConvLSTM2D front end,
train.py:144-157). 'sigmoid' gates remain selectable for the smooth-gate
variant.

Written directly against torch primitives with no jax imports, so any
agreement with ``dlwp_tpu`` is evidence of correct semantics rather than a
shared-code tautology. In particular it contains NONE of the production
side's algebraic fusions (conv+pool parity forms, dense upsample collapse,
first-LSTM-step specialization): running the fused flagship against this
straight-line tower checks those rewrites end to end.

Everything runs in float64 by default so the oracle itself contributes no
meaningful rounding error.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def pad_sphere(x, pad_lat, pad_lon, lat_mode="zero"):
    """Pad the trailing (lat, lon) axes: circular in longitude, ``lat_mode``
    ('zero' | 'edge' | 'reflect') in latitude. ``pad_lat``/``pad_lon`` are
    (before, after) pairs."""
    pl, pr = pad_lon
    if pl or pr:
        pieces = []
        if pl:
            pieces.append(x[..., x.shape[-1] - pl :])
        pieces.append(x)
        if pr:
            pieces.append(x[..., :pr])
        x = torch.cat(pieces, dim=-1)
    pt, pb = pad_lat
    if pt or pb:
        mode = {"zero": "constant", "edge": "replicate", "reflect": "reflect"}[
            lat_mode
        ]
        x = F.pad(x, (0, 0, pt, pb), mode=mode)
    return x


def cyclic_conv2d(x, weight, bias=None, strides=(1, 1), dilation=(1, 1),
                  lat_mode="zero"):
    """Periodic-longitude 'same' convolution: wrap-pad lon, ``lat_mode``-pad
    lat, then a VALID torch conv. x: (B, C, H, W); weight: (O, I, kh, kw)."""
    kh, kw = weight.shape[-2:]
    dh, dw = dilation
    eh, ew = (kh - 1) * dh, (kw - 1) * dw
    x = pad_sphere(
        x, (eh // 2, eh - eh // 2), (ew // 2, ew - ew // 2), lat_mode
    )
    return F.conv2d(x, weight, bias, stride=strides, dilation=dilation)


def max_pool2d(x, window=2):
    return F.max_pool2d(x, window)


def avg_pool2d(x, window=2):
    return F.avg_pool2d(x, window)


def upsample2d(x, factor=2):
    return F.interpolate(x, scale_factor=factor, mode="nearest")


def hard_sigmoid(t):
    """Keras's hard_sigmoid: clip(0.2x + 0.5, 0, 1). (torch.nn.functional
    ``hardsigmoid`` and jax.nn.hard_sigmoid both use relu6(x+3)/6 -- slope
    1/6, a DIFFERENT function; the reference runs standalone Keras.)"""
    return torch.clamp(0.2 * t + 0.5, 0.0, 1.0)


_GATE_ACT = {"hard_sigmoid": hard_sigmoid, "sigmoid": torch.sigmoid}


def conv_lstm(x, input_kernel, recurrent_kernel, bias, dilation=(1, 1),
              lat_mode="zero", recurrent_activation="hard_sigmoid"):
    """Keras-semantics ConvLSTM over (B, T, C, H, W) with spherical
    boundaries on BOTH convolutions (the input conv takes ``dilation``, the
    recurrent conv is undilated). Gate order i, f, g, o along the channel
    axis; zero initial state; hard_sigmoid gates by default (the
    standalone-Keras default the reference model runs with). Returns the
    full hidden sequence (B, T, F, H, W)."""
    B, T, C, H, W = x.shape
    feats = recurrent_kernel.shape[1]
    r_act = _GATE_ACT[recurrent_activation]
    h = x.new_zeros((B, feats, H, W))
    c = x.new_zeros((B, feats, H, W))
    outs = []
    for t in range(T):
        z = (
            cyclic_conv2d(x[:, t], input_kernel, dilation=dilation,
                          lat_mode=lat_mode)
            + cyclic_conv2d(h, recurrent_kernel, lat_mode=lat_mode)
            + bias[:, None, None]
        )
        i, f, g, o = torch.chunk(z, 4, dim=1)
        c = r_act(f) * c + r_act(i) * torch.tanh(g)
        h = r_act(o) * torch.tanh(c)
        outs.append(h)
    return torch.stack(outs, dim=1)


def row_conv2d(x, bank, bias=None, lat_mode="zero"):
    """Latitude-dependent convolution (reference RowConnected2D,
    custom.py:695-896): an independent filter set per output row. bank:
    (H, O, I, kh, kw); implemented as the literal per-row loop."""
    H = x.shape[-2]
    rows = []
    for r in range(H):
        kh, kw = bank.shape[-2:]
        eh, ew = kh - 1, kw - 1
        xp = pad_sphere(
            x, (eh // 2, eh - eh // 2), (ew // 2, ew - ew // 2), lat_mode
        )
        slab = xp[..., r : r + kh, :]
        y = F.conv2d(slab, bank[r], bias[r] if bias is not None else None)
        rows.append(y)
    return torch.cat(rows, dim=-2)


_ACT = {"tanh": torch.tanh, "linear": lambda t: t, None: lambda t: t}


def to_tensors(weights, dtype=torch.float64, requires_grad=False):
    """numpy weight dict -> torch tensor dict (optionally differentiable)."""
    return {
        i: {
            k: torch.from_numpy(np.array(v)).to(dtype).requires_grad_(
                requires_grad
            )
            for k, v in d.items()
        }
        for i, d in weights.items()
    }


def forward(specs, weights, x, dtype=torch.float64):
    """Run a layer-spec list (the framework's declarative model config,
    reference models.py:63-103 semantics) straight-line in torch.

    ``weights``: dict mapping spec index -> dict of numpy arrays (the
    ``layers_{i}`` entries of the flax param tree). ``x``: numpy input.
    """
    t = torch.from_numpy(np.array(x)).to(dtype)
    return apply(specs, to_tensors(weights, dtype), t).numpy()


def apply(specs, weights, t):
    """Tensor-level spec walk: ``weights`` holds torch tensors (may carry
    ``requires_grad`` so torch autograd can serve as a gradient oracle)."""

    def w(i, key):
        return weights[i][key]

    def pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    for i, spec in enumerate(specs):
        name, args, kwargs = spec
        kwargs = dict(kwargs or {})
        if name == "CyclicConv2D":
            t = cyclic_conv2d(
                t, w(i, "kernel"), w(i, "bias"),
                strides=pair(kwargs.get("strides", 1)),
                dilation=pair(kwargs.get("dilation", 1)),
                lat_mode=kwargs.get("lat_mode", "zero"),
            )
            t = _ACT[kwargs.get("activation", "linear")](t)
        elif name == "ConvLSTM2D":
            t = conv_lstm(
                t, w(i, "input_kernel"), w(i, "recurrent_kernel"),
                w(i, "bias"), dilation=pair(kwargs.get("dilation", 1)),
                lat_mode=kwargs.get("lat_mode", "zero"),
                recurrent_activation=kwargs.get("recurrent_activation",
                                                "hard_sigmoid"),
            )
            if not kwargs.get("return_sequences", True):
                t = t[:, -1]
        elif name == "RowConnected2D":
            t = row_conv2d(
                t, w(i, "kernel"), w(i, "bias"),
                lat_mode=kwargs.get("lat_mode", "zero"),
            )
            t = _ACT[kwargs.get("activation", "linear")](t)
        elif name == "MaxPooling2D":
            t = max_pool2d(t, args[0])
        elif name == "AveragePooling2D":
            t = avg_pool2d(t, args[0])
        elif name == "UpSampling2D":
            t = upsample2d(t, args[0])
        elif name == "Reshape":
            t = t.reshape((t.shape[0],) + tuple(args[0]))
        else:
            raise ValueError(f"torch oracle has no layer {name!r}")
    return t
