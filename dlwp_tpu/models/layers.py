"""Flax layers for spherical-geometry weather CNNs.

TPU-native re-design of the reference's layer vocabulary: where the reference
stacks ``PeriodicPadding2D -> ZeroPadding2D -> Conv2D(valid)``
(examples/train.py:152-158) as three Keras layers, :class:`CyclicConv2D` is a
single layer whose boundary treatment (periodic longitude, configurable
latitude) is fused into the conv. :class:`ConvLSTM2D` covers the reference's
recurrent front end (train.py:144-157) with spherical padding on both input
and recurrent convolutions, scanning over the time axis with ``lax.scan``.

Data layout is channels-first: (batch, C, H, W), or (batch, T, C, H, W) for
recurrent layers -- matching the reference's ``data_format='channels_first'``
convention throughout.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dlwp_tpu.ops.conv import cyclic_conv2d, row_conv2d
from dlwp_tpu.ops.pooling import avg_pool2d, max_pool2d, upsample2d

_ACTIVATIONS: dict[str, Callable] = {
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    # Keras's definition (clip(0.2x + 0.5, 0, 1)), NOT jax.nn.hard_sigmoid
    # (relu6(x+3)/6, slope 1/6): the reference runs standalone Keras, where
    # hard_sigmoid is ConvLSTM2D's default recurrent activation
    # (reference train.py:150-156 passes only activation='tanh').
    "hard_sigmoid": lambda x: jnp.clip(0.2 * x + 0.5, 0.0, 1.0),
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "leaky_relu": jax.nn.leaky_relu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
}


def get_activation(act: str | Callable | None) -> Callable:
    """Resolve an activation by name (reference resolves activation strings
    via reflection, models_torch.py:134-141 / keras activation kwargs)."""
    if act is None:
        return _ACTIVATIONS["linear"]
    if callable(act):
        return act
    try:
        return _ACTIVATIONS[act]
    except KeyError:
        raise ValueError(
            f"unknown activation {act!r}; available: {sorted(_ACTIVATIONS)}"
        ) from None


def _pair(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


# Nondecreasing activations commute with max pooling exactly.
_MONOTONE_ACTIVATIONS = {
    "linear", None, "tanh", "relu", "sigmoid", "hard_sigmoid", "elu",
    "selu", "leaky_relu", "softplus",
}


class CyclicConv2D(nn.Module):
    """Conv2D with periodic-longitude boundary, fused.

    Equivalent capability to the reference stack
    ``PeriodicPadding2D((0, p)) + ZeroPadding2D((p, 0)) + Conv2D(valid)``
    (train.py:152-158). ``lat_mode='edge'`` reproduces the FillPadding
    variant (custom.py:309-402).
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: tuple[int, int] = (1, 1)
    dilation: int | tuple[int, int] = 1
    activation: str | Callable | None = "linear"
    lat_mode: str = "zero"
    use_bias: bool = True
    dtype: Any = None
    impl: str = "pad"  # 'pad' (default) | 'edgefix' (see ops.conv notes)
    # Optional dlwp_tpu.parallel.spatial.SpatialSharding: when set, the conv
    # dispatches to the explicit lat-band shard_map halo-exchange path
    # whenever shapes admit it (the integrated analogue of the reference's
    # multi_gpu_model wiring, models.py:104-109).
    spatial: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        c_in = x.shape[-3]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=1, out_axis=0),
            (self.features, c_in, kh, kw),
            self.dtype or x.dtype,
        )
        if self.spatial is not None:
            y = self.spatial.conv(
                x, kernel, strides=self.strides,
                dilation=_pair(self.dilation), lat_mode=self.lat_mode,
            )
        elif (
            self.impl == "edgefix"
            and self.strides == (1, 1)
            and self.lat_mode == "zero"
        ):
            from dlwp_tpu.ops.conv import cyclic_conv2d_edgefix

            y = cyclic_conv2d_edgefix(x, kernel, dilation=_pair(self.dilation))
        else:
            y = cyclic_conv2d(
                x, kernel, strides=self.strides, lat_mode=self.lat_mode,
                dilation=_pair(self.dilation),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.dtype or x.dtype,
            )
            y = y + bias[..., :, None, None]
        return get_activation(self.activation)(y)


class RowConv2D(nn.Module):
    """Latitude-dependent convolution layer (reference ``RowConnected2D``,
    custom.py:695-838): an independent filter bank per output latitude."""

    features: int
    kernel_size: int | tuple[int, int] = 3
    nlat: int | None = None  # inferred from input if None
    activation: str | Callable | None = "linear"
    lat_mode: str = "zero"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        H = self.nlat or x.shape[-2]
        c_in = x.shape[-3]
        bank = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=2, out_axis=1),
            (H, self.features, c_in, kh, kw),
            self.dtype or x.dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (H, self.features),
                self.dtype or x.dtype,
            )
            if self.use_bias
            else None
        )
        y = row_conv2d(x, bank, bias, lat_mode=self.lat_mode)
        return get_activation(self.activation)(y)


# Unrolled-recurrence conv formulation: 'separate' = per-step input conv
# (x_t * Wx, dilation d) + recurrent conv (h_t * Wh, dilation 1) as two
# convolutions; 'joint' = ONE conv of concat([x_t, h_t], C) with a
# channel-concatenated kernel (for d > 1 the input taps embed into the
# equivalent dense (d*(k-1)+1)^2 window, zero-stuffed, with Wh centered
# -- exact, same padding extent, tests/test_models.py). The joint form
# halves the conv launches per recurrent step but at d=2 pays
# (C+F)*25 vs C*9 + F*9 MACs; both convs are MXU-starved (K=108/N=48 at
# the canonical config) so only full-model measurement decides.
# Measured on TPU v5e (round 5b, perf_convlstm_joint.py, ABA through the
# product rollout): joint 176.2 vs separate 150.6 Mgp/s = +17.0% at
# 0.0% drift -- the convs are so MXU-starved that one 375-MAC conv beats
# two totalling 135 MACs; launch/epilogue boundaries dominate, FLOPs are
# free. Default 'joint'; override per-process via
# DLWP_CONVLSTM_JOINT={joint,separate}.
CONVLSTM_UNROLL_JOINT = "joint"


class ConvLSTM2D(nn.Module):
    """Convolutional LSTM over (batch, T, C, H, W), spherical boundaries.

    Covers the reference's ``ConvLSTM2D`` front end (train.py:144-157,
    standalone-Keras semantics: gates = hard_sigmoid (the Keras default the
    reference leaves in place -- it passes only ``activation='tanh'``),
    candidate/output = tanh, ``return_sequences`` to emit every step).
    ``recurrent_activation='sigmoid'`` selects the smooth-gate variant.
    Both the input and recurrent convolutions use periodic-longitude
    padding, so the recurrent state respects the spherical topology -- the
    reference could only pad the *input* (PeriodicPadding3D) and ran the
    recurrent conv with flat 'same' padding.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    dilation: int | tuple[int, int] = 1
    activation: str | Callable = "tanh"
    recurrent_activation: str | Callable = "hard_sigmoid"
    return_sequences: bool = True
    lat_mode: str = "zero"
    dtype: Any = None
    spatial: Any = None  # as in CyclicConv2D; applies to both convolutions
    gate_dtype: Any = None  # e.g. jnp.bfloat16: compute the gate chain
    # (activations + products) in this dtype, carry stays fp32. The gate
    # elementwise chain is VPU-bound (transcendental rate is
    # dtype-independent but HBM traffic halves): measured on v5e at the
    # canonical config this cuts the recurrent step 3241 -> 2794 us (-14%)
    # at ~0.2% relative h/c deviation over a 16-step scan (BASELINE.md).
    # None (default) = exact fp32 path; golden fixtures unchanged.
    gate_impl: str = "auto"  # 'auto' (= 'xla') | 'xla' | 'pallas'. The
    # in-scan gate chain is HBM-bandwidth-bound (hard_sigmoid vs sigmoid
    # is a wash; bf16 gates gain +26% -- BASELINE.md round 4): 'pallas'
    # fuses zx+zh and the whole gate chain into one VMEM pass
    # (ops/lstm_gates.py), bit-identical on TPU (measured fwd dev 0.0)
    # -- but it LOSES in-model (72.9 vs 83.0 Mgp/s flagship apply;
    # 78.0 vs 105.0 with bf16 gates): XLA overlaps the gate chain with
    # the recurrent conv, and the pallas_call serializes against it
    # while its saved HBM traffic is smaller than that overlap. Kept as
    # a measured opt-in (same disposition pattern as
    # FusedConvPool2D.use_pallas).

    @nn.compact
    def __call__(self, x):
        B, T, C, H, W = x.shape
        kh, kw = _pair(self.kernel_size)
        F = self.features
        dt = self.dtype or x.dtype
        Wx = self.param(
            "input_kernel",
            nn.initializers.glorot_uniform(in_axis=1, out_axis=0),
            (4 * F, C, kh, kw),
            dt,
        )
        Wh = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal(column_axis=0),
            (4 * F, F, kh, kw),
            dt,
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * F,), dt)
        act = get_activation(self.activation)
        r_act = get_activation(self.recurrent_activation)
        dil = _pair(self.dilation)

        if self.spatial is not None:
            conv = partial(self.spatial.conv, lat_mode=self.lat_mode)
        else:
            conv = partial(cyclic_conv2d, lat_mode=self.lat_mode)

        # The input-to-hidden convolutions do not depend on the recurrence:
        # compute them for every time step in one (B*T)-batched conv (one
        # large MXU contraction instead of T small ones inside the scan;
        # only the recurrent conv stays sequential).
        # Time-major from the start: transposing the C-channel INPUT
        # (B,T,C,...) -> (T,B,C,...) moves 4F/C times fewer bytes than
        # transposing the conv's 4F-channel output for the scan (the
        # canonical config: 3 ch vs 48 ch — the old moveaxis on zx_all
        # was a full ~2x-padded 191 MB HBM round trip).
        # Bias always folds into the input-conv epilogue (free in XLA;
        # also keeps the pallas kernel free of 1-D broadcasts, which
        # Mosaic cannot lower).
        unrolled = 1 < T <= 4
        if unrolled:
            # Per-step input convs: the stacked (T,B,4F,H,W) zx forces a
            # degenerate T(1,128)-layout slice per unrolled step (the
            # top op in the round-5 HLO dump); with no scan to feed,
            # convolve each window directly.
            def zx_of(t):
                return (conv(x[:, t], Wx, dilation=dil)
                        + bias[..., :, None, None])
        else:
            zx_all = conv(
                jnp.moveaxis(x, 1, 0).reshape(T * B, C, H, W), Wx,
                dilation=dil,
            ).reshape(T, B, 4 * F, H, W) + bias[..., :, None, None]

        gd = self.gate_dtype

        def gates(z, c):
            if gd is not None:
                z = z.astype(gd)
            i, f, g, o = jnp.split(z, 4, axis=-3)
            if gd is None:
                c_new = r_act(f) * c + r_act(i) * act(g)
                h_new = r_act(o) * act(c_new)
                return h_new, c_new
            c_new = (r_act(f) * c.astype(gd) + r_act(i) * act(g)).astype(c.dtype)
            h_new = (r_act(o) * act(c_new.astype(gd))).astype(c.dtype)
            return h_new, c_new

        impl = "xla" if self.gate_impl == "auto" else self.gate_impl
        if impl == "pallas" and not (
            self.spatial is None
            and isinstance(self.activation, str)
            and isinstance(self.recurrent_activation, str)
        ):
            raise ValueError(
                "gate_impl='pallas' requires named activations and no "
                "spatial sharding (the kernel is per-device)"
            )

        if impl == "pallas":
            from dlwp_tpu.ops.lstm_gates import fused_lstm_gates

            def step(carry, zx):  # zx carries the bias (folded above)
                h, c = carry
                zh = conv(h, Wh)
                h_new, c_new = fused_lstm_gates(
                    zx, zh, c, self.activation,
                    self.recurrent_activation, gd,
                )
                return (h_new, c_new), h_new
        else:
            def step(carry, zx):  # zx carries the bias (folded above)
                h, c = carry
                zh = conv(h, Wh)
                h_new, c_new = gates(zx + zh, c)
                return (h_new, c_new), h_new

        # First step specialized: the initial state is exactly zero, so
        # zh = conv(0) = 0 and the forget branch vanishes -- this removes
        # one full-resolution recurrent conv from the graph (the scan body
        # is compiled once and cannot exploit h0 = 0; measured 896 us per
        # h-conv at batch 64 on v5e, BASELINE.md).
        # Joint zx+zh formulation for the unrolled steps t >= 1 (see
        # CONVLSTM_UNROLL_JOINT above): z_t = conv(concat([x_t, h_t]), Wj)
        # with Wj the channel-concatenated kernel -- Wx's dilated taps
        # zero-stuffed into the dense equivalent window, Wh (dilation 1
        # per Keras ConvLSTM2D recurrent-conv semantics) centered. The
        # padding extent (d*(k-1)) matches the separate form exactly, so
        # the boundary treatment (cyclic lon + lat_mode) is identical.
        joint = (
            unrolled
            and impl == "xla"
            and self.spatial is None
            and os.environ.get("DLWP_CONVLSTM_JOINT", CONVLSTM_UNROLL_JOINT)
            == "joint"
        )
        if joint:
            k2h = dil[0] * (kh - 1) + 1
            k2w = dil[1] * (kw - 1) + 1
            Wj = jnp.zeros((4 * F, C + F, k2h, k2w), dt)
            Wj = Wj.at[:, :C, :: dil[0], :: dil[1]].set(Wx)
            rh0, rw0 = (k2h - kh) // 2, (k2w - kw) // 2
            Wj = Wj.at[:, C:, rh0:rh0 + kh, rw0:rw0 + kw].set(Wh)

            def step_joint(carry, t):
                h, c = carry
                z = (conv(jnp.concatenate([x[:, t], h], axis=-3), Wj)
                     + bias[..., :, None, None])
                h_new, c_new = gates(z, c)
                return (h_new, c_new), h_new

        z0 = zx_of(0) if unrolled else zx_all[0]  # bias folded in
        if gd is not None:
            z0 = z0.astype(gd)
        i0, _, g0, o0 = jnp.split(z0, 4, axis=-3)
        c1 = r_act(i0) * act(g0)
        h1 = r_act(o0) * act(c1)
        if gd is not None:
            c1 = c1.astype(x.dtype)
            h1 = h1.astype(x.dtype)
        if T == 1:
            h_last, hs = h1, h1[None]
        elif unrolled:
            # Unrolled recurrence for short windows (canonical config:
            # T=2, ONE recurrent step). The scan form forces its sliced
            # input through a degenerate T(1,128)-tiled layout copy and
            # stacks ys through the while-loop body (both top-cost ops in
            # the round-5 HLO dump); straight-line code lets XLA fuse
            # them away. Identical math to the scan branch (same `step`).
            carry, hs_list = (h1, c1), [h1]
            for t in range(1, T):
                carry, h_t = (step_joint(carry, t) if joint
                              else step(carry, zx_of(t)))
                hs_list.append(h_t)
            if self.return_sequences:
                # Stack batch-major directly (skips the time-major
                # stack + moveaxis pair; measured neutral on v5e round
                # 5 — XLA fused the transpose — kept as the simpler
                # graph).
                return jnp.stack(hs_list, axis=1)  # (B, T, F, H, W)
            return carry[0]
        else:
            (h_last, _), hs_rest = jax.lax.scan(step, (h1, c1), zx_all[1:])
            hs = jnp.concatenate([h1[None], hs_rest], axis=0)
        if self.return_sequences:
            return jnp.moveaxis(hs, 0, 1)  # (B, T, F, H, W)
        return h_last


class Identity(nn.Module):
    """No-op placeholder (keeps layer indices stable under peephole
    fusion in :func:`dlwp_tpu.models.cnn.build_sequential`)."""

    def __call__(self, x):
        return x


class FusedConvPool2D(nn.Module):
    """CyclicConv2D(3x3) + activation + MaxPool2D(2), fused.

    With ``use_pallas=True`` the chain runs as one Pallas kernel
    (:func:`dlwp_tpu.ops.fused_stages.fused_conv_pool`) that never writes
    the full-resolution conv activation to HBM. Measured on v5e this
    LOSES today (flagship rollout 177 vs 519 Mgp/s): the per-row
    (O, 3C) x (3C, W/2) matmuls are far too small for the MXU and the
    scoped-vmem limit forces many small batch chunks -- so the default is
    the XLA composition, which the peephole fusion still benefits from via
    the upsample collapse. Parameter names/shapes match ``CyclicConv2D``
    so peephole fusion preserves checkpoints.

    The fused kernel maxes raw conv outputs before the (monotone)
    activation, which is exact for any nondecreasing activation.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    dilation: int | tuple[int, int] = 1
    activation: str | Callable | None = "tanh"
    use_bias: bool = True
    dtype: Any = None
    use_pallas: bool | None = None  # None: off (measured slower; see above)
    # Even-dilation formulation: 'auto' (width-dependent, see below),
    # 'group' (parity planes stacked on channels, one
    # feature_group_count=4 conv), 'chandense' (same stacking, one DENSE
    # block-diagonal conv 4C -> 4O: half the MXU tile passes of the
    # grouped form at small channel counts), 'parity4' (four separate
    # quarter-grid convs + max), or 'unfused' (full-res conv + pool).
    # Measured on v5e IN-MODEL (isolated-stage timings invert in context
    # -- XLA fuses the strided parity slices into conv input fetches at
    # narrow widths): flagship apply at W=144: parity4 1438 us < unfused
    # 1444 < group 1579; at W=720: group 362 Mgp/s > unfused 287 >
    # parity4 152. 'auto' picks parity4 for W <= _PARITY_MAX_W, group
    # above it.
    parity_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        c_in = x.shape[-3]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=1, out_axis=0),
            (self.features, c_in, kh, kw),
            self.dtype or x.dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.dtype or x.dtype,
            )
            if self.use_bias
            else None
        )
        dil = _pair(self.dilation)
        use_pallas = bool(self.use_pallas)
        act = get_activation(self.activation)
        if (
            use_pallas
            and (kh, kw) == (3, 3)
            and dil[0] == dil[1]
            and self.activation == "tanh"
            and x.ndim == 4
            and x.shape[-1] % 2 == 0
            and x.shape[-2] % 2 == 0
            and jnp.dtype(x.dtype) == jnp.float32
        ):
            from dlwp_tpu.ops.fused_stages import fused_conv_pool

            return fused_conv_pool(x, kernel, bias, dilation=dil[0])
        from dlwp_tpu.ops.conv import _PARITY_MAX_W

        impl = self.parity_impl
        if impl == "auto":
            impl = "parity4" if x.shape[-1] <= _PARITY_MAX_W else "group"
        if (
            dil[0] % 2 == 0
            and dil[1] % 2 == 0
            and x.shape[-1] % 2 == 0
            and x.shape[-2] % 2 == 0
            and self.activation in _MONOTONE_ACTIVATIONS
            and impl != "unfused"
        ):
            if impl == "parity4":
                half_dil = (dil[0] // 2, dil[1] // 2)
                m = None
                for pr in (0, 1):
                    for pc in (0, 1):
                        o = cyclic_conv2d(
                            x[..., pr::2, pc::2], kernel, dilation=half_dil
                        )
                        m = o if m is None else jnp.maximum(m, o)
                if bias is not None:
                    m = m + bias[..., :, None, None]
                return act(m)
            from dlwp_tpu.ops.conv import conv_pool2_even_dilation

            m = conv_pool2_even_dilation(
                x, kernel, dilation=dil,
                form="dense" if impl == "chandense" else "group",
            )
            if bias is not None:
                m = m + bias[..., :, None, None]
            return act(m)
        y = cyclic_conv2d(x, kernel, dilation=dil)
        if bias is not None:
            y = y + bias[..., :, None, None]
        return max_pool2d(act(y), (2, 2))


class SplitConvPool2D(nn.Module):
    """CyclicConv2D + channel split + MaxPool2D(2) on the kept half, fused.

    The skip-model encoder (reference train_functional.py:248-276) splits
    each conv's channels: the first ``keep`` continue down through pooling,
    the rest carry across as a full-resolution skip. Only the skip half
    needs the full-resolution activation, so for even dilations the pooled
    half runs on quarter-resolution parity planes
    (:func:`dlwp_tpu.ops.conv.conv_pool2_even_dilation`) -- half the
    full-resolution conv work and traffic of the unfused
    conv -> split -> pool chain.

    Parameter tree is identical to ``CyclicConv2D(features)`` (one kernel,
    one bias), so it can take a conv's name/slot in an existing model.
    Returns ``(pooled, skip)``.
    """

    features: int
    keep: int
    kernel_size: int | tuple[int, int] = 3
    dilation: int | tuple[int, int] = 1
    activation: str | Callable | None = "tanh"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        c_in = x.shape[-3]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=1, out_axis=0),
            (self.features, c_in, kh, kw),
            self.dtype or x.dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.dtype or x.dtype,
            )
            if self.use_bias
            else None
        )
        dil = _pair(self.dilation)
        act = get_activation(self.activation)

        def finish(y, b):
            if b is not None:
                y = y + b[..., :, None, None]
            return act(y)

        skip = finish(
            cyclic_conv2d(x, kernel[self.keep :], dilation=dil),
            None if bias is None else bias[self.keep :],
        )
        from dlwp_tpu.ops.conv import conv_pool2_even_dilation

        if (
            dil[0] % 2 == 0
            and dil[1] % 2 == 0
            and x.shape[-1] % 2 == 0
            and x.shape[-2] % 2 == 0
            and self.activation in _MONOTONE_ACTIVATIONS
        ):
            pooled = finish(
                conv_pool2_even_dilation(x, kernel[: self.keep], dilation=dil),
                None if bias is None else bias[: self.keep],
            )
        else:
            pooled = max_pool2d(
                finish(
                    cyclic_conv2d(x, kernel[: self.keep], dilation=dil),
                    None if bias is None else bias[: self.keep],
                ),
                (2, 2),
            )
        return pooled, skip


class UpConv2D(nn.Module):
    """UpSampling2D(2) + CyclicConv2D, fused algebraically.

    Nearest-x2 upsampling collapses the following conv onto the small
    grid (:func:`dlwp_tpu.ops.conv.conv_after_upsample2`), so the
    full-resolution pre-conv activation never materializes. Parameter
    names/shapes match ``CyclicConv2D``.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    dilation: int | tuple[int, int] = 1
    activation: str | Callable | None = "linear"
    use_bias: bool = True
    dtype: Any = None
    # Chain-fusion flags (set by the peephole pass): a dilation-2 UpConv's
    # output is itself an upsample of a small grid, so a following conv can
    # also collapse. ``emit_small`` keeps the output on the small grid (the
    # consumer must be an UpConv2D with ``input_small``); ``input_small``
    # treats the input as the small grid of a deferred upsample.
    emit_small: bool = False
    input_small: bool = False

    @nn.compact
    def __call__(self, x):
        from dlwp_tpu.ops.conv import conv_after_upsample2, cyclic_conv2d

        kh, kw = _pair(self.kernel_size)
        c_in = x.shape[-3]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=1, out_axis=0),
            (self.features, c_in, kh, kw),
            self.dtype or x.dtype,
        )
        dil = _pair(self.dilation)
        if self.emit_small:
            # dilation-2 conv after x2 upsample == upsample(conv d1 small);
            # emit the small grid and let the consumer fold the upsample.
            assert dil == (2, 2)
            y = cyclic_conv2d(x, kernel)
        elif self.input_small:
            # x is the small grid of a deferred upsample.
            y = conv_after_upsample2(x, kernel, dilation=dil)
        else:
            y = conv_after_upsample2(x, kernel, dilation=dil)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.dtype or x.dtype,
            )
            y = y + bias[..., :, None, None]
        return get_activation(self.activation)(y)


class MaxPool2D(nn.Module):
    window: int | tuple[int, int] = 2

    def __call__(self, x):
        return max_pool2d(x, _pair(self.window))


class AvgPool2D(nn.Module):
    window: int | tuple[int, int] = 2

    def __call__(self, x):
        return avg_pool2d(x, _pair(self.window))


class UpSampling2D(nn.Module):
    factor: int | tuple[int, int] = 2

    def __call__(self, x):
        return upsample2d(x, _pair(self.factor))


class Reshape(nn.Module):
    """Reshape trailing (non-batch) dims (Keras ``Reshape`` semantics, as in
    the reference's post-ConvLSTM flatten, train.py:158)."""

    shape: Sequence[int]

    def __call__(self, x):
        return x.reshape((x.shape[0],) + tuple(self.shape))


class Activation(nn.Module):
    fn: str | Callable = "linear"

    def __call__(self, x):
        return get_activation(self.fn)(x)
