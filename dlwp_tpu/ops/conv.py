"""Convolution primitives with spherical boundary treatment.

- :func:`cyclic_conv2d` -- conv2d with periodic longitude (and configurable
  latitude) boundaries: the fused equivalent of the reference's
  ``PeriodicPadding2D -> ZeroPadding2D -> Conv2D(padding='valid')`` stack
  (examples/train.py:152-158). XLA fuses the wrap-pad into the convolution's
  input fetch, so no extra HBM copy materializes on TPU.

- :func:`row_conv2d` -- latitude-dependent convolution: weights shared along
  rows only (a per-latitude filter bank). The reference implements this as a
  Python loop of per-row-slab ``K.conv2d`` calls concatenated
  (``RowConnected2D``/``row_conv2d``, custom.py:695-896); here it is a single
  patch-extraction + batched einsum, which XLA maps onto one big MXU
  contraction batched over latitude -- no loop, no concat.

Logical data format is NCHW (channels-first, matching the reference's CFS
convention); weights are OIHW. XLA re-layouts for TPU internally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.ops.padding import pad_latlon


def cyclic_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    strides: tuple[int, int] = (1, 1),
    lat_mode: str = "zero",
    dilation: tuple[int, int] = (1, 1),
    precision=None,
) -> jax.Array:
    """2-D convolution, periodic in longitude.

    Args:
        x: (..., C_in, H, W) input (any number of leading batch dims).
        kernel: (C_out, C_in, kh, kw) filters.
        strides: spatial strides.
        lat_mode: latitude boundary treatment: 'zero' (reference's
            ZeroPadding2D), 'edge' (FillPadding2D), 'reflect', 'symmetric'.
        dilation: kernel dilation.

    Returns:
        (..., C_out, H', W') with W' = W/stride (longitude size preserved for
        stride 1 -- "same" behavior via wrap), H' per lat padding.
    """
    kh, kw = kernel.shape[-2], kernel.shape[-1]
    eh = (kh - 1) * dilation[0]
    ew = (kw - 1) * dilation[1]
    pad_t, pad_b = eh // 2, eh - eh // 2
    pad_l, pad_r = ew // 2, ew - ew // 2
    x = pad_latlon(x, (pad_t, pad_b), (pad_l, pad_r), lat_mode=lat_mode)

    batch_shape = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    out = lax.conv_general_dilated(
        x4,
        kernel,
        window_strides=strides,
        padding="VALID",
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    return out.reshape(batch_shape + out.shape[1:])


def cyclic_conv2d_edgefix(
    x: jax.Array,
    kernel: jax.Array,
    dilation: tuple[int, int] = (1, 1),
    precision=None,
) -> jax.Array:
    """cyclic_conv2d (zero-lat boundary, stride 1) without materializing the
    wrap-padded input.

    The wrap pad in :func:`cyclic_conv2d` concatenates edge columns, which
    materializes a full padded copy of the activation in HBM per layer. This
    variant runs the main conv with explicit zero padding (no copy: XLA
    folds zero padding into the conv window config), then *recomputes* only
    the ``ew/2`` wrap-affected edge columns from slim wrapped slices and
    patches them in with dynamic_update_slice (in-place on TPU).

    Numerically identical to ``cyclic_conv2d(x, k, lat_mode='zero')``.

    Measured on TPU v5e (flagship rollout, batch 256): 370 Mgp/s vs 517 for
    the pad formulation -- XLA already streams the wrap-pad into the conv
    efficiently, and the two extra slim convs per layer cost more than the
    avoided copy. Kept as an option for very wide grids where the padded
    copy dominates; the default layer impl is 'pad'.
    """
    kh, kw = kernel.shape[-2], kernel.shape[-1]
    eh = (kh - 1) * dilation[0]
    ew = (kw - 1) * dilation[1]
    pt, pb = eh // 2, eh - eh // 2
    pl, pr = ew // 2, ew - ew // 2

    batch_shape = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    W = x4.shape[-1]
    conv = partial(
        lax.conv_general_dilated,
        window_strides=(1, 1),
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    y = conv(x4, kernel, padding=((pt, pb), (pl, pr)))
    if ew:
        if pl:
            xl = jnp.concatenate([x4[..., W - pl :], x4[..., : pl + pr]], -1)
            yl = conv(xl, kernel, padding=((pt, pb), (0, 0)))
            y = lax.dynamic_update_slice_in_dim(y, yl, 0, axis=-1)
        if pr:
            xr = jnp.concatenate([x4[..., W - pr - pl :], x4[..., :pr]], -1)
            yr = conv(xr, kernel, padding=((pt, pb), (0, 0)))
            y = lax.dynamic_update_slice_in_dim(y, yr, W - pr, axis=-1)
    return y.reshape(batch_shape + y.shape[1:])


# Width threshold for the entry conv+pool formulation choice: the
# four-separate-conv parity form wins at the canonical 144 (strided
# slices fuse into conv input fetches) while the grouped channel-stacked
# form wins at 720 (362 vs 152 Mgp/s; see BASELINE.md). The dense
# upsample collapse below wins at ALL widths and carries no gate.
_PARITY_MAX_W = 512


# Default implementation for the dilation-1 branch of
# :func:`conv_after_upsample2`. 'lhsdil' (one lhs-dilated XLA conv, no
# interleave pass) vs 'parity4' (4*O-channel small-grid conv + explicit
# interleave). Measured on TPU v5e round 5 (BASELINE.md): lhsdil +2.6%
# full-model at the 2.5° flagship (output W=144 pads 144->256 lanes, a
# 1.78x tax the interleave copies pay) but -3.9% at the 0.5° tower
# (W=720 pads only to 768, and lhsdil's zero-stuffed windows cost more
# than the now-cheap interleave). 'auto' picks by the output lane
# padding ratio; override per call or pin here.
UPSAMPLE2_IMPL = "auto"


def _upsample2_auto_impl(w_out: int) -> str:
    pad_ratio = (-w_out % 128 + w_out) / w_out
    return "lhsdil" if pad_ratio >= 1.25 else "parity4"


def conv_after_upsample2(
    a: jax.Array,
    kernel: jax.Array,
    dilation: tuple[int, int] = (1, 1),
    precision=None,
    impl: str | None = None,
) -> jax.Array:
    """``cyclic_conv2d(upsample2d(a, 2), kernel, dilation)`` without ever
    materializing the upsampled grid.

    Nearest-neighbor 2x upsampling makes adjacent rows/columns equal, so a
    following conv collapses onto the small grid:

    - dilation 2: the dilated taps always land on duplicated cells --
      ``conv(up(a), k, dil=2) == up(conv(a, k, dil=1))`` exactly;
    - dilation 1: output parity (row, col) selects which input taps share a
      small-grid cell -- the conv decomposes into four small-grid 3x3 convs
      with parity-combined kernels (tap a of the k x k kernel folds into
      small tap floor((p + a)/2) for parity p), interleaved at the end.

    Measured on the flagship tail (TPU v5e, batch 256; BASELINE.md): the
    upsample -> conv chains cost ~1.3 ms of the 2.6 ms step unfused; this
    rewrite removes the full-resolution intermediates entirely.

    ``kernel`` is (O, C, kh, kw) with odd kh = kw <= 5; zero latitude
    boundary, stride 1 (the tower configuration, train.py:159-218).
    """
    O, C, kh, kw = kernel.shape
    dil = tuple(dilation) if not isinstance(dilation, int) else (dilation,) * 2
    if dil == (2, 2):
        from dlwp_tpu.ops.pooling import upsample2d

        return upsample2d(
            cyclic_conv2d(a, kernel, precision=precision), (2, 2)
        )
    if dil != (1, 1) or kh != kw or kh % 2 == 0 or kh > 5:
        from dlwp_tpu.ops.pooling import upsample2d

        return cyclic_conv2d(
            upsample2d(a, (2, 2)), kernel, dilation=dil, precision=precision
        )
    chosen = impl or UPSAMPLE2_IMPL
    if chosen == "auto":
        chosen = _upsample2_auto_impl(2 * a.shape[-1])
    if chosen == "lhsdil":
        # One lhs-dilated conv: nearest-x2 upsample == zero-stuffing
        # convolved with ones(2,2), so conv(up(a), K) == conv_lhsdil2(a,
        # K (*) ones(2,2)) — XLA lowers the strided scatter inside the
        # conv window computation and the explicit interleave pass of the
        # parity4 form (two ~250 us layout copies per stage on the
        # flagship tail, HLO round 5) disappears. Equivalence: 1e-6 vs
        # parity4 (tests/test_ops.py).
        O_, C_ = kernel.shape[0], kernel.shape[1]
        ones = jnp.ones((1, 1, 2, 2), kernel.dtype)
        kp = lax.conv_general_dilated(
            kernel.reshape(O_ * C_, 1, kh, kw), ones, (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).reshape(O_, C_, kh + 1, kw + 1)
        p = (kh + 1) // 2
        wrapn = (p + 1) // 2  # source cols so virtual reads stay in range
        xw = jnp.concatenate([a[..., -wrapn:], a, a[..., :wrapn]], axis=-1)
        batch_shape = xw.shape[:-3]
        x4 = xw.reshape((-1,) + xw.shape[-3:])
        y = lax.conv_general_dilated(
            x4, kp, (1, 1), ((p, p), (p, p)), lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision,
        )
        y = y.reshape(batch_shape + y.shape[1:])
        return y[..., 2 * wrapn:-(2 * wrapn)]
    c = (kh - 1) // 2
    # Parity-combined 3x3 kernels: K_small[p][j] = sum of K[a] over taps a
    # with floor((p + a)/2) == j (independently per axis). All four parity
    # outputs read the SAME small-grid input, so they run as ONE dense conv
    # to 4*O channels (4x the MXU tile fill of four separate convs; the
    # separate-conv form measured 1400 vs 526 us on the analogous entry
    # stage, BASELINE.md round 2+).
    ks_all = jnp.zeros((4, O, C, 3, 3), kernel.dtype)
    for pr in (0, 1):
        for pc in (0, 1):
            for ay in range(-c, c + 1):
                jy = (pr + ay) // 2  # python floor division
                for ax in range(-c, c + 1):
                    jx = (pc + ax) // 2
                    ks_all = ks_all.at[2 * pr + pc, :, :, jy + 1, jx + 1].add(
                        kernel[:, :, ay + c, ax + c]
                    )
    out = cyclic_conv2d(
        a, ks_all.reshape(4 * O, C, 3, 3), precision=precision
    )
    # Interleave: y[..., o, 2r+pr, 2u+pc] = out[..., (2pr+pc)*O + o, r, u].
    H, W = a.shape[-2], a.shape[-1]
    lead = out.shape[:-3]
    v = out.reshape(lead + (2, 2, O, H, W))
    # (..., pr, pc, o, r, u) -> (..., o, r, pr, u, pc)
    nd = v.ndim
    v = jnp.moveaxis(jnp.moveaxis(v, nd - 5, nd - 2), nd - 5, nd - 1)
    return v.reshape(lead + (O, 2 * H, 2 * W))


def conv_pool2_even_dilation(
    x: jax.Array,
    kernel: jax.Array,
    dilation: tuple[int, int] = (2, 2),
    precision=None,
    form: str = "group",
) -> jax.Array:
    """``max_pool2d(cyclic_conv2d(x, kernel, dilation), 2)`` for EVEN
    dilations, computed on quarter-resolution parity planes.

    Even dilation decouples row/column parities: the conv output at
    (2r+a, 2u+b) reads only inputs of parity (a, b), so the 2x2 max pool
    is an elementwise max over four quarter-grid convs that never
    materialize the full-resolution activation. The four planes are
    stacked on CHANNELS and run as one conv in one of two forms:

    - ``form='group'``: a ``feature_group_count=4`` grouped conv --
      measured 526 us vs 871 (unfused) vs 1400 (four separate convs) for
      the flagship entry stage on v5e (BASELINE.md round 2+).
    - ``form='dense'``: ONE dense conv 4C -> 4O with a block-diagonal
      kernel. 4x the nominal FLOPs, but the MXU pays per occupied tile:
      at the flagship entry shapes the grouped form runs four
      (K=54, N=32) contractions (one K/N tile pair each, ~10.5%
      occupancy) while the dense form runs one (K=216, N=128)
      contraction (2 K-tiles x 1 N-tile at ~84%/100% fill) -- half the
      tile passes for the same quarter-grid M.

    Note the max is over RAW conv outputs: callers adding a bias and a
    monotone activation afterwards get exactly
    ``pool(act(conv + bias))`` (max commutes with nondecreasing maps).

    x: (..., C, H, W) with even H, W; kernel (O, C, kh, kw).
    Returns (..., O, H/2, W/2).
    """
    O, C, kh, kw = kernel.shape
    half_dil = (dilation[0] // 2, dilation[1] // 2)
    lead = x.shape[:-3]
    H, W = x.shape[-2], x.shape[-1]
    v = x.reshape(lead + (C, H // 2, 2, W // 2, 2))
    nd = v.ndim
    # (..., C, h, a, w, b) -> (..., a, b, C, h, w)
    v = jnp.moveaxis(jnp.moveaxis(v, nd - 3, nd - 5), nd - 1, nd - 4)
    xs = v.reshape(lead + (4 * C, H // 2, W // 2))
    eh = (kh - 1) * half_dil[0]
    ew = (kw - 1) * half_dil[1]
    xp = pad_latlon(xs, (eh // 2, eh - eh // 2), (ew // 2, ew - ew // 2))
    x4 = xp.reshape((-1,) + xp.shape[-3:])
    if form == "dense":
        kb = jnp.zeros((4 * O, 4 * C, kh, kw), kernel.dtype)
        for p in range(4):
            kb = kb.at[p * O : (p + 1) * O, p * C : (p + 1) * C].set(kernel)
        o = lax.conv_general_dilated(
            x4, kb, (1, 1), "VALID",
            rhs_dilation=half_dil,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=precision,
        )
    else:
        o = lax.conv_general_dilated(
            x4, jnp.tile(kernel, (4, 1, 1, 1)), (1, 1), "VALID",
            rhs_dilation=half_dil,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=4,
            precision=precision,
        )
    o = o.reshape(lead + (4, O) + o.shape[-2:])
    return jnp.max(o, axis=len(lead))


def row_conv2d(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    lat_mode: str = "zero",
    lon_periodic: bool = True,
) -> jax.Array:
    """Latitude-dependent (row-local) convolution.

    Semantics of the reference's ``RowConnected2D`` (custom.py:695-838):
    each output latitude row has its own (kh, kw, C_in, C_out) filter;
    weights are shared only along longitude. Stride 1, 'same' spatial size.

    Args:
        x: (..., C_in, H, W).
        weights: (H, C_out, C_in, kh, kw) per-row filter bank.
        bias: optional (H, C_out) per-row bias (the reference uses one bias
            per output row when use_bias=True, custom.py:800-812).
        lat_mode: latitude boundary ('zero' etc.).
        lon_periodic: wrap longitude (True matches spherical geometry).

    Returns:
        (..., C_out, H, W).

    Implementation: extract kh*kw shifted views (static slices), stack into a
    patch tensor (..., C_in*kh*kw, H, W), then contract with the per-row bank
    via einsum 'hoi,...ihw->...ohw' -- one MXU-batched contraction over H.
    """
    H, C_out, C_in, kh, kw = weights.shape
    assert x.shape[-2] == H, f"input H {x.shape[-2]} != weight rows {H}"
    assert x.shape[-3] == C_in

    pad_t, pad_b = (kh - 1) // 2, (kh - 1) - (kh - 1) // 2
    pad_l, pad_r = (kw - 1) // 2, (kw - 1) - (kw - 1) // 2
    if lon_periodic:
        xp = pad_latlon(x, (pad_t, pad_b), (pad_l, pad_r), lat_mode=lat_mode)
    else:
        from dlwp_tpu.ops.padding import pad_constant

        xp = pad_constant(x, ((pad_t, pad_b), (pad_l, pad_r)))

    W = x.shape[-1]
    #

    patches = [
        lax.slice_in_dim(lax.slice_in_dim(xp, i, i + H, axis=-2), j, j + W, axis=-1)
        for i in range(kh)
        for j in range(kw)
    ]
    # (..., kh*kw, C_in, H, W) -> contract (kh*kw, C_in) against the bank.
    p = jnp.stack(patches, axis=-4)
    wflat = weights.transpose(0, 1, 3, 4, 2).reshape(H, C_out, kh * kw, C_in)
    out = jnp.einsum("hoki,...kihw->...ohw", wflat, p)
    if bias is not None:
        out = out + bias.T[..., :, :, None]  # (C_out, H) -> broadcast over W
    return out
