"""Fused full-resolution tower stages as Pallas kernels.

Prefix timing of the flagship tower (TPU v5e, batch 256; see BASELINE.md)
shows the full-resolution endpoints dominate the rollout step: the entry
conv (6->32, dilation 2, 36x144) plus pool, and the tail
upsample -> conv(64->32, dilation 2) -> conv(32->4, 5x5) chain account for
~70% of the 2.6 ms model application, almost all of it HBM traffic on
full-resolution activations. These kernels fuse each chain so the
full-resolution intermediates never touch HBM:

- :func:`fused_conv_pool`: conv3x3(dilation d, zero-lat, cyclic-lon) +
  bias + tanh + maxpool2x2 -- writes the pooled (H/2, W/2) activation
  only. The pool commutes with the monotone tanh, so the kernel maxes the
  raw conv outputs and applies bias+tanh on the half-size result.
The upsample -> conv side of the tower needs no Pallas at all: nearest-x2
upsampling collapses a following conv onto the small grid algebraically
(:func:`dlwp_tpu.ops.conv.conv_after_upsample2`), so the full-resolution
intermediates vanish inside XLA.

The kernel operates per device (no halo exchange -- it is the single-chip
serving path; lat-sharded serving uses the halo kernels in
dlwp_tpu.parallel). Layout inside: (H, B, C, W2) column-parity planes;
row convs are (O, 3C) @ (3C, W2) MXU matmuls with pltpu.roll applied to
per-tap outputs (any W; strided lane slices and element-repeat do NOT
compile on TPU, which dictates the parity-plane formulation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel scratch is capped by the 16M scoped-vmem limit (see
# dlwp_tpu.parallel.pallas_overlap); batch-chunk below it.
_SCOPED_VMEM_BUDGET = 14 * 1024 * 1024


def _fetch3(x_vmem, par, b, h, dil, H):
    """Rows (h-dil, h, h+dil) of parity plane ``par``, sample b, as one
    (3C, W2) block, zero outside [0, H)."""
    parts = []
    for off in (-dil, 0, dil):
        hh = h + off
        valid = (hh >= 0) & (hh < H)
        row = x_vmem[par, jnp.clip(hh, 0, H - 1), b]
        parts.append(jnp.where(valid, row, 0.0))
    return jnp.concatenate(parts, axis=0)


def _conv_pool_kernel(x_hbm, k_ref, b_ref, y_ref, x_vmem, sem, *, dil):
    """x (2, H, B, C, W/2) HBM column-parity planes ->
    y (H/2, B, O, W/2) VMEM out.

    Longitude pooling needs no lane compaction (strided lane slices do not
    compile on TPU): conv output column 2u+p only touches input columns of
    parity (p + dx*dil) % 2 at small offset floor((p + dx*dil)/2), so each
    output parity is computed directly at half width from the parity
    planes, and the 2x2 max pool is an elementwise max over the two column
    parities and the two stencil rows.
    """
    _, H, B, C, W2 = x_hbm.shape
    stage = pltpu.make_async_copy(x_hbm, x_vmem, sem)
    stage.start()
    kmats = k_ref[:]
    bias = b_ref[:]
    stage.wait()

    taps = []  # per output parity: list of (kmat index, in parity, shift)
    for p in (0, 1):
        taps.append([
            (i, (p + dx * dil) % 2, (p + dx * dil) // 2)
            for i, dx in enumerate((-1, 0, 1))
        ])

    def conv_row(b, h):
        """max over output-column parities of the conv at full row h."""
        rows = [
            _fetch3(x_vmem, 0, b, h, dil, H),
            _fetch3(x_vmem, 1, b, h, dil, H),
        ]
        out = None
        for p in (0, 1):
            acc = None
            for i, par, shift in taps[p]:
                m = lax.dot_general(
                    kmats[i], rows[par], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if shift:
                    m = pltpu.roll(m, (-shift) % W2, axis=1)
                acc = m if acc is None else acc + m
            out = acc if out is None else jnp.maximum(out, acc)
        return out

    def body(i, _):
        b = i // (H // 2)
        hp = i % (H // 2)
        pooled = jnp.maximum(conv_row(b, 2 * hp), conv_row(b, 2 * hp + 1))
        y_ref[hp, b] = jnp.tanh(pooled + bias)
        return 0

    lax.fori_loop(0, B * (H // 2), body, 0)


def _kmats(kernel):
    """(O, C, 3, kw) -> (kw, O, 3C), columns ordered [dy, c]."""
    O, C, kh, kw = kernel.shape
    return jnp.transpose(
        jnp.transpose(kernel, (3, 2, 1, 0)).reshape(kw, kh * C, O), (0, 2, 1)
    )


def _chunk(fn, x, budget_per_sample):
    B = x.shape[0]
    max_b = max(1, _SCOPED_VMEM_BUDGET // max(budget_per_sample, 1))
    if B <= max_b:
        return fn(x)
    n_chunks = -(-B // max_b)
    size = -(-B // n_chunks)
    return jnp.concatenate(
        [fn(x[i : i + size]) for i in range(0, B, size)], axis=0
    )


def fused_conv_pool(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    dilation: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """tanh(cyclic_conv2d(x, kernel, dil) + bias) -> maxpool 2x2, fused.

    x: (B, C, H, W) with H, W even; kernel (O, C, 3, 3).
    Returns (B, O, H/2, W/2). Equivalent to the unfused
    ``max_pool2d(tanh(cyclic_conv2d(...) + bias))`` to fp32 accuracy.
    """
    B, C, H, W = x.shape
    O = kernel.shape[0]
    assert kernel.shape[-2:] == (3, 3) and H % 2 == 0 and W % 2 == 0
    bias = jnp.zeros((O,), jnp.float32) if bias is None else bias

    def run(xc):
        Bc = xc.shape[0]
        xt = jnp.transpose(xc, (2, 0, 1, 3)).astype(jnp.float32)
        planes = jnp.stack([xt[..., 0::2], xt[..., 1::2]])  # XLA-side split
        yt = pl.pallas_call(
            partial(_conv_pool_kernel, dil=dilation),
            out_shape=jax.ShapeDtypeStruct(
                (H // 2, Bc, O, W // 2), jnp.float32
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, H, Bc, C, W // 2), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(planes, _kmats(kernel).astype(jnp.float32),
          bias.astype(jnp.float32)[:, None])
        return jnp.transpose(yt, (1, 2, 0, 3))

    # Scoped-vmem accounting (per sample, fp32, tile-padded): the staged
    # parity planes (2, H, c_pad, w2_pad) AND the kernel's VMEM output
    # (H/2, o_pad, w2_pad) both draw on the 16M scoped space.
    w2_pad = -(-(W // 2) // 128) * 128
    c_pad = -(-C // 8) * 8
    o_pad = -(-O // 8) * 8
    per_sample = (2 * H * c_pad + (H // 2) * o_pad) * w2_pad * 4
    return _chunk(run, x, per_sample)
