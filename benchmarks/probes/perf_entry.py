"""Entry-stage (conv 6->32 d2 + maxpool) formulation experiments.

The flagship's remaining cost after the round-2 fusions is the entry
conv+pool (~870 us of 1630 us at batch 256; BASELINE.md round-2 roofline).
The current default runs it as four parity quarter-grid convs + max, whose
(M, 54) x (54, 32) contractions occupy ~10.5% of the 128x128 MXU tiles.
This script measures MXU-denser reformulations on the real chip:

- parity4      : current default (4 convs on (18, 72) subgrids, max)
- full         : unfused full-res conv d2 + reduce_window pool
- batchstack   : parities stacked on batch -> ONE conv (4B, 6, 18, 72)
- chandense    : parities stacked on channels -> one DENSE conv 24 -> 128
                 with block-diagonal weights (K = 216, N = 128 tiles; 4x
                 FLOPs at ~8x tile occupancy), then max over groups
- changroup    : same stacking, feature_group_count=4 grouped conv
- im2col       : chandense as explicit patches + one (M, 216)x(216, 128)
                 matmul (XLA matmul path instead of conv path)
- *_bf16       : winner variants with bf16 operands (same multiply
                 precision class as XLA's DEFAULT fp32 conv lowering)

All variants are equivalent to tanh(conv) -> pool to fp32 tolerance
(checked before timing).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.ops.conv import cyclic_conv2d
from dlwp_tpu.ops.pooling import max_pool2d

B, C, H, W = 256, 6, 36, 144
O = 32


def stage_full(x, k, b):
    y = cyclic_conv2d(x, k, dilation=(2, 2))
    return max_pool2d(jnp.tanh(y + b[:, None, None]), (2, 2))


def _parities(x):
    return [x[..., a::2, c::2] for a in (0, 1) for c in (0, 1)]


def stage_parity4(x, k, b):
    m = None
    for xp in _parities(x):
        o = cyclic_conv2d(xp, k)
        m = o if m is None else jnp.maximum(m, o)
    return jnp.tanh(m + b[:, None, None])


def stage_batchstack(x, k, b):
    xs = jnp.concatenate(_parities(x), axis=0)  # (4B, C, H/2, W/2)
    o = cyclic_conv2d(xs, k)
    m = jnp.max(o.reshape((4, B) + o.shape[1:]), axis=0)
    return jnp.tanh(m + b[:, None, None])


def _chanstack(x):
    # (B, C, H, W) -> (B, 4C, H/2, W/2), channel blocks = parity planes
    Bx = x.shape[0]
    v = x.reshape(Bx, C, H // 2, 2, W // 2, 2)
    v = jnp.transpose(v, (0, 3, 5, 1, 2, 4))  # (B, 2, 2, C, H/2, W/2)
    return v.reshape(Bx, 4 * C, H // 2, W // 2)


def _blockdiag_kernel(k):
    # (O, C, 3, 3) -> (4O, 4C, 3, 3) block diagonal
    kb = jnp.zeros((4 * O, 4 * C, 3, 3), k.dtype)
    for p in range(4):
        kb = kb.at[p * O : (p + 1) * O, p * C : (p + 1) * C].set(k)
    return kb


def stage_chandense(x, k, b):
    xs = _chanstack(x)
    kb = _blockdiag_kernel(k)
    o = cyclic_conv2d(xs, kb)  # (B, 4O, H/2, W/2)
    m = jnp.max(o.reshape(B, 4, O, H // 2, W // 2), axis=1)
    return jnp.tanh(m + b[:, None, None])


def stage_changroup(x, k, b):
    from dlwp_tpu.ops.padding import pad_latlon

    xs = _chanstack(x)
    xp = pad_latlon(xs, (1, 1), (1, 1))
    kg = jnp.tile(k, (4, 1, 1, 1))  # (4O, C, 3, 3)
    o = lax.conv_general_dilated(
        xp, kg, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=4,
    )
    m = jnp.max(o.reshape(B, 4, O, H // 2, W // 2), axis=1)
    return jnp.tanh(m + b[:, None, None])


def stage_im2col(x, k, b):
    from dlwp_tpu.ops.padding import pad_latlon

    xs = _chanstack(x)
    xp = pad_latlon(xs, (1, 1), (1, 1))
    pat = lax.conv_general_dilated_patches(
        xp, (3, 3), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (B, 4C*9, H/2, W/2)
    kb = _blockdiag_kernel(k)  # (4O, 4C, 3, 3)
    kmat = kb.reshape(4 * O, 4 * C * 9).T  # (216, 128); patches order = (c, kh, kw)
    pt = jnp.transpose(pat, (0, 2, 3, 1)).reshape(-1, 4 * C * 9)
    om = pt @ kmat  # (M, 128)
    o = jnp.transpose(
        om.reshape(B, H // 2, W // 2, 4 * O), (0, 3, 1, 2)
    )
    m = jnp.max(o.reshape(B, 4, O, H // 2, W // 2), axis=1)
    return jnp.tanh(m + b[:, None, None])


def bf16(stage):
    def run(x, k, b):
        return stage(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), b
        ).astype(jnp.float32)

    return run


def timed(stage, x, k, b, steps=100, repeats=3):
    def body(c, _):
        y = stage(x * c, k, b)
        return 1.0 + 0.0 * y[0, 0, 0, 0], ()

    @jax.jit
    def loop():
        c, _ = lax.scan(body, jnp.float32(1.0), None, length=steps)
        return c

    jax.block_until_ready(loop())
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop())
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, H, W), jnp.float32)
    k = jnp.asarray(rng.randn(O, C, 3, 3) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)

    ref = jax.jit(stage_full)(x, k, b)
    variants = [
        ("full", stage_full),
        ("parity4", stage_parity4),
        ("batchstack", stage_batchstack),
        ("chandense", stage_chandense),
        ("changroup", stage_changroup),
        ("im2col", stage_im2col),
        ("chandense_bf16", bf16(stage_chandense)),
        ("im2col_bf16", bf16(stage_im2col)),
    ]
    for name, fn in variants:
        out = jax.jit(fn)(x, k, b)
        err = float(jnp.max(jnp.abs(out - ref)))
        tol = 5e-2 if "bf16" in name else 1e-5
        ok = "OK " if err < tol else "BAD"
        t = timed(fn, x, k, b)
        print(f"{name:>16}: {t*1e6:8.1f} us/stage  maxerr={err:.2e} {ok}",
              flush=True)


if __name__ == "__main__":
    main()
