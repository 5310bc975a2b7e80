"""Entry-stage experiments, round 2: refine the grouped-conv winner.

perf_entry.py found changroup (parity planes stacked on channels, one
feature_group_count=4 conv) at 551 us vs 871 full / 1400 parity4.
Here: bf16 variants, and a strided-conv formulation that avoids the
parity-gather copy (each pooling candidate = stride-2 conv at offset).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.ops.conv import cyclic_conv2d
from dlwp_tpu.ops.padding import pad_latlon
from dlwp_tpu.ops.pooling import max_pool2d

B, C, H, W = 256, 6, 36, 144
O = 32


def stage_full(x, k, b):
    y = cyclic_conv2d(x, k, dilation=(2, 2))
    return max_pool2d(jnp.tanh(y + b[:, None, None]), (2, 2))


def _chanstack(x):
    Bx = x.shape[0]
    v = x.reshape(Bx, C, H // 2, 2, W // 2, 2)
    v = jnp.transpose(v, (0, 3, 5, 1, 2, 4))
    return v.reshape(Bx, 4 * C, H // 2, W // 2)


def stage_changroup(x, k, b):
    xs = _chanstack(x)
    xp = pad_latlon(xs, (1, 1), (1, 1))
    kg = jnp.tile(k, (4, 1, 1, 1))
    o = lax.conv_general_dilated(
        xp, kg, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=4,
    )
    m = jnp.max(o.reshape(B, 4, O, H // 2, W // 2), axis=1)
    return jnp.tanh(m + b[:, None, None])


def stage_stride4(x, k, b):
    # Pooling candidate (a, c) = stride-2 conv of the d2-padded input with
    # start offset (a, c); no parity-gather copy of x is materialized.
    xp = pad_latlon(x, (2, 2), (2, 2))
    m = None
    for a in (0, 1):
        for c in (0, 1):
            o = lax.conv_general_dilated(
                xp[..., a:, c:], k, (2, 2), "VALID",
                rhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            o = o[..., : H // 2, : W // 2]
            m = o if m is None else jnp.maximum(m, o)
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
        ("changroup", stage_changroup),
        ("changroup_bf16", bf16(stage_changroup)),
        ("stride4", stage_stride4),
        ("stride4_bf16", bf16(stage_stride4)),
        ("full_bf16", bf16(stage_full)),
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
