"""Decompose the ConvLSTM gate-stage inefficiency (round 5).

perf_convlstm_bound.py measured the step-1 gate stage at 8.6x its HBM
byte floor (1003 us vs 117 us at B=64, 48ch, 36x144 fp32). Three
candidate causes, each isolated here on the same shapes:

1. tile padding — (H, W) = (36, 144) occupies (40, 256) in the (8, 128)
   fp32 tiling, a 1.97x memory/VPU-lane waste. Variant: identical gate
   math on a pre-flattened (B, 48, H*W) operand (5184 -> 5248 lanes,
   1.2% waste). No reshape inside the timed region — this bounds the
   win, the production path would have to pay retiling or use pallas.
2. transcendentals — tanh on the VPU. Variant: same dataflow with
   identity activations (pure mul/clip chain) vs tanh.
3. dtype — bf16 halves both bytes and VPU element slots.

Cross: {native, flat} x {tanh, identity} x {f32, bf16} + the pallas
fused kernel (ops/lstm_gates.py) on native shapes.

Reference anchor: examples/train.py:142-157 (canonical ConvLSTM whose
gate chain this dissects).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, F, H, W = 64, 12, 36, 144


def timed(fn, *args, steps=30, repeats=3):
    """In-scan timing with a carry data-dependence on the first arg.

    CAUTION (measured, round 5): the ``a * c`` dependence materializes a
    full copy of the first operand every step — for stages whose input
    is large relative to their compute this DOMINATES (step-1 gates: the
    48-ch z copy adds ~2x the stage's own traffic, padded). Use
    :func:`timed_stream` for per-stage traffic-faithful numbers; this
    form is kept to quantify the harness artifact itself.
    """
    def body(c, _):
        y = fn(*(a * c if i == 0 else a for i, a in enumerate(args)))
        return 1.0 + 0.0 * jax.tree.leaves(y)[0].ravel()[0].astype(
            jnp.float32), ()

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


def timed_stream(fn, *args, steps=10, repeats=3):
    """Streaming in-scan timing: every step reads a FRESH pre-stacked
    copy of each input and writes its full output into the scan's
    stacked ys — per-step HBM traffic is exactly the stage's own
    read+write bytes, no artificial copies, and XLA cannot hoist or
    dead-code the op. Memory: (steps+1) x (inputs+outputs); keep steps
    modest for multi-GB operands."""
    xs = tuple(jnp.stack([a] * steps) for a in args)

    def body(_, xa):
        return (), fn(*xa)

    @jax.jit
    def loop(*xs_):
        _, ys = lax.scan(body, (), xs_)
        return jax.tree.leaves(ys)[0].ravel()[0]

    jax.block_until_ready(loop(*xs))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*xs))
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps


def main():
    rng = np.random.RandomState(0)
    hard_sig = lambda x: jnp.clip(0.2 * x + 0.5, 0.0, 1.0)

    def gates(z, act):
        i, f, g, o = jnp.split(z, 4, axis=-3)
        c1 = hard_sig(i) * act(g)
        return hard_sig(o) * act(c1), c1

    byte_floor_us = (B * 4 * F * H * W + 2 * B * F * H * W) * 4 / 819e3
    print(f"step-1 gates, B={B} 4F={4*F} {H}x{W}; "
          f"byte floor {byte_floor_us:.1f} us (unpadded)", flush=True)
    for shape, label in (
        ((B, 4 * F, H, W), "native (36,144)->(40,256) tiles"),
        ((B, 4 * F, H * W), "flat   (5184)->(5248) lanes   "),
    ):
        for dt, dl in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
            z = jnp.asarray(rng.randn(*shape), dt)
            for act, al in ((jnp.tanh, "tanh"), (lambda x: x, "ident")):
                t = timed(lambda a, _act=act: gates(a, _act), z) * 1e6
                ts = timed_stream(
                    lambda a, _act=act: gates(a, _act), z) * 1e6
                print(f"  {label} {dl} {al:5}: carry {t:7.1f} us "
                      f"({t/byte_floor_us:5.2f}x) | stream {ts:7.1f} us "
                      f"({ts/byte_floor_us:5.2f}x floor)", flush=True)

    # pallas fused kernel, native shapes (full step-2 form: zx+zh+c)
    from dlwp_tpu.ops.lstm_gates import fused_lstm_gates
    zx = jnp.asarray(rng.randn(B, 4 * F, H, W), jnp.float32)
    zh = jnp.asarray(rng.randn(B, 4 * F, H, W), jnp.float32)
    c = jnp.asarray(rng.randn(B, F, H, W), jnp.float32)

    def pk(a, b, cc):
        return fused_lstm_gates(a, b, cc, "tanh", "hard_sigmoid", None)

    def xk(a, b, cc):
        z = a + b
        i, f, g, o = jnp.split(z, 4, axis=-3)
        c2 = hard_sig(f) * cc + hard_sig(i) * jnp.tanh(g)
        return hard_sig(o) * jnp.tanh(c2), c2

    s2_floor = (2 * B * 4 * F * H * W + 3 * B * F * H * W) * 4 / 819e3
    for fn, label in ((xk, "step-2 XLA   "), (pk, "step-2 pallas")):
        t = timed(fn, zx, zh, c) * 1e6
        ts = timed_stream(fn, zx, zh, c) * 1e6
        print(f"  {label} f32 native: carry {t:7.1f} us ({t/s2_floor:5.2f}x)"
              f" | stream {ts:7.1f} us ({ts/s2_floor:5.2f}x of its "
              f"{s2_floor:.0f} us floor)", flush=True)


if __name__ == "__main__":
    main()
