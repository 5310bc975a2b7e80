"""Stage-bound accounting for the canonical ConvLSTM flagship (v5e).

Round-4 verdict item 5: either show ~88 Mgp/s fp32 is >=90% of this
architecture's ceiling, or find the next lever. This probe produces the
bound table: per-stage measured time (in-graph scan, dispatch-floor-free)
vs the per-stage speed-of-light floor max(HBM-byte time, MXU-FLOP time),
plus an lstm_features sensitivity sweep locating the MXU shape knee.

Per-stage floors use v5e nominals: 819 GB/s HBM, and 197 TF/s MXU for
the conv FLOPs — model convs run at DEFAULT matmul precision, i.e. bf16
passes (BASELINE.md round 4 'Entry-stage' note; the round-2 roofline
measured the tower at ~90 TF/s effective, above fp32 peak, confirming
the bf16 path). Floors count the MINIMAL HBM traffic: each stage reads its inputs once and
writes its outputs once; in-stage intermediates are assumed fused. That
makes the floor generous (real convs re-fetch halos, XLA materializes
some intermediates), so "measured within ~2x of floor" is strong evidence
of bandwidth-boundness at these shapes.

Reference anchor: examples/train.py:142-157 (the canonical configuration
whose throughput this bounds).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.models.layers import ConvLSTM2D
from dlwp_tpu.ops.conv import cyclic_conv2d
from __graft_entry__ import _flagship, _tower_specs

B, T, C, H, W = 64, 2, 3, 36, 144
F = 12  # lstm features (canonical: 4 * (C + 1) / 4)
HBM_GBS = 819.0  # v5e nominal
MXU_TFS = 197.0  # v5e bf16 peak (default-precision conv dots)


def timed(fn, *args, steps=30, repeats=3):
    def body(c, _):
        y = fn(*(a * c if i == 0 else a for i, a in enumerate(args)))
        return 1.0 + 0.0 * jax.tree.leaves(y)[0].ravel()[0], ()

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
    """Traffic-faithful per-stage timing (round-5 fix): fresh pre-stacked
    inputs each step, outputs stacked by the scan — per-step HBM traffic
    is exactly the stage's own bytes. The original carry-scaled harness
    (``timed``) materializes a full copy of the first operand every step,
    which for the gate stages added ~2x their own traffic and inflated
    the measured/floor ratio (see perf_gate_anatomy.py)."""
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


def mb(ch, h, w, batch=B):
    return batch * ch * h * w * 4 / 1e6


def conv_gflop(cin, cout, k, h, w, batch=B):
    return 2.0 * batch * h * w * cin * k * k * cout / 1e9


def floor_us(read_mb, write_mb, gflop):
    byte_us = (read_mb + write_mb) / HBM_GBS * 1e3
    flop_us = gflop / MXU_TFS * 1e3
    return byte_us, flop_us, max(byte_us, flop_us)


def main():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    model, params, _ = _flagship()
    x5 = jnp.asarray(rng.randn(B, T, C, H, W), jnp.float32)

    t_full = timed(lambda a: model.apply(params, a), x5)
    print(f"full flagship apply: {t_full*1e6:8.1f} us "
          f"({B*H*W/t_full/1e6:.1f} Mgp/s)", flush=True)

    # ---- stage list: (label, fn or None, read_mb, write_mb, gflop)
    stages = []

    # 1. batched input conv: read x (T*C ch), write zx (T*4F ch)
    Wx = jnp.asarray(rng.randn(4 * F, C, 3, 3) * 0.1, jnp.float32)
    Wh = jnp.asarray(rng.randn(4 * F, F, 3, 3) * 0.1, jnp.float32)

    def zx_conv(a):
        return cyclic_conv2d(a.reshape(B * T, C, H, W), Wx, dilation=(2, 2))

    stages.append((
        "zx conv (BT batched, 3->48)", zx_conv, (x5,),
        mb(T * C, H, W), mb(T * 4 * F, H, W),
        T * conv_gflop(C, 4 * F, 3, H, W),
    ))

    # 2. first-step gates: read z0 (48ch), write h1+c1 (24ch)
    z0 = jnp.asarray(rng.randn(B, 4 * F, H, W), jnp.float32)

    def gates1(z):
        i, f, g, o = jnp.split(z, 4, axis=-3)
        c1 = jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c1), c1

    stages.append((
        "step-1 gates (48 -> h1,c1)", gates1, (z0,),
        mb(4 * F, H, W), mb(2 * F, H, W), 0.0,
    ))

    # 3. step-2 recurrent conv + gates, fused accounting:
    #    read h1 (12) + zx1 (48) + c1 (12), write h2+c2 (24)
    h1 = jnp.asarray(rng.randn(B, F, H, W), jnp.float32)
    c1v = jnp.asarray(rng.randn(B, F, H, W), jnp.float32)

    def step2(h, zx, c):
        z = zx + cyclic_conv2d(h, Wh)
        i, f, g, o = jnp.split(z, 4, axis=-3)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c2), c2

    stages.append((
        "step-2 h-conv+gates (fused acct)", step2, (h1, z0, c1v),
        mb(F + 4 * F + F, H, W), mb(2 * F, H, W),
        conv_gflop(F, 4 * F, 3, H, W),
    ))

    # 4. tower stages (fused conv[+pool/upsample] accounting). Channel/
    #    resolution ladder of _tower_specs on the (T*F)-ch stacked input.
    tower = build_sequential(_tower_specs(T * 2))
    xt = jnp.asarray(rng.randn(B, T * F, H, W), jnp.float32)
    pt = tower.init(key, xt)
    t_tower = timed_stream(lambda a: tower.apply(pt, a), xt)
    tower_ladder = [
        # (cin, cout, k, h_in, w_in, h_out, w_out) conv at in-res, out
        # possibly pooled (write at out-res)
        (T * F, 32, 3, H, W, H // 2, W // 2),      # conv d2 + pool
        (32, 64, 3, H // 2, W // 2, H // 4, W // 4),  # conv + pool
        (64, 128, 3, H // 4, W // 4, H // 2, W // 2),  # conv + upsample
        (128, 64, 3, H // 2, W // 2, H, W),        # conv + upsample
        (64, 32, 3, H, W, H, W),                   # conv d2
        (32, T * 2, 5, H, W, H, W),                # 5x5 head
    ]
    tow_read = sum(mb(ci, hi, wi) for ci, _, _, hi, wi, _, _ in tower_ladder)
    tow_write = sum(mb(co, ho, wo) for _, co, _, _, _, ho, wo in tower_ladder)
    tow_gflop = sum(
        conv_gflop(ci, co, k, hi, wi)
        for ci, co, k, hi, wi, _, _ in tower_ladder
    )
    stages.append((
        "tower (24ch in, 6 convs)", None, None,
        tow_read, tow_write, tow_gflop,
    ))

    # 5. final reshape/copy: write (B, T, 2, H, W) output
    stages.append((
        "output emit", None, None, 0.0, mb(T * 2, H, W), 0.0,
    ))

    print("\nNOTE: the 'meas' column is the streaming harness and is NOT "
          "trustworthy per-stage truth (it measured 3.3x the full apply "
          "in round 5 — see perf_gate_anatomy.py for how every "
          "microbenchmark harness here measured itself). The analytic "
          "floors and the full-apply row above are the usable data.")
    print(f"\n{'stage':36} {'meas us':>8} {'byteF us':>9} "
          f"{'flopF us':>9} {'bound us':>9} {'x-over':>7}")
    total_bound = 0.0
    total_meas = 0.0
    for label, fn, args, rmb, wmb, gf in stages:
        byte_us, flop_us, bound = floor_us(rmb, wmb, gf)
        total_bound += bound
        if fn is not None:
            t = timed_stream(fn, *args) * 1e6
        elif label.startswith("tower"):
            t = t_tower * 1e6
        else:
            t = float("nan")
        if np.isfinite(t):
            total_meas += t
        print(f"{label:36} {t:8.1f} {byte_us:9.1f} {flop_us:9.1f} "
              f"{bound:9.1f} {t/bound:7.2f}")
    full_us = t_full * 1e6
    print(f"\nsum of stage bounds: {total_bound:.1f} us "
          f"-> ceiling {B*H*W/total_bound:.1f} Mgp/s")
    print(f"sum of stage measurements: {total_meas:.1f} us "
          f"(full in-model: {full_us:.1f} us; overlap/fusion gap "
          f"{total_meas - full_us:+.1f})")
    print(f"full apply vs summed bound: {full_us/total_bound:.2f}x "
          f"speed-of-light fraction {total_bound/full_us*100:.0f}%")

    # ---- lstm_features sensitivity: where is the MXU shape knee?
    # Forward-only apply of the F=48 variant hard-faults the v5e worker
    # (the known forward-only pathology, docs/DEPLOY.md) — and so does
    # compile_forward_safe's input-grad form (measured round 5: the
    # fault-class boundary is narrower than 'any backward pass'; the
    # known-good program shape is the TRAIN step, gradients w.r.t. the
    # PARAMETERS). The sweep therefore times a params-grad step — the
    # number that matters for locating the MXU shape knee in training.
    print("\nlstm_features sensitivity (params-grad step — the "
          "train-step program class; F>=48 hard-faults the v5e worker "
          "in EVERY program form tried through this timing harness "
          "(forward, input-grad, params-grad), so the sweep stops at "
          "24 — the knee above that is unmeasurable over this tunnel):",
          flush=True)
    for feat in (12, 24):
        specs = [
            ("ConvLSTM2D", (feat, 3),
             {"dilation": 2, "return_sequences": True, "activation": "tanh"}),
            ("Reshape", ((T * feat, H, W),), None),
            *_tower_specs(T * 2),
            ("Reshape", ((T, 2, H, W),), None),
        ]
        m = build_sequential(specs)
        xs = jnp.asarray(rng.randn(B, T, C, H, W), jnp.float32)
        ps = m.init(jax.random.PRNGKey(1), xs)

        def grad_step(a, _ps=ps, _m=m):
            def loss(p):
                return jnp.mean(_m.apply(p, a) ** 2)

            gs = jax.grad(loss)(_ps)
            return jax.tree.leaves(gs)[0]

        t = timed(grad_step, xs)
        print(f"  F={feat:3d}: {t*1e6:8.1f} us/apply "
              f"({B*H*W/t/1e6:6.1f} Mgp/s)", flush=True)


if __name__ == "__main__":
    main()
