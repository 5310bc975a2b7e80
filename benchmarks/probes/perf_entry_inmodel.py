"""In-model entry-stage formulation table incl. 'chandense' (VERDICT
round-2 item 6).

The flagship's entry conv+pool is ~60% of the application. Round 2+
measured parity4/unfused/group IN-MODEL (stage-level timings invert in
context); the dense block-diagonal 4C->4O form ('chandense',
ops/conv.py:conv_pool2_even_dilation form='dense') has an analytic
tile-pass argument (one (K=216, N=128) contraction vs four (K=54, N=32))
but no in-model number. This measures the full flagship apply with each
entry formulation at both the 2.5-degree and 0.5-degree widths.

Run on TPU; do NOT override PYTHONPATH.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from __graft_entry__ import _tower_specs


def flagship_tower(impl, nlat, nlon):
    specs = _tower_specs(4)
    # Replace the entry CyclicConv2D+MaxPooling2D pair with an explicit
    # FusedConvPool2D carrying the formulation under test (the peephole
    # would produce parity_impl='auto').
    entry = ("FusedConvPool2D", (32, 3),
             {"dilation": 2, "activation": "tanh", "parity_impl": impl})
    specs = [entry] + specs[2:]
    return build_sequential(specs)


def timed_apply(model, params, x, steps=30, repeats=3):
    def body(c, _):
        y = model.apply(params, x * c)
        return 1.0 + 0.0 * y.ravel()[0], ()

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


def sweep(batch, nlat, nlon):
    print(f"-- flagship apply, batch {batch}, {nlat}x{nlon} --", flush=True)
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 6, nlat, nlon), jnp.float32
    )
    ref = None
    for impl in ("parity4", "unfused", "group", "chandense"):
        model = flagship_tower(impl, nlat, nlon)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        y = model.apply(params, x[:2])
        if ref is None:
            ref = np.asarray(y)
        else:
            dev = float(np.max(np.abs(np.asarray(y) - ref)))
            # Model convs run at TPU default matmul precision (bf16
            # passes) by design; formulations contract in different
            # orders, so cross-impl deviation is a few 1e-3 on TPU
            # (exact-parity tests run on CPU in f64: tests/test_ops.py).
            assert dev < 2e-2, (impl, dev)
        dt = timed_apply(model, params, x)
        gps = batch * nlat * nlon / dt
        print(f"  {impl:10s}: {dt*1e6:7.0f} us/apply -> "
              f"{gps/1e6:7.1f} Mgp/s", flush=True)


if __name__ == "__main__":
    sweep(256, 36, 144)
    sweep(32, 180, 720)
