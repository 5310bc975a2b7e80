"""ConvLSTM recurrent-gate activation: hard_sigmoid vs sigmoid (VERDICT
round-2 item 3b).

Round-2 gate analysis (BASELINE.md) put the ConvLSTM flagship's gate chain
at a ~800 us VPU transcendental floor assuming sigmoid/tanh gates. The
reference's actual semantics are standalone-Keras ``hard_sigmoid``
(clip(0.2x + 0.5, 0, 1)) -- piecewise-linear, no transcendentals -- now the
``ConvLSTM2D`` default. This measures the canonical flagship application
with each recurrent activation (and the bf16-gate serving option on top).

Timing: in-graph scan over applications (dispatch floor amortized).
Run on TPU; do NOT override PYTHONPATH.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from __graft_entry__ import _tower_specs

B, T, C, H, W = 64, 2, 3, 36, 144


def flagship(recurrent_activation, gate_dtype=None, gate_impl="xla"):
    lstm_features = 4 * C
    kw = {"dilation": 2, "return_sequences": True, "activation": "tanh",
          "recurrent_activation": recurrent_activation,
          "gate_impl": gate_impl}
    if gate_dtype:
        kw["gate_dtype"] = gate_dtype
    specs = [
        ("ConvLSTM2D", (lstm_features, 3), kw),
        ("Reshape", ((T * lstm_features, H, W),), None),
        *_tower_specs(T * 2),
        ("Reshape", ((T, 2, H, W),), None),
    ]
    model = build_sequential(specs)
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, T, C, H, W), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def timed_apply(model, params, x, steps=50, repeats=3):
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


def main():
    ref = None
    for label, ra, gd, gi in (
        ("sigmoid gates (round-2 default)", "sigmoid", None, "xla"),
        ("hard_sigmoid gates (reference default)", "hard_sigmoid", None,
         "xla"),
        ("hard_sigmoid + bf16 gate compute", "hard_sigmoid", "bfloat16",
         "xla"),
        ("sigmoid + bf16 gate compute", "sigmoid", "bfloat16", "xla"),
        ("hard_sigmoid, fused pallas gates", "hard_sigmoid", None,
         "pallas"),
        ("hard_sigmoid, pallas + bf16 gates", "hard_sigmoid", "bfloat16",
         "pallas"),
    ):
        model, params, x = flagship(ra, gd, gi)
        y = np.asarray(model.apply(params, x[:2]))
        if label.startswith("hard_sigmoid gates"):
            ref = y
        if ref is not None and gi == "pallas" and gd is None:
            dev = float(np.max(np.abs(y - ref)))
            print(f"  [pallas vs xla hard_sigmoid fwd dev: {dev:.2e}]",
                  flush=True)
        dt = timed_apply(model, params, x)
        gps = B * H * W / dt
        print(f"{label:42s}: {dt*1e6:7.0f} us/apply -> {gps/1e6:6.1f} Mgp/s",
              flush=True)


if __name__ == "__main__":
    main()
