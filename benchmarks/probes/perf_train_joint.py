"""Does training inherit the joint zx+zh conv gain? (round 5b)

The +17% rollout gain (perf_convlstm_joint.py) is a forward-path
data-movement win; fwd+bwd+Adam amortizes removed movement over more
compute (the round-5 ladder's +62% apply became -10% epoch time), so
the training delta needs its own measurement. Times the jitted
fwd+bwd+Adam step on the full flagship (canonical ConvLSTM front end +
tower, lat-weighted MSE, batch 32 = the paper-run configuration) ABA
over DLWP_CONVLSTM_JOINT. fwd+bwd programs compile in normal time
(unlike forward-only ones -- docs/DEPLOY.md), so no safe-form wrapper
is needed.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import optax
from jax import lax

B, T, C, H, W = 32, 2, 3, 36, 144
STEPS = 100


def build_step(model, params):
    from dlwp_tpu.ops.losses import latitude_weighted_loss, mse

    lats = np.linspace(87.5, 0.0, H)
    lw_loss = latitude_weighted_loss(mse, lats)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        return lw_loss(model.apply(p, x), y)

    @jax.jit
    def run(p, s, x, y):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (p, s), losses = lax.scan(body, (p, s), None, length=STEPS)
        return p, s, losses[-1]

    return run, opt_state


def main():
    from __graft_entry__ import _flagship

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C, H, W), jnp.float32)
    y = jnp.asarray(rng.randn(B, T, C - 1, H, W), jnp.float32)

    rows = []
    for form in ("separate", "joint", "separate"):  # ABA
        os.environ["DLWP_CONVLSTM_JOINT"] = form
        model, params, _ = _flagship()
        run, opt_state = build_step(model, params)
        out = run(params, opt_state, x, y)
        jax.block_until_ready(out[2])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(params, opt_state, x, y)
            jax.block_until_ready(out[2])
            ts.append(time.perf_counter() - t0)
        per = min(ts) / STEPS
        rows.append((form, per))
        print(
            f"train step [{form:>8}]: {per * 1e6:8.1f} us/step "
            f"({1.0 / per:6.1f} steps/s, fwd+bwd+Adam B={B})",
            flush=True,
        )
    a1, j, a2 = rows[0][1], rows[1][1], rows[2][1]
    base = min(a1, a2)
    print(
        f"joint vs separate (train): {100.0 * (base - j) / base:+.1f}% "
        f"(separate drift {100.0 * abs(a1 - a2) / base:.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
