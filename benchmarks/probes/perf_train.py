"""Training-throughput measurement: jitted fwd+bwd+Adam over the fused
flagship tower (fp32, batch 64, lat-weighted loss, 200-step scan)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.ops.losses import latitude_weighted_loss, mse
from __graft_entry__ import _tower_specs

B, H, W = 64, 36, 144
STEPS = 200


def main():
    rng = np.random.RandomState(0)
    model = build_sequential(_tower_specs(4))
    x = jnp.asarray(rng.randn(B, 6, H, W), jnp.float32)
    y = jnp.asarray(rng.randn(B, 4, H, W), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    lats = np.linspace(87.5, -87.5, H)
    lw_loss = latitude_weighted_loss(mse, lats)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb):
        return lw_loss(yb, model.apply(p, xb))

    def train_step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        up, s = opt.update(g, s, p)
        p = optax.apply_updates(p, up)
        return (p, s), loss

    @jax.jit
    def run(p, s):
        (p, s), losses = lax.scan(train_step, (p, s), None, length=STEPS)
        return p, s, losses

    out = run(params, opt_state)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, opt_state))
        ts.append(time.perf_counter() - t0)
    el = min(ts) / STEPS
    print(
        f"train step: {el*1e6:.0f} us -> {1/el:.0f} steps/s "
        f"({B/el:.0f} samples/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
