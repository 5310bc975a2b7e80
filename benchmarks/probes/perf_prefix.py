"""Per-stage prefix timing of the fused flagship tower (current default).

Times model prefixes layers[:k] to attribute the per-application cost
after the round-2+ fusions (dense upsample collapse, parity4 entry).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.models.cnn import SequentialModel
from __graft_entry__ import _tower_specs

B, H, W = 256, 36, 144


def timed(fn, x, steps=50, repeats=3):
    def body(c, _):
        y = fn(x * c)
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
    rng = np.random.RandomState(0)
    model = build_sequential(_tower_specs(4))
    x = jnp.asarray(rng.randn(B, 6, H, W), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    names = [type(l).__name__ for l in model.layers]
    prev = 0.0
    for k in range(1, len(model.layers) + 1):
        sub = SequentialModel(layers=model.layers[:k])
        if names[k - 1] == "Identity":
            continue
        t = timed(lambda a, m=sub: m.apply(params, a), x)
        print(
            f"through {k:2d} {names[k-1]:>16}: {t*1e6:8.1f} us "
            f"(+{(t-prev)*1e6:7.1f})",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
