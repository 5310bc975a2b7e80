"""Wide-grid (0.5-degree-class, 180x720) flagship sweep.

Round 2 measured the parity fusions LOSING at W=720 (114 vs 132 Mgp/s)
with the then-current four-conv upsample interleave, and gated them off
via _PARITY_MAX_W=512. The dense one-conv upsample collapse changes that
tradeoff; re-measure per-impl at the production-class grid.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.models.cnn import SequentialModel
from dlwp_tpu.models.layers import FusedConvPool2D
from __graft_entry__ import _tower_specs

B, H, W = 32, 180, 720


def with_impl(model, impl):
    ls = tuple(
        l.clone(parity_impl=impl) if isinstance(l, FusedConvPool2D) else l
        for l in model.layers
    )
    return SequentialModel(layers=ls)


def timed(fn, x, steps=30, repeats=3):
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
    import dlwp_tpu.ops.conv as C

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 6, H, W), jnp.float32)

    for gate, label in [(512, "gated (current: no parity fusion)"),
                        (1024, "parity fusions ON at 720")]:
        C._PARITY_MAX_W = gate
        model = build_sequential(_tower_specs(4))
        params = model.init(jax.random.PRNGKey(0), x)
        impls = ["parity4"] if gate == 512 else ["parity4", "group"]
        for impl in impls:
            m = with_impl(model, impl)
            t = timed(lambda a, m=m: m.apply(params, a), x)
            gps = B * H * W / t
            print(
                f"W-gate {gate:4d} entry={impl:>8}: {t*1e6:8.1f} us/apply"
                f" -> ~{gps/1e6:7.1f} Mgp/s   [{label}]",
                flush=True,
            )
    C._PARITY_MAX_W = 512


if __name__ == "__main__":
    main()
