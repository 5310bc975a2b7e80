"""Wide-grid (0.5-degree-class) in-model entry sweep: group vs chandense.

The block-diagonal dense entry (`conv_pool2_even_dilation(form='dense')`)
halves the MXU tile passes of the grouped form at the flagship channel
counts; this checks whether that carries to the 180x720 grid where
'group' was the measured winner (BASELINE.md round 2+ re-sweep).
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
    rng = np.random.RandomState(0)
    base = build_sequential(_tower_specs(4))
    x = jnp.asarray(rng.randn(B, 6, H, W), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x)
    ref = None
    for impl in ["group", "chandense"]:
        m = with_impl(base, impl)
        out = jax.jit(lambda a, m=m: m.apply(params, a))(x)
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
            assert err < 1e-4, (impl, err)
        t = timed(lambda a, m=m: m.apply(params, a), x)
        print(f"{impl:>10}: {t*1e6:9.1f} us/apply -> ~{B*H*W/t/1e6:6.1f} Mgp/s",
              flush=True)


if __name__ == "__main__":
    main()
