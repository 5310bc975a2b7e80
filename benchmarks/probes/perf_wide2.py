"""Isolate the wide-grid upsample-path effect: entry is now width-auto
('group' at W=720); sweep the conv_after_upsample2 gate on/off."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from dlwp_tpu.models import build_sequential
from __graft_entry__ import _tower_specs

B, H, W = 32, 180, 720


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
    model = build_sequential(_tower_specs(4))
    params = model.init(jax.random.PRNGKey(0), x)
    for gate, label in [(512, "upsample parity OFF at 720"),
                        (1024, "upsample parity ON at 720")]:
        C._PARITY_MAX_W = gate
        t = timed(lambda a: model.apply(params, a), x)
        print(f"entry=auto(group) upsample-gate {gate:4d}: {t*1e6:9.1f} us"
              f" -> ~{B*H*W/t/1e6:6.1f} Mgp/s  [{label}]", flush=True)
    C._PARITY_MAX_W = 512


if __name__ == "__main__":
    main()
