"""0.5-degree production-resolution measurements (BASELINE.md "0.5°" table).

The reference ships the 0.5-degree CFSR grid as a first-class option
(reference DLWP/data/cfsr.py:111-118). Round 2 recorded only an apply-only
probe at (180, 720); this fills the table: scan-rollout throughput,
training step rate (fwd+bwd+Adam), and T170 barotropic steps at the
pole-inclusive (361, 720) regular grid with and without the
hemisphere-parity fold.

Run on TPU: PYTHONPATH must keep the axon site; do NOT override it.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.ops.losses import latitude_weighted_loss, mse
from __graft_entry__ import _tower_specs

H, W = 180, 720


def timed(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def rollout(batch=32, steps=16):
    rng = np.random.RandomState(0)
    model = build_sequential(_tower_specs(4))
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 6, H, W), np.float32)
    )
    x0 = jnp.asarray(rng.randn(batch, 6, H, W), jnp.float32)

    def step(x, _):
        pred = model.apply(params, x)
        nxt = jnp.concatenate(
            [pred[:, :2], x[:, 2:3], pred[:, 2:], x[:, 5:6]], axis=1
        )
        return nxt, ()

    @jax.jit
    def run(x):
        x, _ = lax.scan(step, x, None, length=steps)
        return jnp.mean(x)

    # two-point slope cancels the dispatch floor
    @jax.jit
    def run3(x):
        x, _ = lax.scan(step, x, None, length=3 * steps)
        return jnp.mean(x)

    t1 = timed(run, x0)
    t3 = timed(run3, x0)
    per_step = max(t3 - t1, 1e-9) / (2 * steps)
    gps = batch * H * W / per_step
    print(f"rollout B={batch}: {per_step*1e3:.2f} ms/step -> "
          f"{gps/1e6:.1f} Mgp/s (slope)", flush=True)


def train(batch=16, steps=50):
    rng = np.random.RandomState(0)
    model = build_sequential(_tower_specs(4))
    x = jnp.asarray(rng.randn(batch, 6, H, W), jnp.float32)
    y = jnp.asarray(rng.randn(batch, 4, H, W), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    lats = np.linspace(89.75, 0.25, H)
    lw = latitude_weighted_loss(mse, lats)
    opt = optax.adam(1e-3)
    s0 = opt.init(params)

    def tr(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(lambda p: lw(y, model.apply(p, x)))(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), loss

    def run_n(n):
        @jax.jit
        def run(p, s):
            (p, s), losses = lax.scan(tr, (p, s), None, length=n)
            return losses[-1]
        return timed(run, params, s0)

    t1 = run_n(steps)
    t3 = run_n(3 * steps)
    per = max(t3 - t1, 1e-9) / (2 * steps)
    print(f"train B={batch}: {per*1e3:.2f} ms/step -> {1/per:.1f} steps/s "
          f"({batch/per:.0f} samples/s)", flush=True)


def barotropic_t170(fold: bool, steps=200):
    from dlwp_tpu.barotropic import BarotropicModelPsi
    from dlwp_tpu.grid import LatLonGrid

    grid = LatLonGrid.regular(361, 720)
    t0 = time.time()
    m = BarotropicModelPsi(grid, 170, dt=900.0, damping_coefficient=5e-6,
                           dtype=jnp.float32, fold=fold)
    build_s = time.time() - t0
    lat = np.radians(grid.lat)[:, None]
    lon = np.radians(grid.lon)[None, :]
    z = (5500.0 - 300.0 * np.sin(lat) ** 2
         + 80.0 * np.cos(lat) ** 3 * np.cos(3 * lon)).astype(np.float32)
    st = m.from_z(jnp.asarray(z))
    t1 = timed(lambda: m.run(st, steps).vrt_spec)
    t3 = timed(lambda: m.run(st, 3 * steps).vrt_spec)
    per = max(t3 - t1, 1e-9) / (2 * steps)
    print(f"barotropic T170 (361x720) fold={fold}: {per*1e3:.2f} ms/step -> "
          f"{1/per:.0f} steps/s (tables {build_s:.0f}s)", flush=True)


if __name__ == "__main__":
    for b in (16, 32):
        rollout(batch=b)
    train(batch=8)
    train(batch=16)
    for fold in (False, True):
        barotropic_t170(fold)
