"""Fused-kernel vs XLA-scan timings for both barotropic forms.

Per-step costs are two-point slopes (t(2000) - t(500)) / 1500: a single
blocked dispatch through the tunnel carries a ~30 ms completion-latency
floor that otherwise dominates (see perf_dispatch_floor.py and
BASELINE.md "Tunnel dispatch floor").
"""

import time
import numpy as np, jax, jax.numpy as jnp
from dlwp_tpu.grid.latlon import LatLonGrid
from dlwp_tpu.barotropic.model import BarotropicModel, BarotropicModelPsi
N1, N2 = 500, 2000
def timeit(fn, *a, repeats=3):
    out = fn(*a); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best
def slope(model, s0):
    t1 = timeit(lambda s: model.run(s, N1), s0)
    t2 = timeit(lambda s: model.run(s, N2), s0)
    return (t2 - t1) / (N2 - N1)
grid = LatLonGrid.regular(73, 144)
z = 100.0 * np.random.RandomState(0).randn(73, 144).astype(np.float32)
for cls in (BarotropicModel, BarotropicModelPsi):
    xla = cls(grid, truncation=72, dt=1800.0)
    pal = cls(grid, truncation=72, dt=1800.0, step_impl="pallas")
    s0x = xla.from_z(jnp.asarray(z)); s0p = pal.from_z(jnp.asarray(z))
    t0 = time.time()
    za = np.asarray(xla.z_grid(xla.run(s0x, 40))); zb = np.asarray(pal.z_grid(pal.run(s0p, 40)))
    print(f"{cls.__name__}: 40-step compile+run {time.time()-t0:.0f}s, rel {np.abs(za-zb).max()/np.abs(za).max():.1e}", flush=True)
    tx = slope(xla, s0x)
    tp = slope(pal, s0p)
    print(f"{cls.__name__}: xla {1e6*tx:.1f} us/step ({1/tx:.0f}/s) | "
          f"pallas {1e6*tp:.1f} us/step ({1/tp:.0f}/s)  [slope]", flush=True)
