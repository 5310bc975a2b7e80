"""Fused-kernel vs XLA-scan timings for both barotropic forms.

Pending hardware run (tunnel outage 2026-08-18); psi-form previously
measured 13.3k vs 9.3k steps/s. Run on the real chip.
"""

import time
import numpy as np, jax, jax.numpy as jnp
from dlwp_tpu.grid.latlon import LatLonGrid
from dlwp_tpu.barotropic.model import BarotropicModel, BarotropicModelPsi
STEPS = 500
def timeit(fn, *a, repeats=3):
    out = fn(*a); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best
grid = LatLonGrid.regular(73, 144)
z = 100.0 * np.random.RandomState(0).randn(73, 144).astype(np.float32)
for cls in (BarotropicModel, BarotropicModelPsi):
    xla = cls(grid, truncation=72, dt=1800.0)
    pal = cls(grid, truncation=72, dt=1800.0, step_impl="pallas")
    s0x = xla.from_z(jnp.asarray(z)); s0p = pal.from_z(jnp.asarray(z))
    t0 = time.time()
    za = np.asarray(xla.z_grid(xla.run(s0x, 40))); zb = np.asarray(pal.z_grid(pal.run(s0p, 40)))
    print(f"{cls.__name__}: 40-step compile+run {time.time()-t0:.0f}s, rel {np.abs(za-zb).max()/np.abs(za).max():.1e}", flush=True)
    tx = timeit(lambda s: xla.run(s, STEPS), s0x)
    tp = timeit(lambda s: pal.run(s, STEPS), s0p)
    print(f"{cls.__name__}: xla {1e6*tx/STEPS:.1f} us/step ({STEPS/tx:.0f}/s) | "
          f"pallas {1e6*tp/STEPS:.1f} us/step ({STEPS/tp:.0f}/s)", flush=True)
