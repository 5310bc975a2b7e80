"""Slope-measured barotropic ensemble throughput (XLA batched path).

The recorded "68k member-steps/s at B=64" figure was measured pre-fusion
with single blocked dispatches (dispatch-floor contaminated, see
BASELINE.md). Re-measure with two-point step-count slopes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.grid.latlon import LatLonGrid
from dlwp_tpu.barotropic.model import BarotropicModelPsi

N1, N2 = 200, 800


def timeit(fn, *a, repeats=3):
    out = fn(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    grid = LatLonGrid.regular(73, 144)
    rng = np.random.RandomState(0)
    model = BarotropicModelPsi(grid, truncation=72, dt=1800.0)
    for B in (1, 16, 64, 256):
        z = 100.0 * rng.randn(B, 73, 144).astype(np.float32)
        s0 = model.from_z(jnp.asarray(z.squeeze()))
        t1 = timeit(lambda s: model.run(s, N1), s0)
        t2 = timeit(lambda s: model.run(s, N2), s0)
        slope = (t2 - t1) / (N2 - N1)
        print(f"B={B:4d}: {1e6 * slope:8.1f} us/step -> "
              f"{B / slope:12.0f} member-steps/s  [slope]", flush=True)


if __name__ == "__main__":
    main()
