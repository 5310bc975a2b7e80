"""Instrument selection for the two-truth archive (round 5, measured).

On a one-truth archive the barotropic baseline is the data generator and
scores exact-by-construction (round-4 BASELINE.md ordering caveat). This
probe measures, on the production 73x144 grid, how much genuine model
error each candidate instrument gives a plain archive-truncation core:

- truncation gap (``truth_truncation``): truth integrated at T72 (or
  wider gaps), archive band-limited to T42/T30/T21;
- cascade-band Rayleigh drag (``wave_drag_days``/``wave_drag_n_min``)
  on the generating truth only;
- the null (one-truth) fp32 noise floor.

Each row: 160-sample probe archive (40-day segments), plain core at the
archive truncation reintegrated from 3 mid-segment states, RMSE in m of
Z500 at 6/24/48/72 h. Results + the production decision (T42/T72; the
drag terms stay documented knobs) are in BASELINE.md round 5.

Runs fine on CPU (``JAX_PLATFORMS=cpu``, ~10 min) — the decision data
is platform-independent physics, not a perf number.

Reference anchor: examples/validate.py:250-273 (the CNN-vs-barotropic
comparison these instruments make meaningful).
"""

import numpy as np
import jax.numpy as jnp

from dlwp_tpu.data import BarotropicArchiveSource
from dlwp_tpu.grid import LatLonGrid
from dlwp_tpu.barotropic import BarotropicModel


def baseline_error(label, trunc, **kw):
    src = BarotropicArchiveSource(
        n_samples=160, nlat=73, nlon=144, dt=1800.0, truncation=trunc,
        segment_days=40, seed=0, **kw)
    z = src.field("HGT", 500)
    grid = LatLonGrid.regular(73, 144)
    m = BarotropicModel(grid, trunc, dt=1800.0, damping_coefficient=5e-6,
                        dtype=jnp.float32)
    errs = []
    for i0 in (20, 60, 100):
        st = m.from_z(jnp.asarray(z[i0]))
        _, _, zs = m.run_with_snapshots(st, 12, 12)  # 12 snaps, 6-hourly
        zs = np.asarray(zs)
        errs.append(np.sqrt(np.mean((zs - z[i0 + 1:i0 + 13]) ** 2,
                                    axis=(1, 2))))
    e = np.mean(errs, axis=0)
    print(f"{label}: @6h={e[0]:.2f} @24h={e[3]:.2f} "
          f"@48h={e[7]:.2f} @72h={e[11]:.2f}  [m]", flush=True)
    return e


def main():
    tt = dict(truth_truncation=72, truth_nlat=73, truth_nlon=144)
    baseline_error("T42 one-truth (null)       ", 42)
    baseline_error("T42/T72 (production)       ", 42, **tt)
    baseline_error("T30/T72                    ", 30, **tt)
    baseline_error("T21/T72                    ", 21, **tt)
    baseline_error("T42/T72 + drag t=1d n>=15  ", 42, wave_drag_days=1.0,
                   wave_drag_n_min=15, **tt)
    baseline_error("T42/T72 + drag t=3d n>=15  ", 42, wave_drag_days=3.0,
                   wave_drag_n_min=15, **tt)
    baseline_error("T42 + drag t=3d n>=10      ", 42, wave_drag_days=3.0,
                   wave_drag_n_min=10)
    baseline_error("T42 + drag t=3d n>=8       ", 42, wave_drag_days=3.0,
                   wave_drag_n_min=8)


if __name__ == "__main__":
    main()
