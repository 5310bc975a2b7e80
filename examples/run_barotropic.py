#!/usr/bin/env python
"""Batch barotropic model integration.

Equivalent of the reference's ``examples/run_barotropic.py``: initialize the
spectral barotropic model from 500-hPa height fields at a batch of analysis
times and integrate 144 hours, saving 6-hourly height snapshots. The whole
batched trajectory runs as one jitted ``lax.scan`` (the reference steps one
init time at a time through Fortran transforms).
"""

from __future__ import annotations

import argparse
import time

import _path  # noqa: F401
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictor-file", default=None,
                   help="series predictor file with an HGT channel")
    p.add_argument("--truncation", type=int, default=42)
    p.add_argument("--dt", type=float, default=1800.0, help="seconds")
    p.add_argument("--hours", type=float, default=144.0)
    p.add_argument("--snapshot-hours", type=float, default=6.0)
    p.add_argument("--damping", type=float, default=5e-6)
    p.add_argument("--n-init", type=int, default=4, help="batched init times")
    p.add_argument("--output-file", default="barotropic_forecast.h5")
    p.add_argument("--step-impl", choices=["xla", "pallas"], default="xla",
                   help="'pallas' = fused whole-trajectory kernel "
                        "(fastest single-member on TPU; see BASELINE.md)")
    p.add_argument("--fourier", choices=["fft", "matmul"], default="fft",
                   help="longitude transform implementation")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dlwp_tpu.barotropic import BarotropicModelPsi
    from dlwp_tpu.grid import LatLonGrid

    if args.predictor_file:
        from dlwp_tpu.data import PredictorDataset

        data = PredictorDataset.from_file(args.predictor_file)
        hgt = [i for i, v in enumerate(data.varlev) if v.startswith("HGT")]
        arr = np.asarray(data.predictors)[: args.n_init, hgt[0]]
        z0 = data.inverse_scale(
            np.asarray(data.predictors)[: args.n_init]
        )[:, hgt[0]]
        lat, lon = np.asarray(data.lat), np.asarray(data.lon)
        times = np.asarray(data.sample[: args.n_init])
    else:
        print("no predictor file; using synthetic initial heights")
        from _synthetic import SyntheticGlobalSource

        src = SyntheticGlobalSource(n_samples=args.n_init, nlat=73, nlon=144)
        z0 = src.field("HGT", 500)
        lat, lon = src.lat, src.lon
        times = src.times

    grid = (
        LatLonGrid.regular(len(lat), len(lon))
        if abs(abs(lat[0]) - 90.0) < 1e-6
        else LatLonGrid.from_coords(lat, lon)
    )
    model = BarotropicModelPsi(
        grid, args.truncation, dt=args.dt,
        damping_coefficient=args.damping, dtype=jnp.float32,
        fourier=args.fourier, step_impl=args.step_impl,
    )
    z0 = jnp.asarray(z0, dtype=jnp.float32)
    # The fused kernel targets single-member states; with one init time,
    # drop the batch axis so --step-impl pallas actually engages (the
    # model falls back to the XLA scan for batched states).
    squeeze_member = args.step_impl == "pallas" and args.n_init == 1
    if args.step_impl == "pallas" and args.n_init > 1:
        print("note: step_impl='pallas' is single-member; batched init "
              "times use the XLA scan")
    state = model.from_z(z0[0] if squeeze_member else z0)
    snap_every = int(args.snapshot_hours * 3600.0 / args.dt)
    n_snaps = int(args.hours / args.snapshot_hours)

    t0 = time.time()
    final, t_snap, zs = model.run_with_snapshots(state, n_snaps, snap_every)
    jax.block_until_ready(zs)
    elapsed = time.time() - t0
    zs = np.asarray(zs)  # (n_snaps, n_init, nlat, nlon)
    if squeeze_member:
        zs = zs[:, None]  # restore the member axis for the output file
    n_steps = n_snaps * snap_every
    print(
        f"integrated {args.n_init} x {n_steps} steps in {elapsed:.2f}s "
        f"({args.n_init * n_steps / elapsed:.0f} member-steps/s)"
    )
    # Overflow check (reference run_barotropic.py:52-53).
    if not np.isfinite(zs).all():
        raise RuntimeError("numerical overflow in barotropic integration")

    import h5py

    with h5py.File(args.output_file, "w") as f:
        f.create_dataset("z", data=zs)
        f.create_dataset("f_hour", data=np.asarray(t_snap) / 3600.0)
        f.create_dataset("lat", data=grid.lat)
        f.create_dataset("lon", data=grid.lon)
        f.create_dataset(
            "init_time",
            data=np.asarray(times, dtype="datetime64[ns]").astype(np.int64),
        )
    print(f"saved {args.output_file}")


if __name__ == "__main__":
    main()
