#!/usr/bin/env python
"""Plot example forecast maps (reference ``examples/plot_forecasts.py``).

Rolls out a forecast, then renders verification-vs-forecast panels and a
spectral vorticity diagnostic (the spherical Laplacian of height -- the
reference computes this via the spharm engine, plot_forecasts.py:173).
"""

from __future__ import annotations

import argparse

import _path  # noqa: F401
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictor-file", default=None)
    p.add_argument("--model-file", default=None)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--out-prefix", default="forecast_plot")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.forecast import TimeSeriesEstimator
    from dlwp_tpu.grid import LatLonGrid
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.plot import forecast_example_plot, plot_global_map
    from dlwp_tpu.spectral import SphericalHarmonics
    from dlwp_tpu.utils import load_model

    if args.predictor_file:
        data = PredictorDataset.from_file(args.predictor_file)
    else:
        from _synthetic import synthetic_predictor_file

        data = synthetic_predictor_file()

    if args.model_file:
        dlwp = load_model(args.model_file)
    else:
        dlwp = DLWPNeuralNet(time_dim=1, scaler_type=None)
        s0 = SeriesSampler(data, model=dlwp, batch_size=64)
        c = s0.convolution_shape[0]
        dlwp.build_model([
            ("CyclicConv2D", (32, 3), {"activation": "tanh"}),
            ("CyclicConv2D", (c, 3), {}),
        ])
        dlwp.fit_generator(s0, epochs=3, verbose=False)

    gen = SeriesSampler(data, model=dlwp, input_time_steps=dlwp.time_dim,
                        output_time_steps=dlwp.time_dim, batch_size=64)
    est = TimeSeriesEstimator(dlwp, gen)
    fc = est.predict(args.steps, samples=[0], unscale=True)

    series = np.asarray(data.predictors)
    phys = data.inverse_scale(series[args.steps])
    forecast_example_plot(
        phys[0], fc.values[-1, 0, 0], data.lat, data.lon,
        f_hour=fc.f_hour[-1], file_path=f"{args.out_prefix}_panels.png",
    )
    print(f"saved {args.out_prefix}_panels.png")

    # Spherical-Laplacian vorticity diagnostic of the forecast height.
    lat = np.asarray(data.lat)
    grid = (
        LatLonGrid.regular(len(lat), len(data.lon))
        if abs(abs(lat[0]) - 90.0) < 1e-6
        else LatLonGrid.from_coords(lat, np.asarray(data.lon))
    )
    sh = SphericalHarmonics.build(grid, max(8, min(42, grid.nlat - 2)))
    lap = np.asarray(sh.laplacian(jnp.asarray(fc.values[-1, 0, 0])))
    ax = plot_global_map(
        data.lat, data.lon, lap, title="laplacian(z) diagnostic",
        cmap="RdBu_r",
    )
    ax.figure.savefig(f"{args.out_prefix}_laplacian.png", dpi=120,
                      bbox_inches="tight")
    print(f"saved {args.out_prefix}_laplacian.png")


if __name__ == "__main__":
    main()
