#!/usr/bin/env python
"""Animated forecast movie (reference ``examples/plot_movie.py``):
roll a forecast out (default 14 days' worth of steps) and render an
animated GIF of the height field."""

from __future__ import annotations

import argparse

import _path  # noqa: F401
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictor-file", default=None)
    p.add_argument("--model-file", default=None)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--output-file", default="forecast_movie.gif")
    args = p.parse_args(argv)

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.forecast import TimeSeriesEstimator
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.plot import plot_movie
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

    gen = SeriesSampler(data, model=dlwp, batch_size=64)
    est = TimeSeriesEstimator(dlwp, gen)
    fc = est.predict(args.steps, samples=[0], unscale=True)
    frames = fc.values[:, 0, 0]
    titles = [f"+{int(h)}h" for h in fc.f_hour]
    plot_movie(frames, data.lat, data.lon, args.output_file, titles=titles)
    print(f"saved {args.output_file}")


if __name__ == "__main__":
    main()
