#!/usr/bin/env python
"""Multi-model ensemble spaghetti verification
(reference ``examples/plot_ensemble.py``): roll out forecasts from several
saved models (or quickly trained variants) and plot their RMSE curves plus
the ensemble mean."""

from __future__ import annotations

import argparse

import _path  # noqa: F401
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictor-file", default=None)
    p.add_argument("--model-files", nargs="*", default=None,
                   help="saved model prefixes; default trains 3 seeds")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--plot-file", default="ensemble_rmse.png")
    args = p.parse_args(argv)

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.forecast import TimeSeriesEstimator, verify
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.utils import load_model

    if args.predictor_file:
        data = PredictorDataset.from_file(args.predictor_file)
    else:
        from _synthetic import synthetic_predictor_file

        data = synthetic_predictor_file()

    models = []
    if args.model_files:
        for mf in args.model_files:
            models.append((mf, load_model(mf)))
    else:
        for seed in range(3):
            dlwp = DLWPNeuralNet(time_dim=1, scaler_type=None)
            s0 = SeriesSampler(data, model=dlwp, batch_size=64, shuffle=True,
                               seed=seed)
            c = s0.convolution_shape[0]
            dlwp.build_model(
                [("CyclicConv2D", (16 + 16 * seed, 3), {"activation": "tanh"}),
                 ("CyclicConv2D", (c, 3), {})],
                seed=seed,
            )
            dlwp.fit_generator(s0, epochs=3, verbose=False)
            models.append((f"seed{seed}", dlwp))

    curves = {}
    fcs = []
    for name, dlwp in models:
        gen = SeriesSampler(data, model=dlwp, batch_size=64)
        est = TimeSeriesEstimator(dlwp, gen)
        fc = est.predict(args.steps)
        ver, f_hour = verify.verification_from_series(
            data, forecast_steps=fc.values.shape[0],
            dt_hours=int(est._dt_hours), init_times=fc.times, all_data=data,
        )
        out_idx = data.varlev_index(fc.varlev)
        curves[name] = verify.forecast_error(
            fc.values[:, :, 0], ver[:, :, out_idx][:, :, 0], method="rmse",
            axis=tuple(range(1, fc.values[:, :, 0].ndim)),
        )
        fcs.append(fc.values)

    ens_mean = np.nanmean(np.stack(fcs), axis=0)
    curves["ensemble_mean"] = verify.forecast_error(
        ens_mean[:, :, 0], ver[:, :, out_idx][:, :, 0], method="rmse",
        axis=tuple(range(1, ens_mean[:, :, 0].ndim)),
    )

    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for name, c in curves.items():
        style = {"lw": 2.5, "color": "k"} if name == "ensemble_mean" else {"alpha": 0.7}
        ax.plot(f_hour, c, label=name, **style)
    ax.set_xlabel("forecast hour")
    ax.set_ylabel("RMSE (scaled units)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(args.plot_file, dpi=120, bbox_inches="tight")
    print(f"saved {args.plot_file}")


if __name__ == "__main__":
    main()
