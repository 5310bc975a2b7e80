"""Serving decision data for ConvLSTM2D(gate_dtype='bfloat16').

bf16 gates are the measured +26% throughput lever on the canonical
flagship (BASELINE.md round 4) but stay opt-in pending a deviation budget
(round-4 verdict item 5 tail). This probe produces that budget on a REAL
trained model: load the paper-run ConvLSTM, roll the validation inits out
in both gate dtypes, and report (a) the physical-units RMS deviation
between the two trajectories per lead and (b) both trajectories' RMSE
against the archive truth — the serving question is whether (a) is
negligible against (b), the model's own error.

Usage (after the paper run):
    python benchmarks/probes/gate_dtype_serving.py \
        --predictor-file artifacts/paper_archive2.h5 \
        --model-file artifacts/paper2_convlstm
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--predictor-file", required=True)
    ap.add_argument("--model-file", required=True)
    ap.add_argument("--forecast-steps", type=int, default=12)
    ap.add_argument("--n-init", type=int, default=64)
    ap.add_argument("--validation-fraction", type=float, default=0.25)
    ap.add_argument("--val-json", default=None,
                    help="validate.py --emit-json artifact for the same "
                         "model: its RMSE curve is the error budget the "
                         "deviation is scored against (replaces the "
                         "probe's own in-line truth alignment, which "
                         "cannot see validate.py's masking/climatology "
                         "handling)")
    args = ap.parse_args(argv)

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.forecast import TimeSeriesEstimator
    from dlwp_tpu.utils import load_model, train_test_split_ind

    data = PredictorDataset.from_file(args.predictor_file)
    # Same grid reconciliation as examples/validate.py:86-96 — a model
    # trained under the --crop-north-pole default expects one fewer row.
    probe_model = load_model(args.model_file)
    trained = probe_model.input_sample_shape
    if (trained is not None and data.lat[0] == 90.0
            and trained[-2] == data.predictors.shape[-2] - 1):
        data.predictors = np.asarray(data.predictors)[..., 1:, :]
        data.lat = data.lat[1:]
    del probe_model
    n = data.predictors.shape[0]
    _, val_idx = train_test_split_ind(
        n, int(n * args.validation_fraction), method="last"
    )
    val = data.isel_sample(val_idx)

    def rollout(gate_dtype):
        dlwp = load_model(args.model_file)
        gen = SeriesSampler(
            val, model=dlwp, input_time_steps=dlwp.time_dim,
            output_time_steps=dlwp.time_dim, batch_size=64,
            add_insolation=True,
        )
        # The serving-precision API (forecast/rollout.py): rebuilds the
        # ConvLSTM specs with the requested gate dtype, weights untouched.
        est = TimeSeriesEstimator(dlwp, gen, gate_dtype=gate_dtype)
        n_iter = max(1, args.forecast_steps // est._out_ts)
        fc = est.predict(
            n_iter, samples=np.arange(args.n_init), unscale=True,
            init_batch_size=64,
        )
        return fc

    fc32 = rollout(None)
    fc16 = rollout("bfloat16")
    v = 0  # HGT/500
    dev = np.sqrt(np.mean(
        (fc32.values[:, :, v] - fc16.values[:, :, v]) ** 2, axis=(1, 2, 3)
    ))

    # Paired rollouts also give the skill-difference directly (the two
    # trajectories score against the SAME truth, so masked/NaN rows
    # cancel): report RMS deviation, and — when a validate.py artifact is
    # supplied — the model's own RMSE curve as the error budget, plus the
    # quadrature impact sqrt(rmse^2 + dev^2) - rmse the deviation would
    # add if it were independent error.
    budget = None
    if args.val_json:
        import json

        with open(args.val_json) as f:
            vj = json.load(f)
        assert [int(x) for x in vj["f_hour"]] == [
            int(x) for x in fc32.f_hour], "lead mismatch vs val artifact"
        budget = np.asarray(vj["rmse"]["forecast"])

    hdr = f"{'f_hour':>7} {'bf16 dev [m]':>13}"
    if budget is not None:
        hdr += f" {'model rmse':>11} {'dev/rmse':>9} {'quad add':>9}"
    print(hdr)
    for i, fh in enumerate(fc32.f_hour):
        row = f"{fh:7.0f} {dev[i]:13.3f}"
        if budget is not None:
            quad = np.sqrt(budget[i] ** 2 + dev[i] ** 2) - budget[i]
            row += (f" {budget[i]:11.2f} {dev[i]/budget[i]:9.4f} "
                    f"{quad:8.3f}m")
        print(row)


if __name__ == "__main__":
    main()
