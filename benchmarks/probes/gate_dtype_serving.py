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
    args = ap.parse_args(argv)

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.forecast import TimeSeriesEstimator, verify
    from dlwp_tpu.utils import load_model, train_test_split_ind

    data = PredictorDataset.from_file(args.predictor_file)
    n = data.predictors.shape[0]
    _, val_idx = train_test_split_ind(
        n, int(n * args.validation_fraction), method="last"
    )
    val = data.isel_sample(val_idx)

    def rollout(gate_dtype):
        import jax.numpy as jnp

        dlwp = load_model(args.model_file)
        # Flip the front end's gate dtype in the saved specs and rebuild.
        specs = []
        for spec in dlwp.layer_specs:
            name, a, kw = spec[0], spec[1], dict(spec[2] or {})
            if name == "ConvLSTM2D":
                kw["gate_dtype"] = (
                    jnp.bfloat16 if gate_dtype == "bfloat16" else None
                )
            specs.append((name, a, kw))
        params = dlwp.trainer.params
        dlwp.build_model(specs)
        dlwp.trainer.params = params
        gen = SeriesSampler(
            val, model=dlwp, input_time_steps=dlwp.time_dim,
            output_time_steps=dlwp.time_dim, batch_size=64,
            add_insolation=True,
        )
        est = TimeSeriesEstimator(dlwp, gen)
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

    ver, f_hour = verify.verification_from_series(
        val, forecast_steps=fc32.values.shape[0],
        dt_hours=int(fc32.f_hour[0]), init_times=fc32.times, all_data=data,
    )
    out_idx = val.varlev_index(fc32.varlev)
    mean = data.mean[out_idx][v] if data.mean is not None else 0.0
    std = data.std[out_idx][v] if data.std is not None else 1.0
    ver_p = ver[:, :, out_idx][:, :, v] * std + mean
    ax = (1, 2, 3)
    rmse32 = np.sqrt(np.mean((fc32.values[:, :, v] - ver_p) ** 2, axis=ax))
    rmse16 = np.sqrt(np.mean((fc16.values[:, :, v] - ver_p) ** 2, axis=ax))

    print(f"{'f_hour':>7} {'bf16 dev [m]':>13} {'rmse fp32':>10} "
          f"{'rmse bf16':>10} {'dev/rmse':>9}")
    for i, fh in enumerate(fc32.f_hour):
        print(f"{fh:7.0f} {dev[i]:13.3f} {rmse32[i]:10.2f} "
              f"{rmse16[i]:10.2f} {dev[i]/max(rmse32[i],1e-9):9.4f}")


if __name__ == "__main__":
    main()
