#!/usr/bin/env python
"""ConvLSTM-front-end training workflow.

The reference's canonical full architecture (examples/train.py:142-221):
a convolutional LSTM over the input time steps feeding the
conv-pool-upsample tower. Here the recurrent path uses the is_recurrent
batch layout (B, T, C, H, W); the ConvLSTM applies spherical boundaries on
both the input *and* recurrent convolutions and its per-step outputs are
flattened into the tower's channels, exactly mirroring the reference's
Reshape bridge (train.py:158).
"""

from __future__ import annotations

import argparse
import time

import _path  # noqa: F401
import numpy as np


def convlstm_tower(time_steps, c_in, c_out, lstm_features):
    """ConvLSTM front end + fused tower (reference train.py:142-221)."""
    return [
        ("ConvLSTM2D", (lstm_features, 3),
         {"dilation": 2, "activation": "tanh", "return_sequences": True}),
        ("Reshape", ((time_steps * lstm_features, -1),), None),
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh"}),
        ("MaxPooling2D", (2,), None),
        ("CyclicConv2D", (64, 3), {"activation": "tanh"}),
        ("UpSampling2D", (2,), None),
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh"}),
        ("CyclicConv2D", (c_out, 5), {"activation": "linear"}),
    ]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictor-file", default=None)
    p.add_argument("--model-file", default="dlwp_convlstm_model")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--time-steps", type=int, default=2)
    p.add_argument("--lstm-features", type=int, default=8)
    args = p.parse_args(argv)

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.utils import save_model

    if args.predictor_file:
        data = PredictorDataset.from_file(args.predictor_file)
    else:
        from _synthetic import synthetic_predictor_file

        print("using synthetic demo data")
        data = synthetic_predictor_file()

    # Pole crop to even latitude count for the pool/upsample tower
    # (reference train.py:86-87).
    if data.predictors.shape[-2] % 2:
        data.predictors = np.asarray(data.predictors)[..., 1:, :]
        data.lat = data.lat[1:]

    dlwp = DLWPNeuralNet(
        is_convolutional=True, is_recurrent=True,
        time_dim=args.time_steps, scaler_type=None,
    )
    sampler = SeriesSampler(
        data, model=dlwp,
        input_time_steps=args.time_steps,
        output_time_steps=args.time_steps,
        batch_size=args.batch_size, shuffle=True,
    )
    # Recurrent layout: (B, T, C, H, W) in; targets keep the time axis too.
    T, C, H, W = sampler.convolution_shape
    out_t, out_c = sampler.output_convolution_shape[:2]
    specs = convlstm_tower(T, C, out_t * out_c, args.lstm_features)
    # Fix the Reshape bridge to concrete spatial dims.
    specs[1] = ("Reshape", ((T * args.lstm_features, H, W),), None)
    # Final reshape back to the (T, C, H, W) target layout.
    specs.append(("Reshape", ((out_t, out_c, H, W),), None))

    dlwp.build_model(specs, loss="mse", learning_rate=1e-3)
    t0 = time.time()
    history = dlwp.fit_generator(sampler, epochs=args.epochs, verbose=True)
    print(f"Train time -- {time.time() - t0:.0f} seconds")
    save_model(dlwp, args.model_file, history=history)
    print(f"saved {args.model_file}")
    return history


if __name__ == "__main__":
    main()
