#!/usr/bin/env python
"""ConvLSTM-front-end training workflow (the canonical configuration).

The reference's canonical full architecture (examples/train.py:142-221):
a convolutional LSTM over the input time steps feeding the
conv-pool-upsample tower. Here the recurrent path uses the is_recurrent
batch layout (B, T, C, H, W); the ConvLSTM applies spherical boundaries on
both the input *and* recurrent convolutions and its per-step outputs are
flattened into the tower's channels, exactly mirroring the reference's
Reshape bridge (train.py:158).

``--sequence k`` additionally trains k forecast iterations jointly with
equal loss weights (the reference's functional multi-step training,
train_functional.py:61,283-285, which also supports the recurrent
front end, train_functional.py:207-217): the rollout is a lax.scan inside
the loss with rematerialization. With an insolation input channel the
splice persists the last known insolation (the in-graph recomputation per
valid time is the *forecast*-time behavior, forecast/rollout.py).
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
    p.add_argument("--lstm-features", type=int, default=None,
                   help="default 4*(C+1) per the reference (train.py:149)")
    p.add_argument("--sequence", type=int, default=1,
                   help="jointly trained forecast iterations "
                        "(train_functional.py:61)")
    p.add_argument("--add-insolation", dest="add_insolation",
                   action="store_true", default=True)
    p.add_argument("--no-insolation", dest="add_insolation",
                   action="store_false")
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--cosine-decay", action="store_true",
                   help="cosine LR decay to 5%% over the run + grad clip")
    p.add_argument("--validation-fraction", type=float, default=0.0,
                   help="hold out the series tail for val_loss/early stop")
    p.add_argument("--no-val-eval", action="store_true",
                   help="hold the tail out of training but skip the "
                        "per-epoch evaluation pass (validate separately "
                        "with examples/validate.py)")
    p.add_argument("--eval-impl", default="auto",
                   choices=["auto", "forward", "outer", "grad"],
                   help="validation-eval program form: the forward-only "
                        "sequence-loss scan (weighted loss inside) "
                        "faults v5e workers through remote PJRT "
                        "(repro_eval_fault.py bisect), so 'auto' picks "
                        "'grad' (value_and_grad, gradients discarded; "
                        "fast compile) for sequence training on TPU and "
                        "'forward' elsewhere. 'outer' (loss outside the "
                        "scan) is the cheapest safe form per epoch but "
                        "compiles ~20 min cold through the tunnel")
    p.add_argument("--min-epochs", type=int, default=0)
    p.add_argument("--patience", type=int, default=0)
    p.add_argument("--loss", default="mse", choices=["mse", "lat_mse"])
    p.add_argument("--device-resident", action="store_true",
                   help="push the whole series to HBM and assemble batches "
                        "on device; each epoch runs as one jitted scan "
                        "(DeviceSeriesSampler + Trainer.fit_device)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="write an orbax checkpoint of {params, opt_state} "
                        "every --checkpoint-every epochs (mid-training "
                        "checkpointing the reference lacks -- it saves only "
                        "at the end, util.py:126-192)")
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint in --checkpoint-dir "
                        "and continue from its epoch")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.utils import save_model, train_test_split_ind

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

    n = data.predictors.shape[0]
    if args.validation_fraction > 0:
        n_val = int(n * args.validation_fraction)
        tr_idx, val_idx = train_test_split_ind(n, n_val, method="last")
        train_data = data.isel_sample(tr_idx)
        val_data = data.isel_sample(val_idx)
    else:
        train_data, val_data = data, None

    dlwp = DLWPNeuralNet(
        is_convolutional=True, is_recurrent=True,
        time_dim=args.time_steps, scaler_type=None,
    )
    mk = lambda d, shuffle: SeriesSampler(
        d, model=dlwp,
        input_time_steps=args.time_steps,
        output_time_steps=args.time_steps,
        sequence=args.sequence if args.sequence > 1 else None,
        add_insolation=args.add_insolation,
        batch_size=args.batch_size, shuffle=shuffle, seed=args.seed,
    )
    sampler = mk(train_data, True)
    val_gen = (
        mk(val_data, False)
        if val_data is not None and not args.no_val_eval
        else None
    )
    # Recurrent layout: (B, T, C, H, W) in; targets keep the time axis too.
    T, C, H, W = sampler.convolution_shape
    out_t, out_c = sampler.output_convolution_shape[:2]
    lstm_features = args.lstm_features or 4 * C
    specs = convlstm_tower(T, C, out_t * out_c, lstm_features)
    # Fix the Reshape bridge (spec index 1, after the ConvLSTM) to
    # concrete spatial dims, and reshape the tower output back to the
    # (T, C, H, W) target layout.
    specs[1] = ("Reshape", ((T * lstm_features, H, W),), None)
    specs.append(("Reshape", ((out_t, out_c, H, W),), None))

    splice_fn = None
    if args.sequence > 1 and args.add_insolation:
        # Persist the insolation forcing channel when feeding predictions
        # back inside the training rollout (extensions.py:236-240 semantics
        # are applied exactly at forecast time; training uses the last
        # known forcing).
        def splice_fn(inp, pred, k):  # noqa: F811
            import jax.numpy as jnp

            return jnp.concatenate([pred, inp[:, :, out_c:]], axis=2)

    if args.loss == "lat_mse":
        from dlwp_tpu.ops.losses import latitude_weighted_loss, mse

        loss = latitude_weighted_loss(mse, train_data.lat)
    else:
        loss = args.loss

    if args.cosine_decay:
        import optax

        steps_total = max(1, len(sampler) * args.epochs)
        optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(
                optax.cosine_decay_schedule(
                    args.learning_rate, steps_total, 0.05
                )
            ),
        )
    else:
        optimizer = "adam"

    eval_impl = args.eval_impl
    if eval_impl == "auto":
        import jax

        eval_impl = (
            "grad"
            if args.sequence > 1 and jax.default_backend() == "tpu"
            else "forward"
        )
    dlwp.build_model(
        specs, loss=loss, optimizer=optimizer,
        learning_rate=args.learning_rate,
        sequence_steps=args.sequence, splice_fn=splice_fn,
        early_stopping=args.patience > 0, min_epochs=args.min_epochs,
        patience=args.patience, seed=args.seed, eval_impl=eval_impl,
    )
    if args.device_resident:
        from dlwp_tpu.data import DeviceSeriesSampler

        sampler = DeviceSeriesSampler(sampler)
        if val_gen is not None:
            val_gen = DeviceSeriesSampler(val_gen)
    ckpt_kwargs = {}
    if args.checkpoint_dir:
        ckpt_kwargs = dict(
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
        )
    t0 = time.time()
    history = dlwp.fit_generator(
        sampler, validation_data=val_gen, epochs=args.epochs, verbose=True,
        **ckpt_kwargs,
    )
    print(f"Train time -- {time.time() - t0:.0f} seconds")
    save_model(dlwp, args.model_file, history=history)
    print(f"saved {args.model_file}")
    return history


if __name__ == "__main__":
    main()
