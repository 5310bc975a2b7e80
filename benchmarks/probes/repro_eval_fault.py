"""Minimal repro for the round-3/4 TPU worker fault at validation eval.

The canonical ConvLSTM + joint sequence loss (examples/train_convlstm.py)
faults the remote TPU worker deterministically on the FORWARD-ONLY
sequence-loss program (UNAVAILABLE: "TPU device error -- often a kernel
fault"), while the fwd+bwd+Adam train step of the SAME loss runs fine
(round-4 session, confirming the round-3 paper-run crash).

Each stage runs in its OWN process (a device fault poisons the client, so
in-process stage sequences only prove the first failure):

    for s in 1 2 3 4 5 6 7 8; do
        timeout 1800 python benchmarks/probes/repro_eval_fault.py --stage $s
    done

  1 train        fwd+bwd+Adam sequence loss          (control; OK)
  2 eval         forward-only sequence loss          (the repro)
  3 eval_grad    same loss under value_and_grad, grads discarded
  4 eval_b8      stage 2 at batch 8
  5 apply        model.apply forward only, no loss
  6 eval_s1      forward-only SINGLE-window loss (no sequence scan)
  7 eval_noremat forward-only sequence loss without jax.checkpoint
  8 eval_mse     stage 2 with plain MSE loss (no latitude weighting)
  9 eval_outer   forward-only scan of apply+splice, lat-weighted loss
                 computed OUTSIDE the scan (Trainer eval_impl='outer')

Round-4 results (each its own process; compile seconds in parens):
  1 OK(15s)  2 FAULT  3 OK(106s)  4 OK(277s, B=8)  5 OK(654s)
  6 OK(1146s)  7 FAULT  8 OK(1338s)
  -> trigger = lat-WEIGHTED loss reduction INSIDE a forward-only
  sequence scan at batch 32 (plain MSE inside: OK; B=8: OK; loss
  outside the scan: OK; under value_and_grad: OK; remat irrelevant).
  Also note: forward-only programs compile 5-90x slower than the
  fwd+bwd train step through this stack (654-1338 s vs 15 s).

Run on TPU with PYTHONPATH=/root/repo:/root/.axon_site.
"""

import argparse
import sys
import time

import numpy as np


def marker(msg):
    print(f"=== {msg}", flush=True)


def build(seq=2):
    import jax.numpy as jnp
    import optax

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.ops.losses import latitude_weighted_loss, mse

    B, td = 32, 2
    nlat, nlon, c = 72, 144, 2
    n = 400
    rng = np.random.RandomState(0)
    data = PredictorDataset(
        predictors=rng.randn(n, c, nlat, nlon).astype(np.float32),
        sample=(np.datetime64("2007-01-01")
                + np.arange(n) * np.timedelta64(6, "h")),
        varlev=["HGT/500", "VRT/500"],
        lat=np.linspace(88.75, -88.75, nlat),
        lon=np.arange(nlon) * 2.5,
        mean=np.zeros(c, np.float32),
        std=np.ones(c, np.float32),
    )
    dlwp = DLWPNeuralNet(is_convolutional=True, is_recurrent=True,
                         time_dim=td, scaler_type=None)
    sampler = SeriesSampler(
        data, model=dlwp, input_time_steps=td, output_time_steps=td,
        sequence=seq if seq > 1 else None, add_insolation=True,
        batch_size=B, shuffle=False,
    )
    T, C, H, W = sampler.convolution_shape
    out_t, out_c = sampler.output_convolution_shape[:2]
    lstm_features = 4 * C
    specs = [
        ("ConvLSTM2D", (lstm_features, 3),
         {"dilation": 2, "activation": "tanh", "return_sequences": True}),
        ("Reshape", ((T * lstm_features, H, W),), None),
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh"}),
        ("MaxPooling2D", (2,), None),
        ("CyclicConv2D", (64, 3), {"activation": "tanh"}),
        ("UpSampling2D", (2,), None),
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh"}),
        ("CyclicConv2D", (out_t * out_c, 5), {"activation": "linear"}),
        ("Reshape", ((out_t, out_c, H, W),), None),
    ]

    splice_fn = None
    if seq > 1:
        def splice_fn(inp, pred, k):  # persist the SOL forcing channel
            return jnp.concatenate([pred, inp[:, :, out_c:]], axis=2)

    dlwp.build_model(
        specs, loss=latitude_weighted_loss(mse, data.lat),
        optimizer=optax.adam(2e-3), sequence_steps=seq,
        splice_fn=splice_fn,
    )
    tr = dlwp.trainer
    xb, yb = sampler[0]
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)
    tr.init(xb)
    return tr, xb, yb


def run_stage(stage):
    import jax
    import jax.numpy as jnp

    marker(f"devices: {jax.devices()}")
    t0 = time.time()

    if stage == 6:
        tr, xb, yb = build(seq=1)
    else:
        tr, xb, yb = build(seq=2)
    marker(f"built; shapes {xb.shape} {yb.shape}")

    if stage == 1:
        tr.params, tr.opt_state, m = tr._jit_train_step(
            tr.params, tr.opt_state, xb, yb
        )
        out = m["loss"]
    elif stage in (2, 6):
        out = tr._jit_eval_step(tr.params, xb, yb)["loss"]
    elif stage == 3:
        @jax.jit
        def eval_grad(params, x, y):
            (loss, _), _ = jax.value_and_grad(
                lambda p: tr._forward_loss(p, x, y), has_aux=True
            )(params)
            return loss

        out = eval_grad(tr.params, xb, yb)
    elif stage == 4:
        out = tr._jit_eval_step(tr.params, xb[:8], yb[:8])["loss"]
    elif stage == 5:
        @jax.jit
        def apply_only(params, x):
            return jnp.mean(tr.model.apply(params, x))

        out = apply_only(tr.params, xb)
    elif stage == 7:
        S = tr.config.sequence_steps
        splice = tr.splice_fn

        @jax.jit
        def eval_noremat(params, x, y):
            def body(inp, k_and_y):
                k, y_k = k_and_y
                pred = tr.model.apply(params, inp)  # no jax.checkpoint
                return splice(inp, pred, k), tr.loss_fn(y_k, pred)

            ks = jnp.arange(S)
            _, losses = jax.lax.scan(
                body, x, (ks, jnp.moveaxis(y, 1, 0))
            )
            return jnp.mean(losses)

        out = eval_noremat(tr.params, xb, yb)
    elif stage == 8:
        S = tr.config.sequence_steps
        splice = tr.splice_fn

        @jax.jit
        def eval_mse(params, x, y):
            def body(inp, k_and_y):
                k, y_k = k_and_y
                pred = jax.checkpoint(
                    lambda i: tr.model.apply(params, i)
                )(inp)
                return splice(inp, pred, k), jnp.mean((y_k - pred) ** 2)

            ks = jnp.arange(S)
            _, losses = jax.lax.scan(
                body, x, (ks, jnp.moveaxis(y, 1, 0))
            )
            return jnp.mean(losses)

        out = eval_mse(tr.params, xb, yb)
    elif stage == 9:
        import jax as _jax

        out = _jax.jit(
            lambda p, x, y: tr._forward_loss_outer(p, x, y)[0]
        )(tr.params, xb, yb)
    else:
        raise SystemExit(f"unknown stage {stage}")

    jax.block_until_ready(out)
    val = float(np.asarray(out).ravel()[0])
    marker(f"stage {stage} OK value={val:.5f} ({time.time()-t0:.0f}s)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", type=int, required=True)
    args = p.parse_args()
    try:
        run_stage(args.stage)
    except Exception as e:
        marker(f"stage {args.stage} FAILED: {type(e).__name__}: "
               f"{str(e)[:160]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
