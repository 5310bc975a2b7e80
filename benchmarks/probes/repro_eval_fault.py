"""Minimal repro for the round-3 TPU worker fault at first validation eval.

Round-3's paper-run attempt (canonical ConvLSTM + joint sequence loss,
examples/train_convlstm.py) crashed the remote TPU worker deterministically
the first time `Trainer.evaluate` ran -- i.e. on the FORWARD-ONLY
sequence-loss program -- while the fwd+bwd+Adam train step ran fine. This
probe isolates that: it builds the exact paper-run model/shapes, runs one
train step (expected OK), then one eval step (the suspected fault), then
the candidate workarounds, printing a marker between stages so the fault
point is unambiguous even when the process dies.

Stages (each preceded by a flushed marker):
  1. train_step        -- fwd+bwd+Adam, known good
  2. eval_step         -- forward-only sequence loss (the round-3 crash)
  3. eval_grad         -- same loss under value_and_grad, grads discarded
                          (program shape closer to the train step)
  4. eval_chunked      -- eval_step at batch 8 instead of 32

Run on TPU; do NOT override PYTHONPATH. A worker fault typically surfaces
as a tunnel-level error or a dead client, so run under `timeout` in a
detached shell.
"""

import sys
import time

import numpy as np


def marker(msg):
    print(f"=== {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dlwp_tpu.data import PredictorDataset, SeriesSampler
    from dlwp_tpu.models import DLWPNeuralNet

    marker(f"devices: {jax.devices()}")

    B, td, seq = 32, 2, 2
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
        sequence=seq, add_insolation=True, batch_size=B, shuffle=False,
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

    def splice_fn(inp, pred, k):
        return jnp.concatenate([pred, inp[:, :, out_c:]], axis=2)

    from dlwp_tpu.ops.losses import latitude_weighted_loss, mse

    dlwp.build_model(
        specs, loss=latitude_weighted_loss(mse, data.lat),
        optimizer=optax.adam(2e-3), sequence_steps=seq, splice_fn=splice_fn,
    )
    tr = dlwp.trainer
    xb, yb = sampler[0]
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)
    tr.init(xb)
    marker(f"built; batch shapes {xb.shape} {yb.shape}")

    # --- 1. train step (known good) ---------------------------------------
    marker("stage 1: train_step compile+run")
    t0 = time.time()
    tr.params, tr.opt_state, m = tr._jit_train_step(
        tr.params, tr.opt_state, xb, yb
    )  # donated buffers: reassign like Trainer.fit does
    jax.block_until_ready(m["loss"])
    marker(f"stage 1 OK loss={float(m['loss']):.5f} ({time.time()-t0:.0f}s)")

    # --- 2. forward-only eval step (the round-3 crash point) --------------
    marker("stage 2: eval_step compile+run")
    t0 = time.time()
    try:
        m = tr._jit_eval_step(tr.params, xb, yb)
        jax.block_until_ready(m["loss"])
        marker(f"stage 2 OK loss={float(m['loss']):.5f} "
               f"({time.time()-t0:.0f}s)")
    except Exception as e:
        marker(f"stage 2 FAILED: {type(e).__name__}: {e}")

    # --- 3. eval via value_and_grad, grads discarded -----------------------
    marker("stage 3: eval under value_and_grad")
    import jax as _jax

    @_jax.jit
    def eval_grad(params, x, y):
        (loss, _), _ = _jax.value_and_grad(
            lambda p: tr._forward_loss(p, x, y), has_aux=True
        )(params)
        return loss

    t0 = time.time()
    try:
        v = eval_grad(tr.params, xb, yb)
        jax.block_until_ready(v)
        marker(f"stage 3 OK loss={float(v):.5f} ({time.time()-t0:.0f}s)")
    except Exception as e:
        marker(f"stage 3 FAILED: {type(e).__name__}: {e}")

    # --- 4. chunked eval ----------------------------------------------------
    marker("stage 4: eval_step at batch 8")
    t0 = time.time()
    try:
        m = tr._jit_eval_step(tr.params, xb[:8], yb[:8])
        jax.block_until_ready(m["loss"])
        marker(f"stage 4 OK loss={float(m['loss']):.5f} "
               f"({time.time()-t0:.0f}s)")
    except Exception as e:
        marker(f"stage 4 FAILED: {type(e).__name__}: {e}")

    marker("done")


if __name__ == "__main__":
    sys.exit(main())
