"""Device-resident training-loop measurement (VERDICT round-2 item 4).

Compares three epoch drivers on the fused flagship tower (fp32, batch 64,
lat-weighted loss, fwd+bwd+Adam -- the BASELINE.md training configuration):

1. ``Trainer.fit`` fed by the host :class:`SeriesSampler` (per-batch numpy
   gather + host->device transfer + per-step dispatch);
2. ``Trainer.fit`` fed by :class:`DeviceSeriesSampler` (on-device gather,
   no host copies, but still one Python dispatch per step);
3. ``Trainer.fit_device`` (SURVEY.md section 3.1's endgame: the whole epoch
   is ONE jitted ``lax.scan`` whose body gathers the batch in HBM and
   applies the train step -- per-epoch host traffic is an int32 index
   upload and a scalar metric download).

Timing is per-epoch wall clock after a warmup epoch (compile excluded);
steps/s = batches/epoch / epoch seconds.

Run on TPU: do NOT override PYTHONPATH (axon site).
"""

import time

import numpy as np
import jax

from dlwp_tpu.data import DeviceSeriesSampler, PredictorDataset, SeriesSampler
from dlwp_tpu.models import DLWPNeuralNet
from dlwp_tpu.ops.losses import latitude_weighted_loss, mse
from __graft_entry__ import _tower_specs

B, H, W = 64, 36, 144
N = 4096 + 8  # series length -> 64 full batches of 64


def build(data):
    dlwp = DLWPNeuralNet(time_dim=2, scaler_type=None)
    dlwp.build_model(
        _tower_specs(4),
        loss=latitude_weighted_loss(mse, data.lat),
        optimizer="adam",
    )
    return dlwp


def make_data():
    rng = np.random.RandomState(0)
    c = 2
    return PredictorDataset(
        predictors=rng.randn(N, c, H, W).astype(np.float32),
        sample=(np.datetime64("2007-01-01")
                + np.arange(N) * np.timedelta64(6, "h")),
        varlev=["HGT/500", "THICK/300-700"],
        lat=np.linspace(87.5, 0.0, H),
        lon=np.arange(W) * (360.0 / W),
        mean=np.zeros(c, np.float32),
        std=np.ones(c, np.float32),
    )


def epoch_rate(fit_call, n_batches, warm=1, epochs=2):
    fit_call(warm)  # compile + warmup epochs
    t0 = time.perf_counter()
    fit_call(epochs)
    dt = (time.perf_counter() - t0) / epochs
    return n_batches / dt, dt


def main():
    data = make_data()

    # -- host-fed SeriesSampler --------------------------------------------
    dlwp = build(data)
    host = SeriesSampler(
        data, model=dlwp, input_time_steps=2, output_time_steps=2,
        add_insolation=True, batch_size=B, shuffle=True, seed=0,
    )
    x0, _ = host.generate(np.arange(1), scale_and_impute=True)
    dlwp.trainer.init(jax.numpy.asarray(x0))
    nb = len(host)
    r, dt = epoch_rate(
        lambda e: dlwp.trainer.fit(generator=host, epochs=e, verbose=False),
        nb,
    )
    print(f"fit + SeriesSampler (host gather):   {r:7.1f} steps/s "
          f"({r*B:7.0f} samples/s, {dt:.2f} s/epoch, {nb} batches)",
          flush=True)

    # -- host-dispatched fit over DeviceSeriesSampler ----------------------
    # (fit() auto-routes a DeviceSeriesSampler to fit_device; hide the
    # _gather_impl marker to measure the per-batch-dispatch path.)
    class PerBatch:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            return iter(self.inner)

    dlwp2 = build(data)
    dev = DeviceSeriesSampler(SeriesSampler(
        data, model=dlwp2, input_time_steps=2, output_time_steps=2,
        add_insolation=True, batch_size=B, shuffle=True, seed=0,
    ))
    xb, _ = dev[0]
    dlwp2.trainer.init(xb)
    nb = len(dev)
    r, dt = epoch_rate(
        lambda e: dlwp2.trainer.fit(
            generator=PerBatch(dev), epochs=e, verbose=False
        ),
        nb,
    )
    print(f"fit + DeviceSeriesSampler:           {r:7.1f} steps/s "
          f"({r*B:7.0f} samples/s, {dt:.2f} s/epoch)", flush=True)

    # -- fit_device: one jitted scan per epoch -----------------------------
    dlwp3 = build(data)
    dev3 = DeviceSeriesSampler(SeriesSampler(
        data, model=dlwp3, input_time_steps=2, output_time_steps=2,
        add_insolation=True, batch_size=B, shuffle=True, seed=0,
    ))
    xb, _ = dev3[0]
    dlwp3.trainer.init(xb)
    nb = len(dev3)
    r, dt = epoch_rate(
        lambda e: dlwp3.trainer.fit_device(dev3, epochs=e, verbose=False),
        nb,
    )
    print(f"fit_device (one scan per epoch):     {r:7.1f} steps/s "
          f"({r*B:7.0f} samples/s, {dt:.2f} s/epoch)", flush=True)


if __name__ == "__main__":
    main()
