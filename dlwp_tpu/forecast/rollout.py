"""Autoregressive forecast orchestration.

The TPU-native ``TimeSeriesEstimator`` (reference
``DLWP/model/extensions.py:21-303``): drives multi-step autoregressive
forecasts when model inputs != outputs, reconciling input/output channel
selections, re-computing the insolation forcing channel for each new valid
time, and imputing input channels the model does not predict with the mean
state.

The reference loops on the host, calling ``model.predict`` per step and
re-indexing xarray coordinates (extensions.py:212-253, a device+host
round trip per step). Here the channel reconciliation is resolved at trace
time into static index maps, insolation is computed in-graph from scalar
day-of-year offsets (:mod:`dlwp_tpu.grid.insolation`), and the entire
rollout compiles to one ``lax.scan`` -- state never leaves the device.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.data.sampler import SeriesSampler
from dlwp_tpu.grid.insolation import day_of_year, insolation

SOL_CHANNEL = "SOL"  # reference name for the insolation channel (extensions.py:127)


@dataclasses.dataclass
class Forecast:
    """A labeled forecast array (f_hour, time, varlev, lat, lon) --
    plain-array stand-in for the reference's output DataArray
    (extensions.py:280-293)."""

    values: np.ndarray
    f_hour: np.ndarray  # hours since initialization
    times: np.ndarray  # (time,) datetime64 initialization times
    varlev: list[str]
    lat: np.ndarray
    lon: np.ndarray

    @property
    def shape(self):
        return self.values.shape

    def sel_varlev(self, name: str) -> np.ndarray:
        return self.values[:, :, self.varlev.index(name)]


class TimeSeriesEstimator:
    """Rollout driver for a model + sampler pair (extensions.py:28-134).

    Channel reconciliation: each input channel is sourced per step from
    (a) the model prediction, if the channel is among the outputs;
    (b) in-graph insolation, for the 'SOL' forcing channel;
    (c) the time-mean state, for channels the model cannot predict
        (imputation, extensions.py:231-233).
    """

    def __init__(self, model, sampler: SeriesSampler):
        if sampler._interval != 1:
            raise NotImplementedError(
                "TimeSeriesEstimator requires interval=1 (as the reference "
                "effectively does for iterated forecasts)"
            )
        self.model = model
        self.sampler = sampler
        self._in_ts = sampler._in_ts
        self._out_ts = sampler._out_ts
        in_names = list(sampler._input_names)
        if sampler._add_insolation:
            in_names = in_names + [SOL_CHANNEL]
        self._input_names = in_names
        self._output_names = list(sampler._output_names)
        out_pos = {n: j for j, n in enumerate(self._output_names)}
        # Static per-channel source map resolved once (vs. per-step xarray
        # coordinate reconciliation in extensions.py:244-253).
        self._sources = []
        for c, name in enumerate(in_names):
            if name == SOL_CHANNEL:
                self._sources.append(("sol", None))
            elif name in out_pos:
                self._sources.append(("pred", out_pos[name]))
            else:
                self._sources.append(("impute", c))
        data = sampler.data
        dts = np.diff(np.asarray(data.sample, dtype="datetime64[ns]"))
        if len(dts) and not (dts == dts[0]).all():
            raise ValueError("sample times must be evenly spaced")
        self._dt_hours = float(dts[0] / np.timedelta64(1, "h")) if len(dts) else 6.0
        self._lat = np.asarray(data.lat)
        self._lon = np.asarray(data.lon)

    # ------------------------------------------------------------------- API
    def predict(self, steps: int, samples=(), unscale: bool = False) -> Forecast:
        """Run ``steps`` model iterations (each producing out_ts time steps).

        Returns a Forecast of shape
        (steps * out_ts, n_samples, C_out, H, W); ``unscale`` applies the
        predictor file's stored mean/std to return physical units.
        """
        steps = int(steps)
        if steps < 1:
            raise ValueError("steps must be >= 1")
        s = self.sampler
        samples = (
            np.arange(s._n_sample) if len(samples) == 0 else np.asarray(samples)
        )
        p, _ = s.generate(samples, scale_and_impute=True)
        B = p.shape[0]
        H, W = self._lat.shape[0], self._lon.shape[0]
        C_in = len(self._input_names)
        x0 = jnp.asarray(p).reshape(B, self._in_ts, C_in, H, W)

        init_times = s.sample_times(samples)
        init_days = jnp.asarray(day_of_year(init_times))
        # Mean state for imputed channels (extensions.py:231-233).
        mean_state = jnp.asarray(
            np.asarray(x0).mean(axis=(0, 1))
        )  # (C_in, H, W)

        in_ts, out_ts = self._in_ts, self._out_ts
        dt_hours = self._dt_hours
        lat = jnp.asarray(self._lat)
        lon = jnp.asarray(self._lon)
        sources = self._sources
        is_recurrent = getattr(self.model, "is_recurrent", False)
        params = self.model.trainer.params
        apply_fn = self.model.trainer.model.apply
        n_out = len(self._output_names)

        def model_step(x):
            if is_recurrent:
                inp = x
            else:
                inp = x.reshape(B, in_ts * C_in, H, W)
            pred = apply_fn(params, inp)
            return pred.reshape(B, out_ts, n_out, H, W)

        def build_next(x, pred, it):
            # Valid-time day-of-year for each new step, per sample.
            k = jnp.arange(out_ts, dtype=x0.dtype)
            offsets = (it * out_ts + k + 1.0) * (dt_hours / 24.0)  # (out_ts,)
            days = init_days[:, None] + offsets[None, :]  # (B, out_ts)
            channels = []
            sol = None
            for kind, idx in sources:
                if kind == "pred":
                    channels.append(pred[:, :, idx])
                elif kind == "sol":
                    if sol is None:
                        sol = insolation(days.reshape(-1), lat, lon).reshape(
                            B, out_ts, H, W
                        )
                    channels.append(sol)
                else:
                    channels.append(
                        jnp.broadcast_to(
                            mean_state[idx], (B, out_ts, H, W)
                        )
                    )
            new = jnp.stack(channels, axis=2).astype(x.dtype)  # (B, out_ts, C_in, H, W)
            return jnp.concatenate([x, new], axis=1)[:, -in_ts:]

        def scan_body(x, it):
            pred = model_step(x)
            x_next = build_next(x, pred, it)
            return x_next, pred

        @jax.jit
        def rollout(x):
            _, preds = jax.lax.scan(
                scan_body, x, jnp.arange(steps, dtype=x0.dtype)
            )
            return preds  # (steps, B, out_ts, C_out, H, W)

        preds = np.asarray(rollout(x0))
        # (steps, B, out_ts, C, H, W) -> (steps*out_ts, B, C, H, W) f_hour-major
        preds = preds.transpose(0, 2, 1, 3, 4, 5).reshape(
            steps * out_ts, B, n_out, H, W
        )
        if unscale:
            out_idx = s.data.varlev_index(self._output_names)
            mean = s.data.mean[out_idx][:, None, None]
            std = s.data.std[out_idx][:, None, None]
            preds = preds * std + mean
        f_hour = (np.arange(steps * out_ts) + 1) * dt_hours
        return Forecast(
            values=preds,
            f_hour=f_hour,
            times=init_times,
            varlev=list(self._output_names),
            lat=self._lat,
            lon=self._lon,
        )
