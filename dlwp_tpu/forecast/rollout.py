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
from dlwp_tpu.grid.insolation import (
    day_of_year,
    insolation_from_tables,
    insolation_tables,
)

SOL_CHANNEL = "SOL"  # reference name for the insolation channel (extensions.py:127)
# Rollouts precompute the whole (steps, B, in_ts, H, W) insolation forcing
# outside the scan when it fits this many bytes (measured ~3x cheaper per
# step than the in-scan contraction, BASELINE.md round 4); above it the
# forcing is computed per step inside the scan.
SOL_PRECOMPUTE_BUDGET = 1 << 30  # 1 GiB


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

    def __init__(self, model, sampler: SeriesSampler, gate_dtype=None):
        """``gate_dtype``: serving-precision override for ConvLSTM2D gate
        chains — e.g. ``'bfloat16'`` rebuilds the model's layer specs
        with ``ConvLSTM2D(gate_dtype=bfloat16)`` (weights unchanged).
        Measured decision data (BASELINE.md round 5, paper-2 model):
        +26% apply throughput; paired-rollout trajectory deviation
        0.6 m @6 h → 2.1 m @72 h of Z500, a ≤0.7% quadrature addition
        to the model's own 5.4→44 m RMSE — recommended for serving
        deployments. Default ``None`` keeps the as-trained dtype so
        scoring paths (validate.py) measure the model as trained."""
        if gate_dtype is not None and getattr(model, "layer_specs", None):
            import copy

            import jax.numpy as jnp

            gd = getattr(jnp, gate_dtype) if isinstance(gate_dtype, str) else gate_dtype
            specs = []
            for spec in model.layer_specs:
                name, a, kw = spec[0], spec[1], dict(spec[2] or {})
                if name == "ConvLSTM2D":
                    kw["gate_dtype"] = gd
                specs.append((name, a, kw))
            params = model.trainer.params
            # Rebuild on a shallow COPY: build_model replaces
            # layer_specs/base_model/trainer wholesale, so the copy gets
            # the bf16-gate stack while the caller's model keeps its
            # as-trained dtype (and its original Trainer/config) — a
            # serving estimator must not silently flip the model that
            # scoring paths (validate.py) keep using.
            served = copy.copy(model)
            seq = getattr(
                getattr(model, "_train_config", None), "sequence_steps", 1
            )
            served.build_model(specs, sequence_steps=seq)
            served.trainer.params = params
            model = served
        self.model = model
        self.sampler = sampler
        self._k = int(sampler._interval)
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
    def _advance(self, prefer_first_times: bool = True) -> int:
        """Data steps the input window advances per model iteration
        (extensions.py:160-172)."""
        in_ts, out_ts = self._in_ts, self._out_ts
        if out_ts <= in_ts:
            es = out_ts
        else:
            es = in_ts if prefer_first_times else out_ts
        return es + self._k - 1

    def prepare_inputs(self, samples=()):
        """Assemble the rollout's device inputs from the sampler.

        Returns ``(x0, init_days, mean_state, init_times)``: the scaled
        initial window (B, in_ts, C_in, H, W), per-sample fractional
        day-of-year at initialization, the time-mean state used for imputed
        channels (extensions.py:231-233), and the datetime64 init times.
        """
        s = self.sampler
        samples = (
            np.arange(s._n_sample) if len(samples) == 0 else np.asarray(samples)
        )
        # NaN-window removal may drop samples (e.g. restart-boundary
        # markers in barotropic archives); keep init times aligned with
        # the surviving windows.
        p, _, kept = s.generate(
            samples, scale_and_impute=True, return_indices=True
        )
        B = p.shape[0]
        H, W = self._lat.shape[0], self._lon.shape[0]
        C_in = len(self._input_names)
        x0 = jnp.asarray(p).reshape(B, self._in_ts, C_in, H, W)
        init_times = s.sample_times(kept)
        init_days = jnp.asarray(day_of_year(init_times))
        mean_state = jnp.asarray(np.asarray(x0).mean(axis=(0, 1)))
        return x0, init_days, mean_state, init_times

    def rollout_fn(
        self,
        steps: int,
        prefer_first_times: bool = True,
        forward_safe: bool = False,
    ):
        """Build the jitted product rollout program.

        Returns ``rollout(x0, init_days, mean_state) ->
        (steps, B, out_ts, C_out, H, W)`` -- one ``lax.scan`` whose body
        applies the model, recomputes the insolation forcing for each new
        valid time in-graph, and splices predictions/previous-window/imputed
        channels per the static source map. This is the exact program
        :meth:`predict` executes (and what ``bench.py`` measures); all
        shapes derive from the arguments at trace time.

        ``forward_safe=True`` lowers the rollout under
        :func:`dlwp_tpu.utils.compile_forward_safe` (backward pass built and
        discarded): the escape hatch for forward-only programs that compile
        pathologically slowly or fault on TPU (docs/DEPLOY.md
        "Forward-only programs on TPU"). Off by default — the standard
        rollout compiles fine; the known-bad shape is a weighted loss
        reduction inside a forward-only scan.
        """
        steps = int(steps)
        if steps < 1:
            raise ValueError("steps must be >= 1")
        in_ts, out_ts = self._in_ts, self._out_ts
        k = self._k
        dt_hours = self._dt_hours
        # Insolation enters the scan in factored form: three static
        # (H, W) basis fields contracted with per-step day scalars --
        # O(B) transcendentals + one (B*in_ts, 3)x(3, H*W) matmul per
        # step instead of a full transcendental field per grid point
        # (the reference recomputes the field on the host each step,
        # extensions.py:236-240).
        sol_tables = jnp.asarray(insolation_tables(self._lat, self._lon))
        H, W = self._lat.shape[0], self._lon.shape[0]
        C_in = len(self._input_names)
        sources = self._sources
        is_recurrent = getattr(self.model, "is_recurrent", False)
        params = self.model.trainer.params
        apply_fn = self.model.trainer.model.apply
        n_out = len(self._output_names)
        adv = self._advance(prefer_first_times)

        # Static source map per next-window slot m:
        #   predicted output index j(m) (or None), previous-window slot
        #   m + adv (or None if out of range).
        def out_index(m):
            j = m - in_ts + out_ts if out_ts <= in_ts else (
                m if prefer_first_times else m + out_ts - in_ts
            )
            return j if 0 <= j < out_ts else None

        slot_plan = []
        for m in range(in_ts):
            j = out_index(m)
            prev = m + adv if (j is None and m + adv < in_ts) else None
            slot_plan.append((j, prev))

        def model_step(x):
            B = x.shape[0]
            if is_recurrent:
                inp = x
            else:
                inp = x.reshape(B, in_ts * C_in, H, W)
            pred = apply_fn(params, inp)
            return pred.reshape(B, out_ts, n_out, H, W)

        needs_sol = any(kind == "sol" for kind, _ in sources)

        def step_sol(x, it, init_days):
            """Per-step next-window insolation (B, in_ts, H, W) from the
            factored tables."""
            B = x.shape[0]
            # Day-of-year of next-window slot m, relative to the init time
            # (the last input step of window 0): raw offset
            # (it+1)*adv + m - (in_ts - 1).
            m_idx = jnp.arange(in_ts, dtype=x.dtype)
            offs = (
                ((it + 1.0) * adv + m_idx - (in_ts - 1.0)) * (dt_hours / 24.0)
            )
            days = init_days[:, None] + offs[None, :]  # (B, in_ts)
            return insolation_from_tables(
                days.reshape(-1), sol_tables
            ).reshape(B, in_ts, H, W)

        def build_next(x, pred, sol, mean_state):
            B = x.shape[0]
            # Flat channel-major assembly: ONE stack materializes x_next
            # (prefix-timed on v5e: the slot-stack-of-channel-stacks form
            # cost ~66 us/step extra at the headline configuration,
            # BASELINE.md round 4).
            flat = []
            for m, (j, prev) in enumerate(slot_plan):
                for c, (kind, idx) in enumerate(sources):
                    if kind == "sol":
                        flat.append(sol[:, m])
                    elif kind == "pred" and j is not None:
                        flat.append(pred[:, j, idx])
                    elif prev is not None:
                        flat.append(x[:, prev, c])
                    else:
                        flat.append(
                            jnp.broadcast_to(mean_state[c], (B, H, W))
                        )
            return (
                jnp.stack(flat, axis=1)
                .reshape(B, in_ts, C_in, H, W)
                .astype(x.dtype)
            )

        # Insolation placement: the per-step factored contraction costs
        # ~50 us/step at the headline configuration; precomputing the
        # whole (steps, B, in_ts, H, W) forcing outside the scan and
        # feeding it as a scan input costs one HBM read of the slice
        # (~15 us/step measured) instead. Gate on memory so huge step
        # counts / batches fall back to in-scan compute.
        sol_budget = SOL_PRECOMPUTE_BUDGET

        def rollout(x0, init_days, mean_state):
            B = x0.shape[0]
            its = jnp.arange(steps, dtype=x0.dtype)
            precompute = (
                needs_sol
                and steps * B * in_ts * H * W * 4 <= sol_budget
            )
            if precompute:
                sol_all = jax.vmap(
                    lambda it: step_sol(x0, it, init_days)
                )(its)
                xs = (its, sol_all)
            else:
                xs = (its, None)

            def scan_body(x, inp):
                it, sol = inp
                pred = model_step(x)
                if needs_sol and sol is None:
                    sol = step_sol(x, it, init_days)
                x_next = build_next(x, pred, sol, mean_state)
                return x_next, pred

            _, preds = jax.lax.scan(scan_body, x0, xs)
            return preds  # (steps, B, out_ts, C_out, H, W)

        if forward_safe:
            from dlwp_tpu.utils.compile_safe import compile_forward_safe

            return jax.jit(compile_forward_safe(rollout))
        return jax.jit(rollout)

    def predict(
        self,
        steps: int,
        samples=(),
        unscale: bool = False,
        prefer_first_times: bool = True,
        init_batch_size: int | None = None,
    ) -> Forecast:
        """Run ``steps`` model iterations (each producing out_ts time steps).

        Returns a Forecast of shape
        (steps * out_ts, n_samples, C_out, H, W); ``unscale`` applies the
        predictor file's stored mean/std to return physical units.

        Window advance follows the reference (extensions.py:160-172,
        220-253): per iteration the input window shifts forward by
        ``es + interval - 1`` data steps, where ``es = out_ts`` when
        ``out_ts <= in_ts`` (kept inputs slide), else ``es = in_ts``
        (``prefer_first_times``: seed the next window from the first in_ts
        predicted times) or ``es = out_ts`` (from the last in_ts). Each next
        window slot is sourced from the prediction when that (channel, time)
        was predicted, from the previous window where it overlaps, from
        freshly computed insolation for 'SOL', and from the mean state
        otherwise (extensions.py:231-233).

        ``init_batch_size`` chunks the init times through the same compiled
        rollout program (final chunk padded to the compiled shape), bounding
        device memory for large validation sets -- the behavior the
        reference gets from Keras ``predict``'s internal batching.
        """
        steps = int(steps)
        if steps < 1:
            raise ValueError("steps must be >= 1")
        x0, init_days, mean_state, init_times = self.prepare_inputs(samples)
        rollout = self.rollout_fn(steps, prefer_first_times)
        n_init = x0.shape[0]
        if init_batch_size and init_batch_size < n_init:
            bs = int(init_batch_size)
            chunks = []
            for i in range(0, n_init, bs):
                xc, dc = x0[i : i + bs], init_days[i : i + bs]
                nb = xc.shape[0]
                if nb < bs:  # pad: reuse the compiled fixed-shape program
                    reps = [1] * (xc.ndim - 1)
                    xc = jnp.concatenate(
                        [xc, jnp.tile(xc[-1:], [bs - nb] + reps)], axis=0
                    )
                    dc = jnp.concatenate(
                        [dc, jnp.tile(dc[-1:], [bs - nb])], axis=0
                    )
                out = rollout(xc, dc, mean_state)
                chunks.append(np.asarray(out[:, :nb]))
            preds = np.concatenate(chunks, axis=1)
        else:
            preds = np.asarray(rollout(x0, init_days, mean_state))
        in_ts, out_ts, k = self._in_ts, self._out_ts, self._k
        dt_hours = self._dt_hours
        B = x0.shape[0]
        H, W = self._lat.shape[0], self._lon.shape[0]
        n_out = len(self._output_names)
        adv = self._advance(prefer_first_times)
        s = self.sampler
        # (steps, B, out_ts, C, H, W) -> (steps*out_ts, B, C, H, W) f_hour-major
        preds = preds.transpose(0, 2, 1, 3, 4, 5).reshape(
            steps * out_ts, B, n_out, H, W
        )
        if unscale:
            out_idx = s.data.varlev_index(self._output_names)
            mean = s.data.mean[out_idx][:, None, None]
            std = s.data.std[out_idx][:, None, None]
            preds = preds * std + mean
        # f_hour of output (it, j): window start it*adv, first output at
        # raw offset in_ts + k - 1 + j; relative to init time in_ts - 1.
        its = np.repeat(np.arange(steps), out_ts)
        js = np.tile(np.arange(out_ts), steps)
        f_hour = (its * adv + k + js) * dt_hours
        return Forecast(
            values=preds,
            f_hour=f_hour,
            times=init_times,
            varlev=list(self._output_names),
            lat=self._lat,
            lon=self._lon,
        )
