"""Series sampler: predictor files -> device-ready training batches.

The workhorse data feeder, re-implementing the reference's
``SeriesDataGenerator`` (``DLWP/model/generators.py:323-629``) semantics:

- input/output varlev sub-selections (generators.py:399-411);
- independent input/output time-step counts;
- ``sequence=k``: targets are k consecutive multi-step groups for joint
  multi-step training (generators.py:554-579);
- ``interval`` stride between input end and target start
  (generators.py:557-558);
- precomputed insolation forcing channel per input time step
  (generators.py:416-423, 539-550);
- per-epoch shuffling, NaN-sample removal, model scaler/imputer application.

Index arithmetic matches the reference exactly:
  n_sample = N - in_ts - out_ts * seq + 2 - interval       (generators.py:388-391)
  inputs[i]  = series[i .. i+in_ts-1]
  targets[i, s, n] = series[i + in_ts + interval - 1 + out_ts*s + n]

The TPU-facing difference: :func:`device_prefetch` wraps the sampler in a
background thread that stages the next batch onto device (with an optional
``NamedSharding``) while the current step computes -- replacing the
reference's ``fit_generator(use_multiprocessing=True)`` worker pool
(examples/train.py:262-263).
"""

from __future__ import annotations

import queue
import threading
from typing import Sequence

import numpy as np
import jax

from dlwp_tpu.data.dataset import PredictorDataset
from dlwp_tpu.grid.insolation import day_of_year, insolation


class SeriesSampler:
    """Batched (input, target) sampler over a continuous series."""

    def __init__(
        self,
        data: PredictorDataset,
        model=None,
        input_sel: Sequence[str] | None = None,
        output_sel: Sequence[str] | None = None,
        input_time_steps: int = 1,
        output_time_steps: int = 1,
        sequence: int | None = None,
        interval: int = 1,
        add_insolation: bool = False,
        batch_size: int = 32,
        shuffle: bool = False,
        remove_nan: bool = True,
        is_convolutional: bool | None = None,
        is_recurrent: bool | None = None,
        seed: int = 0,
        dtype=np.float32,
    ):
        assert input_time_steps > 0 and output_time_steps > 0
        assert batch_size > 0 and interval > 0
        if sequence is not None:
            assert sequence > 0
        self.data = data
        self.model = model
        self._is_convolutional = (
            is_convolutional
            if is_convolutional is not None
            else getattr(model, "is_convolutional", True)
        )
        self._keep_time_axis = (
            is_recurrent
            if is_recurrent is not None
            else getattr(model, "is_recurrent", False)
        )
        self._impute = getattr(model, "impute", False)
        self._in_ts = int(input_time_steps)
        self._out_ts = int(output_time_steps)
        self._sequence = sequence
        self._interval = int(interval)
        self._batch_size = int(batch_size)
        self._shuffle = shuffle
        self._remove_nan = remove_nan
        self._rng = np.random.RandomState(seed)
        self._dtype = dtype

        # Series array: samples-format files use the last input time step
        # (generators.py:395-398).
        arr = data.predictors
        if data.has_time_step:
            arr = np.asarray(arr)[:, -1]
        self._series = arr  # (N, V, H, W), numpy or h5py

        seq = sequence if sequence is not None else 1
        N = self._series.shape[0]
        self._n_sample = N - self._in_ts - self._out_ts * seq + 2 - interval
        if self._n_sample <= 0:
            raise ValueError("series too short for requested configuration")

        all_varlev = data.varlev
        self._input_names = list(input_sel) if input_sel else list(all_varlev)
        self._output_names = list(output_sel) if output_sel else list(all_varlev)
        self._input_idx = data.varlev_index(self._input_names)
        self._output_idx = data.varlev_index(self._output_names)

        self._add_insolation = bool(add_insolation)
        if self._add_insolation:
            days = day_of_year(data.sample)
            self._insolation = np.asarray(
                insolation(days, data.lat, data.lon), dtype=dtype
            )
        else:
            self._insolation = None

        # Pre-drop NaN-contaminated windows (e.g. the restart-boundary
        # marker rows of barotropic archives) so every batch is full-size:
        # the per-batch removal in generate() would otherwise yield ragged
        # batch shapes, each of which is a separate jit compilation of the
        # train step (minutes per shape on a remote TPU) and -- under data
        # parallelism -- a dropped batch. One streaming NaN pass over the
        # series at construction; windows are validated with a cumulative
        # count, matching generate()'s joint input+target criterion.
        self._valid = None
        if self._remove_nan:
            N = self._series.shape[0]
            # NaN flags restricted to the SELECTED channels, separately for
            # inputs and targets: generate()'s joint criterion (matching
            # reference generators.py:563-565) only inspects the selected
            # input/output channels, so a NaN confined to an unselected
            # varlev must not invalidate a window.
            in_idx = np.asarray(self._input_idx)
            out_idx = np.asarray(self._output_idx)
            row_nan_in = np.zeros(N, dtype=np.int64)
            row_nan_out = np.zeros(N, dtype=np.int64)
            step = 4096
            for i in range(0, N, step):
                chunk = np.asarray(self._series[i : i + step])
                nan = np.isnan(chunk)
                row_nan_in[i : i + len(chunk)] = (
                    nan[:, in_idx].reshape(len(chunk), -1).any(axis=1)
                )
                row_nan_out[i : i + len(chunk)] = (
                    nan[:, out_idx].reshape(len(chunk), -1).any(axis=1)
                )
            if row_nan_in.any() or row_nan_out.any():
                cs_in = np.concatenate([[0], np.cumsum(row_nan_in)])
                cs_out = np.concatenate([[0], np.cumsum(row_nan_out)])
                idx = np.arange(self._n_sample)
                in_ok = (cs_in[idx + self._in_ts] - cs_in[idx]) == 0
                t0 = self._in_ts + self._interval - 1
                seq = self._sequence if self._sequence is not None else 1
                t1 = t0 + self._out_ts * seq
                out_ok = (cs_out[idx + t1] - cs_out[idx + t0]) == 0
                self._valid = idx[in_ok & out_ok]

        self.on_epoch_end()

    # --------------------------------------------------------------- shapes
    @property
    def shape(self) -> tuple[int, ...]:
        """(time_step, varlev, lat, lon) of inputs excluding insolation
        (generators.py:425-433)."""
        H, W = self._series.shape[-2:]
        return (self._in_ts, len(self._input_names), H, W)

    @property
    def n_features(self) -> int:
        t, c, h, w = self.shape
        return t * c * h * w + (t * h * w if self._add_insolation else 0)

    @property
    def convolution_shape(self) -> tuple[int, ...]:
        """Channels-first batch item shape (generators.py:451-462)."""
        t, c, h, w = self.shape
        c_eff = c + (1 if self._add_insolation else 0)
        if self._keep_time_axis:
            return (t, c_eff, h, w)
        return (t * c_eff, h, w)

    @property
    def output_shape(self) -> tuple[int, ...]:
        H, W = self._series.shape[-2:]
        return (self._out_ts, len(self._output_names), H, W)

    @property
    def output_convolution_shape(self) -> tuple[int, ...]:
        t, c, h, w = self.output_shape
        if self._keep_time_axis:
            return (t, c, h, w)
        return (t * c, h, w)

    @property
    def dense_shape(self) -> tuple[int, ...]:
        """Flattened item shape for dense models (generators.py:440-449)."""
        if self._keep_time_axis:
            return (self._in_ts, self.n_features // self._in_ts)
        return (self.n_features,)

    @property
    def sequence(self):
        return self._sequence

    # ---------------------------------------------------------------- epoch
    def on_epoch_end(self):
        self._indices = (
            self._valid.copy()
            if self._valid is not None
            else np.arange(self._n_sample)
        )
        if self._shuffle:
            self._rng.shuffle(self._indices)

    def __len__(self) -> int:
        n = len(self._valid) if self._valid is not None else self._n_sample
        return int(np.ceil(n / self._batch_size))

    # ------------------------------------------------------------- assembly
    def _gather(self, arr, samples: np.ndarray, offsets: range, chan_idx):
        """Stack time-shifted slices: (B, T, C_sel, H, W).

        Uses the native threaded gather (native/batch_assembler.c) for
        in-memory float32 series; falls back to numpy otherwise (lazy h5py
        datasets, other dtypes).
        """
        if (
            isinstance(arr, np.ndarray)
            and arr.dtype == np.float32
            and arr.flags.c_contiguous
        ):
            from dlwp_tpu.data.native import assemble

            return assemble(
                arr, samples, np.arange(offsets.start, offsets.stop),
                np.asarray(chan_idx),
            )
        def take(idx):
            if isinstance(arr, np.ndarray):
                return arr[idx]
            # h5py fancy indexing needs sorted unique indices: gather in
            # sorted order, then undo the permutation (and re-read
            # duplicates via the inverse map).
            order = np.argsort(idx, kind="stable")
            uniq, inverse = np.unique(idx[order], return_inverse=True)
            data = arr[uniq]
            return data[inverse][np.argsort(order, kind="stable")]

        taken = [
            np.asarray(take(samples + n))[:, chan_idx] for n in offsets
        ]
        return np.stack(taken, axis=1)

    def generate(self, samples=(), scale_and_impute: bool = True,
                 return_indices: bool = False):
        """Assemble (inputs, targets) for explicit sample indices (all
        samples if empty) -- reference ``generate`` (generators.py:529-605).

        With ``return_indices`` the sample indices that survived NaN-window
        removal are returned as a third element, so callers that align
        per-sample metadata (e.g. TimeSeriesEstimator's init times) stay
        consistent when boundary-marked archives drop windows.
        """
        samples = (
            np.arange(self._n_sample)
            if len(samples) == 0
            else np.asarray(samples, dtype=np.int64)
        )
        B = len(samples)
        p = self._gather(
            self._series, samples, range(self._in_ts), self._input_idx
        ).astype(self._dtype)

        if self._add_insolation:
            sol = np.stack(
                [self._insolation[samples + n] for n in range(self._in_ts)],
                axis=1,
            )[:, :, None]
            p = np.concatenate([p, sol], axis=2)

        t_start = self._in_ts + self._interval - 1
        seq = self._sequence if self._sequence is not None else 1
        targets = []
        for s in range(seq):
            t = self._gather(
                self._series,
                samples,
                range(t_start + self._out_ts * s, t_start + self._out_ts * (s + 1)),
                self._output_idx,
            ).astype(self._dtype)
            targets.append(t)

        # NaN removal across inputs and all targets jointly
        # (generators.py:563-565).
        if self._remove_nan:
            flat_p = p.reshape(B, -1)
            bad = np.isnan(flat_p).any(axis=1)
            for t in targets:
                bad |= np.isnan(t.reshape(B, -1)).any(axis=1)
            if bad.any():
                keep = ~bad
                samples = samples[keep]
                p = p[keep]
                targets = [t[keep] for t in targets]
                B = len(samples)

        if scale_and_impute and self.model is not None:
            if self._impute and getattr(self.model, "imputer", None) is not None:
                p = self.model.imputer_transform(p)
                targets = [self.model.imputer_transform(t) for t in targets]
            if getattr(self.model, "scaler", None) is not None:
                p = self.model.scaler_transform(p)
                targets = [self.model.scaler_y.transform(t) for t in targets]

        # Shape for the model (generators.py:572-577): convolutional models
        # get (C, H, W) items, dense models get flattened features
        # (the reference's dense_shape, generators.py:440-449).
        if self._is_convolutional:
            p = p.reshape((B,) + self.convolution_shape)
            targets = [
                t.reshape((B,) + self.output_convolution_shape)
                for t in targets
            ]
        elif self._keep_time_axis:
            p = p.reshape(B, self._in_ts, -1)
            targets = [t.reshape(B, self._out_ts, -1) for t in targets]
        else:
            p = p.reshape(B, -1)
            targets = [t.reshape(B, -1) for t in targets]
        if self._sequence is not None:
            y = np.stack(targets, axis=1)  # (B, S, ...)
        else:
            y = targets[0]
        if return_indices:
            return p, y, samples
        return p, y

    def __getitem__(self, index: int):
        if index < 0:
            index = len(self) + index
        if index >= len(self):
            raise IndexError
        sel = self._indices[
            index * self._batch_size : (index + 1) * self._batch_size
        ]
        return self.generate(sel)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
        self.on_epoch_end()

    def sample_times(self, samples=None) -> np.ndarray:
        """Forecast-initialization datetimes of the samples: the time of the
        last input step (matches the reference's sample coordinate
        convention)."""
        samples = (
            np.arange(self._n_sample) if samples is None else np.asarray(samples)
        )
        return self.data.sample[samples + self._in_ts - 1]


class SamplesSampler:
    """Batches straight from a samples-format file with explicit
    ``predictors`` and ``targets`` (the reference's simplest ``DataGenerator``,
    generators.py:19-159): NaN-sample removal, optional model
    scaler/imputer application, conv/recurrent shaping.

    ``SmartDataGenerator`` (generators.py:162-320, deprecated in the
    reference) reconstructed targets from a series to halve memory; use
    :class:`SeriesSampler` on a series-format file for that.
    """

    def __init__(
        self,
        data: PredictorDataset,
        model=None,
        batch_size: int = 32,
        shuffle: bool = False,
        remove_nan: bool = True,
        is_convolutional: bool | None = None,
        is_recurrent: bool | None = None,
        seed: int = 0,
    ):
        if data.targets is None:
            raise ValueError(
                "SamplesSampler requires a samples-format dataset with "
                "targets (generators.py:36-37)"
            )
        self.data = data
        self.model = model
        self._is_convolutional = (
            is_convolutional
            if is_convolutional is not None
            else getattr(model, "is_convolutional", True)
        )
        self._keep_time_axis = (
            is_recurrent
            if is_recurrent is not None
            else getattr(model, "is_recurrent", False)
        )
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._remove_nan = remove_nan
        self._rng = np.random.RandomState(seed)
        self._n_sample = data.predictors.shape[0]
        self.on_epoch_end()

    @property
    def convolution_shape(self):
        s = self.data.predictors.shape[1:]
        if len(s) == 4 and not self._keep_time_axis:
            return (s[0] * s[1],) + s[2:]
        return s

    def on_epoch_end(self):
        self._indices = np.arange(self._n_sample)
        if self._shuffle:
            self._rng.shuffle(self._indices)

    def __len__(self):
        return int(np.ceil(self._n_sample / self._batch_size))

    def generate(self, samples=(), scale_and_impute: bool = True):
        samples = (
            np.arange(self._n_sample)
            if len(samples) == 0
            else np.asarray(samples)
        )
        p = np.asarray(self.data.predictors)[samples]
        t = np.asarray(self.data.targets)[samples]
        if self._remove_nan:
            keep = ~(
                np.isnan(p.reshape(len(p), -1)).any(axis=1)
                | np.isnan(t.reshape(len(t), -1)).any(axis=1)
            )
            p, t = p[keep], t[keep]
        if scale_and_impute and self.model is not None:
            if getattr(self.model, "impute", False) and self.model.imputer:
                p, t = self.model.imputer_transform(p, t)
            if getattr(self.model, "scaler", None) is not None:
                p, t = self.model.scaler_transform(p, t)
        if not self._keep_time_axis and p.ndim == 5:
            p = p.reshape((len(p), -1) + p.shape[3:])
            t = t.reshape((len(t), -1) + t.shape[3:])
        return p, t

    def __getitem__(self, index):
        if index < 0:
            index = len(self) + index
        if index >= len(self):
            raise IndexError
        sel = self._indices[
            index * self._batch_size : (index + 1) * self._batch_size
        ]
        return self.generate(sel)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
        self.on_epoch_end()


def device_prefetch(sampler, sharding=None, depth: int = 2):
    """Iterate a sampler with background host->device staging.

    A producer thread assembles numpy batches and ``jax.device_put``s them
    (optionally with a NamedSharding for data parallelism) ``depth`` batches
    ahead, so device upload overlaps compute. Replaces the reference's
    multiprocessing generator workers (SURVEY.md section 2.5).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()

    def produce():
        try:
            for batch in sampler:
                put = jax.tree.map(
                    lambda a: jax.device_put(a, sharding)
                    if sharding is not None
                    else jax.device_put(a),
                    batch,
                )
                q.put(put)
        finally:
            q.put(stop)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
    thread.join()
