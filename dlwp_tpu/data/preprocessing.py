"""Preprocessing: raw gridded data -> trainable predictor files.

Equivalent of the reference ``Preprocessor`` (``DLWP/model/preprocessing.py:
22-823``) with its two output modes:

- :meth:`Preprocessor.data_to_series` (preprocessing.py:442): a single
  continuous ``predictors`` series with dims (sample, varlev, lat, lon) --
  the preferred format for :class:`~dlwp_tpu.data.sampler.SeriesSampler`;
- :meth:`Preprocessor.data_to_samples` (preprocessing.py:63): explicit
  (predictors, targets) pairs with a ``time_step`` dimension.

Both flatten (variable, level) pairs into a ``varlev`` coordinate
(preprocessing.py:109-128), de-mean/scale per varlev storing ``mean``/``std``
in the file (preprocessing.py:259-265), and stream in sample batches so
arbitrarily long series never fully materialize
(``mean_by_batch``/``std_by_batch``, preprocessing.py:826-865).

The input is any *data source* implementing the small protocol below
(``times``/``lat``/``lon`` properties and ``field(variable, level)``),
satisfied by the CFS/ERA5 readers in :mod:`dlwp_tpu.data` and trivially by
in-memory test sources.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import numpy as np

from dlwp_tpu.data.dataset import PredictorDataset


class DataSource(Protocol):
    @property
    def times(self) -> np.ndarray: ...  # (t,) datetime64

    @property
    def lat(self) -> np.ndarray: ...

    @property
    def lon(self) -> np.ndarray: ...

    def field(self, variable: str, level: int | str | None) -> np.ndarray:
        """Return the (time, lat, lon) array for one variable/level."""
        ...


def streaming_mean_std(
    get_batch, n_samples: int, batch: int = 1000
) -> tuple[float, float]:
    """Two-pass streaming mean/std over sample batches
    (reference mean_by_batch / std_by_batch, preprocessing.py:826-865)."""
    total = 0.0
    count = 0
    for i in range(0, n_samples, batch):
        x = np.asarray(get_batch(i, min(i + batch, n_samples)), dtype=np.float64)
        total += np.nansum(x)
        count += np.sum(~np.isnan(x))
    mean = total / max(count, 1)
    var = 0.0
    for i in range(0, n_samples, batch):
        x = np.asarray(get_batch(i, min(i + batch, n_samples)), dtype=np.float64)
        var += np.nansum((x - mean) ** 2)
    std = np.sqrt(var / max(count, 1))
    return float(mean), float(std)


def _varlev_names(
    variables: Sequence[str],
    levels: Sequence,
    pairwise: bool,
) -> list[tuple[str, object, str]]:
    """Build the flattened (variable, level, 'VAR/level') list.

    ``pairwise`` zips variables with levels; otherwise the product is taken.
    Variables without levels (level None/0) get a bare name -- the
    reference's auto-switch when variables lack levels
    (preprocessing.py:109-128).
    """
    out = []
    if pairwise:
        if len(variables) != len(levels):
            raise ValueError("pairwise requires equal-length variables/levels")
        pairs = zip(variables, levels)
    else:
        pairs = ((v, l) for v in variables for l in levels)
    for v, l in pairs:
        if l in (None, 0, ""):
            out.append((v, None, str(v)))
        else:
            out.append((v, l, f"{v}/{l}"))
    return out


class Preprocessor:
    """Build predictor files from a data source."""

    def __init__(self, source: DataSource):
        self.source = source
        self.data: PredictorDataset | None = None

    # ------------------------------------------------------------- series
    def data_to_series(
        self,
        variables: Sequence[str],
        levels: Sequence,
        pairwise: bool = False,
        scale_variables: bool = True,
        batch_samples: int = 1000,
        dtype=np.float32,
        output_file: str | None = None,
    ) -> PredictorDataset:
        """Continuous-series predictor data (preprocessing.py:442-789).

        Returns a :class:`PredictorDataset` with dims
        (sample, varlev, lat, lon); per-varlev mean/std are computed by
        streaming batches and, if ``scale_variables``, applied as
        (x - mean) / std with the statistics stored in the file.

        With ``output_file``, scaled batches stream straight to a chunked
        HDF5 file and the returned dataset is lazily backed by it -- host
        memory stays O(batch_samples) no matter how long the series is (the
        reference's batched chunked-netCDF writes,
        preprocessing.py:224-239, 637-695). Without it, the series builds
        in memory.
        """
        names = _varlev_names(variables, levels, pairwise)
        times = np.asarray(self.source.times)
        lat = np.asarray(self.source.lat)
        lon = np.asarray(self.source.lon)
        n = len(times)
        nv = len(names)
        shape = (n, nv, lat.shape[0], lon.shape[0])
        attrs = {
            "scaling": "True" if scale_variables else "False",
            "format": "series",
        }

        if output_file is not None:
            import h5py

            sink = h5py.File(output_file, "w")
            # One chunk per (batch, varlev) write below: every chunk is
            # written exactly once, so writes never read-modify-write.
            pred = sink.create_dataset(
                "predictors",
                shape=shape,
                dtype=dtype,
                chunks=(min(batch_samples, n), 1) + shape[2:],
            )
        else:
            sink = None
            pred = np.empty(shape, dtype=dtype)
        mean = np.empty(nv)
        std = np.empty(nv)
        for j, (v, l, _) in enumerate(names):
            field = self.source.field(v, l)
            m, s = streaming_mean_std(
                lambda a, b: field[a:b], n, batch_samples
            )
            mean[j], std[j] = m, (s if s > 0 else 1.0)
            for i in range(0, n, batch_samples):
                chunk = np.asarray(field[i : i + batch_samples], dtype=np.float64)
                if scale_variables:
                    chunk = (chunk - mean[j]) / std[j]
                pred[i : i + batch_samples, j] = chunk.astype(dtype)

        if sink is not None:
            sink.create_dataset(
                "sample", data=times.astype("datetime64[ns]").astype(np.int64)
            )
            sink.create_dataset(
                "varlev", data=np.array([nm.encode() for _, _, nm in names])
            )
            sink.create_dataset("lat", data=lat)
            sink.create_dataset("lon", data=lon)
            sink.create_dataset("mean", data=mean)
            sink.create_dataset("std", data=std)
            for k, val in attrs.items():
                sink.attrs[k] = val
            sink.close()
            self.data = PredictorDataset.from_file(output_file, load="lazy")
            return self.data

        self.data = PredictorDataset(
            predictors=pred,
            sample=times.astype("datetime64[ns]"),
            varlev=[nm for _, _, nm in names],
            lat=lat,
            lon=lon,
            mean=mean,
            std=std,
            attrs=attrs,
        )
        return self.data

    # ------------------------------------------------------------- samples
    def data_to_samples(
        self,
        variables: Sequence[str],
        levels: Sequence,
        time_steps: int = 1,
        pairwise: bool = False,
        scale_variables: bool = True,
        batch_samples: int = 1000,
        dtype=np.float32,
        output_file: str | None = None,
    ) -> PredictorDataset:
        """Samples-format predictor/target pairs (preprocessing.py:63-440):
        dims (sample, time_step, varlev, lat, lon); sample i holds inputs at
        times [i .. i+T-1] and targets at [i+T .. i+2T-1], sample datetime
        assigned from the last input step (generators.py:395-398).

        With ``output_file``, both the intermediate series (written to
        ``output_file + '.series'``) and the stacked samples stream through
        disk in O(batch_samples) memory.
        """
        series_file = None if output_file is None else output_file + ".series"
        series = self.data_to_series(
            variables, levels, pairwise, scale_variables, batch_samples,
            dtype, output_file=series_file,
        )
        arr = series.predictors  # numpy, or lazy h5py when streaming
        T = int(time_steps)
        n = arr.shape[0] - 2 * T + 1
        if n <= 0:
            if series_file is not None:
                series.close()
                import os

                os.remove(series_file)
            raise ValueError("not enough samples for requested time_steps")
        out_shape = (n, T) + tuple(arr.shape[1:])
        if output_file is not None:
            import h5py

            sink = h5py.File(output_file, "w")
            chunk = (min(batch_samples, n), 1) + tuple(arr.shape[1:])
            pred = sink.create_dataset(
                "predictors", shape=out_shape, dtype=dtype, chunks=chunk
            )
            targ = sink.create_dataset(
                "targets", shape=out_shape, dtype=dtype, chunks=chunk
            )
        else:
            sink = None
            pred = np.empty(out_shape, dtype=dtype)
            targ = np.empty(out_shape, dtype=dtype)
        for i in range(0, n, batch_samples):
            b = min(i + batch_samples, n) - i
            for t in range(T):
                pred[i : i + b, t] = arr[i + t : i + t + b]
                targ[i : i + b, t] = arr[i + T + t : i + T + t + b]
        sample_times = series.sample[T - 1 : T - 1 + n]
        attrs = {"scaling": series.attrs["scaling"], "format": "samples"}
        if sink is not None:
            sink.create_dataset(
                "sample",
                data=sample_times.astype("datetime64[ns]").astype(np.int64),
            )
            sink.create_dataset(
                "varlev", data=np.array([v.encode() for v in series.varlev])
            )
            sink.create_dataset("lat", data=np.asarray(series.lat))
            sink.create_dataset("lon", data=np.asarray(series.lon))
            sink.create_dataset("mean", data=np.asarray(series.mean))
            sink.create_dataset("std", data=np.asarray(series.std))
            for k, val in attrs.items():
                sink.attrs[k] = val
            sink.close()
            series.close()
            self.data = PredictorDataset.from_file(output_file, load="lazy")
            return self.data
        self.data = PredictorDataset(
            predictors=pred,
            targets=targ,
            sample=sample_times,
            varlev=series.varlev,
            lat=series.lat,
            lon=series.lon,
            mean=series.mean,
            std=series.std,
            attrs=attrs,
        )
        return self.data

    def to_file(self, path: str) -> None:
        if self.data is None:
            raise RuntimeError("run data_to_series/data_to_samples first")
        self.data.to_file(path)
