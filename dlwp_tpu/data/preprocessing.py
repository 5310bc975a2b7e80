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
    ) -> PredictorDataset:
        """Continuous-series predictor data (preprocessing.py:442-789).

        Returns a :class:`PredictorDataset` with dims
        (sample, varlev, lat, lon); per-varlev mean/std are computed by
        streaming batches and, if ``scale_variables``, applied as
        (x - mean) / std with the statistics stored in the file.
        """
        names = _varlev_names(variables, levels, pairwise)
        times = np.asarray(self.source.times)
        lat = np.asarray(self.source.lat)
        lon = np.asarray(self.source.lon)
        n = len(times)
        nv = len(names)

        pred = np.empty((n, nv, lat.shape[0], lon.shape[0]), dtype=dtype)
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

        self.data = PredictorDataset(
            predictors=pred,
            sample=times.astype("datetime64[ns]"),
            varlev=[nm for _, _, nm in names],
            lat=lat,
            lon=lon,
            mean=mean,
            std=std,
            attrs={
                "scaling": "True" if scale_variables else "False",
                "format": "series",
            },
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
    ) -> PredictorDataset:
        """Samples-format predictor/target pairs (preprocessing.py:63-440):
        dims (sample, time_step, varlev, lat, lon); sample i holds inputs at
        times [i .. i+T-1] and targets at [i+T .. i+2T-1], sample datetime
        assigned from the last input step (generators.py:395-398)."""
        series = self.data_to_series(
            variables, levels, pairwise, scale_variables, batch_samples, dtype
        )
        arr = np.asarray(series.predictors)
        T = int(time_steps)
        n = arr.shape[0] - 2 * T + 1
        if n <= 0:
            raise ValueError("not enough samples for requested time_steps")
        pred = np.stack([arr[i : i + n] for i in range(T)], axis=1)
        targ = np.stack([arr[i + T : i + T + n] for i in range(T)], axis=1)
        self.data = PredictorDataset(
            predictors=pred.astype(dtype),
            targets=targ.astype(dtype),
            sample=series.sample[T - 1 : T - 1 + n],
            varlev=series.varlev,
            lat=series.lat,
            lon=series.lon,
            mean=series.mean,
            std=series.std,
            attrs={"scaling": series.attrs["scaling"], "format": "samples"},
        )
        return self.data

    def to_file(self, path: str) -> None:
        if self.data is None:
            raise RuntimeError("run data_to_series/data_to_samples first")
        self.data.to_file(path)
