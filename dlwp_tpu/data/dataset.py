"""The predictor-file format: the framework's training data container.

Logical schema mirrors the reference's netCDF "predictor files"
(``DLWP/model/preprocessing.py:596-608``): a ``predictors`` array with dims
``(sample, [time_step,] varlev, lat, lon)``, per-varlev ``mean``/``std``
scaling statistics stored alongside, and coordinate vectors. The physical
format here is HDF5 via h5py (xarray/netCDF4 are optional in this
environment); a gated netCDF writer is provided for interchange when
netCDF4 is installed.

Supports lazy (memory-mapped-style) reads: ``load='lazy'`` keeps the h5py
dataset handle and slices on demand -- the analogue of the reference's
``load`` policies (generators.py:354-360).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is expected in this image
    h5py = None


@dataclasses.dataclass
class PredictorDataset:
    """In-memory (or lazily backed) predictor dataset.

    Attributes:
        predictors: (sample, [time_step,] varlev, lat, lon) array (numpy or
            h5py dataset when lazy).
        sample: (n,) datetime64[ns] sample (initialization) times.
        varlev: list of 'VAR/level' channel names (the reference's flattened
            varlev coordinate, preprocessing.py:109-128).
        lat, lon: coordinate vectors (degrees).
        mean, std: per-varlev scaling statistics (None if unscaled).
        attrs: free-form metadata.
    """

    predictors: Any
    sample: np.ndarray
    varlev: list[str]
    lat: np.ndarray
    lon: np.ndarray
    mean: np.ndarray | None = None
    std: np.ndarray | None = None
    targets: Any | None = None  # optional, samples-format files only
    attrs: dict = dataclasses.field(default_factory=dict)
    _file: Any = None

    # ------------------------------------------------------------ properties
    @property
    def dims(self) -> dict[str, int]:
        shape = self.predictors.shape
        names = (
            ["sample", "time_step", "varlev", "lat", "lon"]
            if len(shape) == 5
            else ["sample", "varlev", "lat", "lon"]
        )
        return dict(zip(names, shape))

    @property
    def has_time_step(self) -> bool:
        return self.predictors.ndim == 5

    def varlev_index(self, names: Sequence[str]) -> np.ndarray:
        """Indices of the given varlev names (order preserved)."""
        lookup = {v: i for i, v in enumerate(self.varlev)}
        try:
            return np.array([lookup[n] for n in names], dtype=np.int64)
        except KeyError as e:
            raise KeyError(
                f"varlev {e.args[0]!r} not in dataset (has {self.varlev})"
            ) from None

    def sel(self, varlev: Sequence[str] | None = None) -> "PredictorDataset":
        """Subset channels by varlev name (reference input_sel/output_sel
        semantics, generators.py:399-411). Forces a materialized copy."""
        if varlev is None:
            return self
        idx = self.varlev_index(varlev)
        axis = 2 if self.has_time_step else 1
        pred = np.take(np.asarray(self.predictors), idx, axis=axis)
        return dataclasses.replace(
            self,
            predictors=pred,
            varlev=[self.varlev[i] for i in idx],
            mean=None if self.mean is None else self.mean[idx],
            std=None if self.std is None else self.std[idx],
            targets=None
            if self.targets is None
            else np.take(np.asarray(self.targets), idx, axis=axis),
            _file=None,
        )

    def isel_sample(self, index) -> "PredictorDataset":
        """Subset along the sample axis (train/val splits)."""
        return dataclasses.replace(
            self,
            predictors=np.asarray(self.predictors)[index],
            sample=self.sample[index],
            targets=None
            if self.targets is None
            else np.asarray(self.targets)[index],
            _file=None,
        )

    def load(self) -> "PredictorDataset":
        """Materialize lazy arrays into memory ('full' load policy)."""
        self.predictors = np.asarray(self.predictors)
        if self.targets is not None:
            self.targets = np.asarray(self.targets)
        return self

    def inverse_scale(self, data: np.ndarray) -> np.ndarray:
        """Undo the stored per-varlev scaling on a (..., varlev, lat, lon)
        array (the reference keeps mean/std in the file for this purpose)."""
        if self.mean is None or self.std is None:
            return data
        return data * self.std[:, None, None] + self.mean[:, None, None]

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None

    # ------------------------------------------------------------------ I/O
    def to_file(self, path: str) -> None:
        """Write to HDF5 (schema documented in the module docstring)."""
        if h5py is None:
            raise RuntimeError("h5py is required for predictor-file I/O")
        with h5py.File(path, "w") as f:
            f.create_dataset(
                "predictors",
                data=np.asarray(self.predictors),
                chunks=(1,) + tuple(np.asarray(self.predictors).shape[1:]),
                compression=None,
            )
            if self.targets is not None:
                f.create_dataset("targets", data=np.asarray(self.targets))
            f.create_dataset(
                "sample", data=self.sample.astype("datetime64[ns]").astype(np.int64)
            )
            f.create_dataset(
                "varlev",
                data=np.array([v.encode() for v in self.varlev]),
            )
            f.create_dataset("lat", data=np.asarray(self.lat))
            f.create_dataset("lon", data=np.asarray(self.lon))
            if self.mean is not None:
                f.create_dataset("mean", data=np.asarray(self.mean))
                f.create_dataset("std", data=np.asarray(self.std))
            for k, v in self.attrs.items():
                f.attrs[k] = v

    def to_netcdf(self, path: str) -> None:
        """Write a reference-compatible netCDF predictor file (requires the
        optional netCDF4 dependency; the reference's native format,
        preprocessing.py:596-608)."""
        try:
            import netCDF4
        except ImportError:
            raise RuntimeError(
                "netCDF4 is not installed; use to_file() (HDF5) instead"
            ) from None
        with netCDF4.Dataset(path, "w") as nc:
            dims = self.dims
            for name, size in dims.items():
                nc.createDimension(name, size)
            v = nc.createVariable("predictors", "f4", tuple(dims))
            v[:] = np.asarray(self.predictors)
            tvar = nc.createVariable("sample", "i8", ("sample",))
            tvar[:] = self.sample.astype("datetime64[ns]").astype(np.int64)
            tvar.units = "nanoseconds since 1970-01-01"
            nc.createVariable("lat", "f8", ("lat",))[:] = self.lat
            nc.createVariable("lon", "f8", ("lon",))[:] = self.lon
            if self.mean is not None:
                nc.createVariable("mean", "f8", ("varlev",))[:] = self.mean
                nc.createVariable("std", "f8", ("varlev",))[:] = self.std
            nc.setncattr("varlev", ",".join(self.varlev))

    def to_zarr(self, path: str) -> None:
        """Write a zarr store (requires the optional zarr dependency; the
        reference's alternative export, preprocessing.py:423-438)."""
        try:
            import zarr
        except ImportError:
            raise RuntimeError(
                "zarr is not installed; use to_file() (HDF5) instead"
            ) from None
        root = zarr.open(path, mode="w")
        root.create_dataset("predictors", data=np.asarray(self.predictors))
        root.create_dataset(
            "sample",
            data=self.sample.astype("datetime64[ns]").astype(np.int64),
        )
        root.create_dataset("lat", data=np.asarray(self.lat))
        root.create_dataset("lon", data=np.asarray(self.lon))
        if self.mean is not None:
            root.create_dataset("mean", data=np.asarray(self.mean))
            root.create_dataset("std", data=np.asarray(self.std))
        root.attrs["varlev"] = list(self.varlev)

    @classmethod
    def from_file(cls, path: str, load: str = "full") -> "PredictorDataset":
        """Read a predictor file. ``load='full'`` materializes; ``'lazy'``
        keeps the h5py handle open and slices on demand."""
        if h5py is None:
            raise RuntimeError("h5py is required for predictor-file I/O")
        f = h5py.File(path, "r")
        pred = f["predictors"]
        targets = f["targets"] if "targets" in f else None
        if load == "full":
            pred = pred[:]
            targets = targets[:] if targets is not None else None
        ds = cls(
            predictors=pred,
            sample=f["sample"][:].astype("datetime64[ns]"),
            varlev=[v.decode() for v in f["varlev"][:]],
            lat=f["lat"][:],
            lon=f["lon"][:],
            mean=f["mean"][:] if "mean" in f else None,
            std=f["std"][:] if "std" in f else None,
            targets=targets,
            attrs=dict(f.attrs),
            _file=f if load != "full" else None,
        )
        if load == "full":
            f.close()
        return ds
