"""Device mesh construction and standard shardings.

The framework's standard mesh is 2-D ``(data, lat)``: batch parallelism over
``data`` and latitude-band spatial decomposition over ``lat`` (the CNN's
domain-parallel axis and the spectral transform's grid-side sharding). A
``lon`` axis extends it to 3-D ``(data, lat, lon)`` tile decomposition,
where the periodic longitude boundary becomes a cyclic ppermute ring
(SURVEY.md section 5.8). This replaces the reference's ``multi_gpu_model``
replication (models.py:104-109) with explicit shardings compiled by XLA
into ICI collectives.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Declarative mesh description.

    axis sizes of -1 mean "use all remaining devices".
    """

    data: int = -1
    lat: int = 1
    lon: int = 1

    def resolve(self, n_devices: int | None = None) -> tuple[int, int, int]:
        n = n_devices or len(jax.devices())
        sizes = [self.data, self.lat, self.lon]
        if sizes.count(-1) > 1:
            raise ValueError("only one axis may be -1")
        if -1 in sizes:
            known = 1
            for v in sizes:
                if v != -1:
                    known *= v
            sizes[sizes.index(-1)] = n // known
        d, l, lo = sizes
        if d * l * lo != n:
            raise ValueError(
                f"mesh {d}x{l}x{lo} does not match {n} devices"
            )
        return d, l, lo


def build_mesh(
    config: MeshConfig | None = None,
    devices=None,
    axis_names: tuple[str, ...] | None = None,
) -> Mesh:
    """Build a (data, lat) mesh -- or (data, lat, lon) when ``config.lon``
    is set -- over the given (or all) devices. 2-D by default so existing
    (data, lat) call sites are unchanged."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    d, l, lo = config.resolve(len(devices))
    if axis_names is None:
        axis_names = ("data", "lat", "lon") if lo > 1 else ("data", "lat")
    if len(axis_names) == 2 and lo > 1:
        raise ValueError("config.lon > 1 requires 3 axis names")
    dev_array = np.asarray(devices).reshape(
        (d, l, lo) if len(axis_names) == 3 else (d, l)
    )
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, extra_dims: int = 3) -> NamedSharding:
    """Sharding for a (batch, ...) array: batch over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * extra_dims)))


def space_sharding(mesh: Mesh, ndim: int, lat_axis: int) -> NamedSharding:
    """Sharding with the latitude axis over 'lat' (others replicated)."""
    spec = [None] * ndim
    spec[lat_axis] = "lat"
    return NamedSharding(mesh, P(*spec))


def batch_space_sharding(
    mesh: Mesh, ndim: int, lat_axis: int
) -> NamedSharding:
    """Batch over 'data' + latitude over 'lat' (the dp x sp layout)."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[lat_axis] = "lat"
    return NamedSharding(mesh, P(*spec))
