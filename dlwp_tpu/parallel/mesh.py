"""Device mesh construction and standard shardings.

The framework's standard mesh is 2-D ``(data, lat)``: batch parallelism over
``data`` and latitude-band spatial decomposition over ``lat`` (the CNN's
domain-parallel axis and the spectral transform's grid-side sharding). This
replaces the reference's ``multi_gpu_model`` replication (models.py:104-109)
with explicit shardings compiled by XLA into ICI collectives.
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

    def resolve(self, n_devices: int | None = None) -> tuple[int, int]:
        n = n_devices or len(jax.devices())
        d, l = self.data, self.lat
        if d == -1 and l == -1:
            raise ValueError("only one axis may be -1")
        if d == -1:
            d = n // l
        if l == -1:
            l = n // d
        if d * l != n:
            raise ValueError(
                f"mesh {d}x{l} does not match {n} devices"
            )
        return d, l


def build_mesh(
    config: MeshConfig | None = None,
    devices=None,
    axis_names: tuple[str, str] = ("data", "lat"),
) -> Mesh:
    """Build a 2-D (data, lat) mesh over the given (or all) devices."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    d, l = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(d, l)
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
