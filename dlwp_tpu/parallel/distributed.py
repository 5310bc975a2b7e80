"""Multi-host initialization and cross-host mesh construction.

The reference has no distributed backend at all (SURVEY.md section 5.8);
this is the TPU-native layer: ``jax.distributed.initialize`` over DCN, and
meshes laid out so the latitude/spectral axis rides ICI within a slice
while the data axis spans hosts over DCN.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh

from dlwp_tpu.parallel.mesh import MeshConfig


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX.

    With no arguments, relies on the TPU environment's automatic discovery
    (GKE/queued resources set the coordination variables); explicit
    arguments support manual bring-up. Idempotent.

    Note: must run before any JAX computation (even ``jax.devices()``),
    so the idempotency check inspects the distributed client directly
    rather than calling a backend-initializing query.
    """
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return
    except ImportError:  # pragma: no cover - private-module layout change
        pass
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise


def multihost_mesh(
    config: MeshConfig | None = None,
    ici_axis: str = "lat",
) -> Mesh:
    """Build a (data, lat) mesh with the ``lat`` (halo/spectral-transpose)
    axis mapped to intra-slice ICI neighbors and ``data`` (gradient psum)
    spanning hosts.

    Uses ``mesh_utils.create_device_mesh`` for a topology-aware layout when
    available.
    """
    from jax.experimental import mesh_utils

    config = config or MeshConfig()
    d, l, lo = config.resolve(jax.device_count())
    shape = (d, l, lo) if lo > 1 else (d, l)
    names = ("data", ici_axis, "lon") if lo > 1 else ("data", ici_axis)
    try:
        devices = mesh_utils.create_device_mesh(shape)
    except Exception:
        devices = np.asarray(jax.devices()).reshape(shape)
    return Mesh(devices, names)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
