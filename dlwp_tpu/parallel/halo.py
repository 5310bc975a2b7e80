"""Latitude-band halo exchange and domain-decomposed stencils.

The spatial-parallel path for spherical stencils (SURVEY.md sections 2.5,
5.7): the global (lat, lon) grid is split into latitude bands across the
``lat`` mesh axis; a convolution needs ``halo`` rows from each neighbor
band. Longitude stays whole within a shard, so the periodic wrap remains a
local operation, and the lat-halo exchange is a nearest-neighbor
``ppermute`` pair that XLA lowers onto ICI links.

Boundary conditions fall out naturally: ``lax.ppermute`` with a non-cyclic
permutation delivers zeros on unpaired edges -- exactly the reference's
ZeroPadding2D latitude treatment (train.py:152-155).

This module is the portable (shard_map + XLA collective) implementation; the
Pallas double-buffered remote-DMA variant that overlaps the exchange with
interior compute is the TPU fast path (see ``dlwp_tpu.ops`` Pallas kernels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dlwp_tpu.ops.padding import pad_periodic


def _axis_size(axis_name: str) -> int:
    return lax.psum(1, axis_name)


def halo_exchange_lat(
    x: jax.Array,
    halo: tuple[int, int],
    axis_name: str = "lat",
    lat_axis: int = -2,
) -> jax.Array:
    """Exchange latitude halos between neighboring shards.

    Must be called inside ``shard_map`` over ``axis_name``. Returns the local
    block extended by ``halo = (top, bottom)`` rows: interior halos come from
    the neighboring shards, outer boundaries (north of shard 0, south of the
    last shard) are zero (ZeroPadding semantics).
    """
    top, bot = halo
    n = _axis_size(axis_name)
    parts = []
    if top > 0:
        # Receive the bottom rows of the northern neighbor: shift data
        # southward (shard i sends to i+1).
        send = lax.slice_in_dim(x, x.shape[lat_axis] - top, x.shape[lat_axis], axis=lat_axis)
        perm = [(i, i + 1) for i in range(n - 1)]
        parts.append(lax.ppermute(send, axis_name, perm))
    parts.append(x)
    if bot > 0:
        send = lax.slice_in_dim(x, 0, bot, axis=lat_axis)
        perm = [(i, i - 1) for i in range(1, n)]
        parts.append(lax.ppermute(send, axis_name, perm))
    return jnp.concatenate(parts, axis=lat_axis)


def _local_cyclic_conv(x, kernel, halo, axis_name, dilation):
    """Per-shard stencil: lat halo exchange + local wrap-pad + VALID conv."""
    top, bot = halo
    x = halo_exchange_lat(x, halo, axis_name=axis_name)
    ew = (kernel.shape[-1] - 1) * dilation[1]
    x = pad_periodic(x, ((0, 0), (ew // 2, ew - ew // 2)))
    batch_shape = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    out = lax.conv_general_dilated(
        x4,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + out.shape[1:])


def sharded_cyclic_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    dilation: tuple[int, int] = (1, 1),
    data_axis: str | None = "data",
    lat_axis_name: str = "lat",
) -> jax.Array:
    """cyclic_conv2d under latitude-band domain decomposition.

    ``x`` is (B, C, H, W) sharded (batch over ``data_axis``, H over
    ``lat_axis_name``); the kernel is replicated. Produces identically
    sharded output. Numerically identical to the single-device
    :func:`dlwp_tpu.ops.conv.cyclic_conv2d` with ``lat_mode='zero'``.
    """
    kh = kernel.shape[-2]
    eh = (kh - 1) * dilation[0]
    halo = (eh // 2, eh - eh // 2)
    spec = P(data_axis, None, lat_axis_name, None)
    fn = partial(
        _local_cyclic_conv,
        halo=halo,
        axis_name=lat_axis_name,
        dilation=dilation,
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
    )(x, kernel)
