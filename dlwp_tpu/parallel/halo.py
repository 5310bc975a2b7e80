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


def halo_exchange_lon(
    x: jax.Array,
    halo: tuple[int, int],
    axis_name: str = "lon",
    lon_axis: int = -1,
) -> jax.Array:
    """Exchange longitude halos between neighboring shards (periodic ring).

    Must be called inside ``shard_map`` over ``axis_name``. Unlike the
    latitude exchange, the permutation is CYCLIC -- the last lon shard is
    the western neighbor of the first -- realizing the spherical periodic
    boundary as a collective-permute ring over ICI (SURVEY.md section 5.8;
    the distributed form of the reference's PeriodicPadding2D,
    custom.py:139-214). Returns the local block extended by
    ``halo = (left, right)`` columns.
    """
    left, right = halo
    n = _axis_size(axis_name)
    W = x.shape[lon_axis]
    parts = []
    if left > 0:
        # Receive the rightmost columns of the western neighbor: shard i
        # sends east to (i + 1) mod n. With a single shard the ring
        # degenerates to the local periodic wrap.
        send = lax.slice_in_dim(x, W - left, W, axis=lon_axis)
        if n > 1:
            send = lax.ppermute(
                send, axis_name, [(i, (i + 1) % n) for i in range(n)]
            )
        parts.append(send)
    parts.append(x)
    if right > 0:
        send = lax.slice_in_dim(x, 0, right, axis=lon_axis)
        if n > 1:
            send = lax.ppermute(
                send, axis_name, [(i, (i - 1) % n) for i in range(n)]
            )
        parts.append(send)
    return jnp.concatenate(parts, axis=lon_axis)


def _local_cyclic_conv(
    x, kernel, halo, axis_name, dilation, lon_axis_name=None
):
    """Per-shard stencil: lat halo exchange + longitude wrap + VALID conv.

    The longitude wrap is a local pad when longitude is whole within the
    shard, or a cyclic ppermute ring when it is sharded over
    ``lon_axis_name``. The lat exchange runs FIRST so the lon exchange
    (operating on the row-extended block) carries the corner cells too.
    """
    top, bot = halo
    x = halo_exchange_lat(x, halo, axis_name=axis_name)
    ew = (kernel.shape[-1] - 1) * dilation[1]
    if lon_axis_name is not None:
        return _valid_conv(
            halo_exchange_lon(
                x, (ew // 2, ew - ew // 2), axis_name=lon_axis_name
            ),
            kernel, dilation,
        )
    x = pad_periodic(x, ((0, 0), (ew // 2, ew - ew // 2)))
    return _valid_conv(x, kernel, dilation)


def _valid_conv(x, kernel, dilation):
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
    lon_axis_name: str | None = None,
) -> jax.Array:
    """cyclic_conv2d under 1-D (lat-band) or 2-D (lat x lon tile) domain
    decomposition.

    ``x`` is (B, C, H, W) sharded (batch over ``data_axis``, H over
    ``lat_axis_name``, and optionally W over ``lon_axis_name``); the kernel
    is replicated. Produces identically sharded output. Numerically
    identical to the single-device
    :func:`dlwp_tpu.ops.conv.cyclic_conv2d` with ``lat_mode='zero'``.
    """
    kh = kernel.shape[-2]
    eh = (kh - 1) * dilation[0]
    halo = (eh // 2, eh - eh // 2)
    spec = P(data_axis, None, lat_axis_name, lon_axis_name)
    fn = partial(
        _local_cyclic_conv,
        halo=halo,
        axis_name=lat_axis_name,
        dilation=dilation,
        lon_axis_name=lon_axis_name,
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
    )(x, kernel)
