"""Pallas ICI halo exchange for latitude-band domain decomposition.

The TPU fast path for the lat-sharded stencil (portable version:
:mod:`dlwp_tpu.parallel.halo` via ``ppermute``): neighbor halo rows move as
explicit inter-chip remote DMAs (``pltpu.make_async_remote_copy``) over ICI
links, the pattern of the canonical distributed-Pallas right-permute kernel
(see SNIPPETS.md [1] / jax distributed-Pallas docs).

Topology note: the exchange is issued cyclically (every device sends both
directions, wrap included) so the DMA pattern is symmetric and every device
waits on exactly two receives; the two non-physical wrap halos (north of
shard 0, south of the last shard) are then overwritten with the boundary
condition outside the kernel. This keeps edge devices from waiting on DMAs
that were never issued.

Layout: operates on (B, C, H_local, W) blocks; halo rows are contiguous
(B, C, halo, W) slabs, so each direction is a single strided DMA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(
    x_ref, bot_rows, top_rows, out_top, out_center, out_bot,
    send_sem, recv_sem, local_sem,
    *, top: int, bot: int, axis_name: str, data_axis: str | None,
):
    """All DMAs copy WHOLE refs: Mosaic requires sliced memrefs to be
    lane-tile-aligned (128), which arbitrary nlon (e.g. the canonical 144)
    is not, so the edge slabs are pre-sliced by XLA (``bot_rows`` /
    ``top_rows`` inputs) and the padded output is split into three refs
    concatenated by XLA afterwards."""
    my = lax.axis_index(axis_name)
    n = jnp.int32(lax.psum(1, axis_name))

    # Center block: local whole-ref DMA.
    center = pltpu.make_async_copy(x_ref, out_center, local_sem)
    center.start()

    if data_axis is not None:
        dat = lax.axis_index(data_axis)
        dev_down = (dat, lax.rem(my + 1, n))
        dev_up = (dat, lax.rem(my - 1 + n, n))
    else:
        dev_down = lax.rem(my + 1, n)
        dev_up = lax.rem(my - 1 + n, n)

    # My bottom rows -> southern neighbor's top halo.
    down = pltpu.make_async_remote_copy(
        src_ref=bot_rows,
        dst_ref=out_top,
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=dev_down,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    # My top rows -> northern neighbor's bottom halo.
    up = pltpu.make_async_remote_copy(
        src_ref=top_rows,
        dst_ref=out_bot,
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=dev_up,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    down.start()
    up.start()
    down.wait()
    up.wait()
    center.wait()


def _pallas_halo_local(
    x: jax.Array,
    halo: tuple[int, int],
    axis_name: str,
    data_axis: str | None,
    interpret=False,
) -> jax.Array:
    """Local (inside-shard_map) cyclic halo exchange; returns the padded
    block (B, C, top + H + bot, W) with wrap halos still in place."""
    top, bot = halo
    B, C, H, W = x.shape
    if top == 0 and bot == 0:
        return x
    # Zero-extent DMA refs are not representable: exchange at least one row
    # per direction and crop the unneeded ones after the concat.
    t_eff, b_eff = max(top, 1), max(bot, 1)
    bot_rows = x[:, :, H - t_eff :, :]  # what the south neighbor needs
    top_rows = x[:, :, :b_eff, :]  # what the north neighbor needs
    out_shape = (
        jax.ShapeDtypeStruct((B, C, t_eff, W), x.dtype),
        jax.ShapeDtypeStruct((B, C, H, W), x.dtype),
        jax.ShapeDtypeStruct((B, C, b_eff, W), x.dtype),
    )
    kernel = partial(
        _halo_kernel, top=t_eff, bot=b_eff, axis_name=axis_name,
        data_axis=data_axis,
    )
    o_top, o_center, o_bot = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, bot_rows, top_rows)
    # Crop over-exchanged rows when a halo side is 0.
    return jnp.concatenate(
        [o_top[:, :, t_eff - top :], o_center, o_bot[:, :, :bot]], axis=-2
    )


def pallas_halo_exchange_lat(
    x: jax.Array,
    halo: tuple[int, int],
    axis_name: str = "lat",
    data_axis: str | None = None,
    boundary: str = "zero",
    interpret=False,
) -> jax.Array:
    """Halo exchange via ICI remote DMA (call inside shard_map).

    Semantics match :func:`dlwp_tpu.parallel.halo.halo_exchange_lat`:
    interior halos from neighbors, outer boundaries per ``boundary``
    ('zero' only, the reference's ZeroPadding latitude treatment).
    """
    top, bot = halo
    padded = _pallas_halo_local(x, halo, axis_name, data_axis, interpret)
    if boundary != "zero":
        raise NotImplementedError("only zero boundaries supported")
    my = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)
    H = x.shape[-2]
    row = jnp.arange(padded.shape[-2])[None, None, :, None]
    mask = jnp.ones_like(padded, dtype=bool)
    if top:
        mask = mask & ~((my == 0) & (row < top))
    if bot:
        mask = mask & ~((my == n - 1) & (row >= top + H))
    return jnp.where(mask, padded, 0)


def pallas_sharded_cyclic_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    data_axis: str | None = "data",
    lat_axis_name: str = "lat",
    interpret=False,
) -> jax.Array:
    """sharded_cyclic_conv2d with the halo exchange as a Pallas ICI kernel.

    Numerically identical to the ppermute version
    (:func:`dlwp_tpu.parallel.halo.sharded_cyclic_conv2d`); intended for
    real TPU meshes where the explicit remote DMA avoids the all-to-all
    lowering of ppermute and can later be double-buffered against interior
    compute.
    """
    kh, kw = kernel.shape[-2], kernel.shape[-1]
    halo = ((kh - 1) // 2, kh - 1 - (kh - 1) // 2)

    def local_fn(xb, k):
        padded = pallas_halo_exchange_lat(
            xb, halo, axis_name=lat_axis_name, data_axis=data_axis,
            interpret=interpret,
        )
        ew = kw - 1
        padded = jnp.pad(
            padded, [(0, 0), (0, 0), (0, 0), (ew // 2, ew - ew // 2)],
            mode="wrap",
        )
        return lax.conv_general_dilated(
            padded, k, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    spec = P(data_axis, None, lat_axis_name, None)
    # check_vma=False: pallas_call outputs don't carry varying-mesh-axes
    # metadata for shard_map's replication checker.
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(spec, P()), out_specs=spec,
        check_vma=False,
    )(x, kernel)
