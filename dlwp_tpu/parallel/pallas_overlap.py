"""Overlapped halo-exchange + stencil: the compute/comm-overlap kernel.

The performance-critical pattern for latitude-band domain decomposition
(SURVEY.md section 7.3 "halo exchange overlap"): a single Pallas kernel per
shard that

1. starts the inter-chip remote DMAs for the neighbor halo rows (one
   whole-batch DMA per direction),
2. computes all *interior* output rows (which need no neighbor data) while
   the DMAs are in flight on the ICI links,
3. waits, then computes the two *edge* output rows from the received halos.

The 3x3 stencil itself runs on the MXU as one (O x 9C) @ (9C x W) matmul
per output row, with longitude wrap applied via ``pltpu.roll`` on the row
slabs -- no padded activation copies at all.

Scope: 3x3 kernels, stride 1, zero latitude boundary (the reference's
canonical configuration, train.py:152-158); the local (B, C, H_local, W)
block must fit in VMEM (fine for lat-band shards of production grids;
larger blocks would add an HBM->VMEM pipeline, see ops Pallas notes).
Validated in interpret mode against the single-device oracle; on real
multi-chip hardware the DMA wait in step 3 is hidden behind step 2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_conv(r_above, r_center, r_below, kmat):
    """One output row from its 3 input rows (each (C, W)) -> (O, W)."""
    W = r_center.shape[-1]
    slabs = []
    for row in (r_above, r_center, r_below):
        for dx in (-1, 0, 1):
            # pltpu.roll requires non-negative shifts; -dx mod W.
            slabs.append(pltpu.roll(row, (-dx) % W, axis=1))
    patch = jnp.concatenate(slabs, axis=0)  # (9C, W), order [dy, dx, c]
    return jax.lax.dot_general(
        kmat, patch, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _overlap_kernel(
    x_ref, k_ref, y_ref, halo_ref, send_sem, recv_sem,
    *, axis_name: str, data_axis: str | None,
):
    """x (B, C, H, W) VMEM; y (B, O, H, W); halo scratch (2, B, C, 1, W)."""
    my = lax.axis_index(axis_name)
    n = jnp.int32(lax.psum(1, axis_name))
    B, C, H, W = x_ref.shape
    if data_axis is not None:
        dat = lax.axis_index(data_axis)
        dev_down = (dat, lax.rem(my + 1, n))
        dev_up = (dat, lax.rem(my - 1 + n, n))
    else:
        dev_down = lax.rem(my + 1, n)
        dev_up = lax.rem(my - 1 + n, n)

    # 1. Whole-batch halo DMAs. My bottom rows go to my southern neighbor's
    # slot 0 ("row above their block"); my top rows to the northern
    # neighbor's slot 1 ("row below their block").
    down = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, :, H - 1 : H, :],
        dst_ref=halo_ref.at[0],
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=dev_down,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    up = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, :, 0:1, :],
        dst_ref=halo_ref.at[1],
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=dev_up,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    down.start()
    up.start()

    kmat = k_ref[:]  # (O, 9C)

    # 2. Interior rows overlap the DMAs.
    def body(i, _):
        b = i // (H - 2)
        h = 1 + i % (H - 2)
        out = _row_conv(
            x_ref[b, :, h - 1, :],
            x_ref[b, :, h, :],
            x_ref[b, :, h + 1, :],
            kmat,
        )
        y_ref[b, :, h, :] = out
        return 0

    lax.fori_loop(0, B * (H - 2), body, 0)

    # 3. Edge rows from the received halos (zeroed at outer boundaries).
    down.wait()
    up.wait()

    def edges(b, _):
        north = jnp.where(my == 0, 0.0, halo_ref[0, b, :, 0, :])
        south = jnp.where(my == n - 1, 0.0, halo_ref[1, b, :, 0, :])
        y_ref[b, :, 0, :] = _row_conv(
            north, x_ref[b, :, 0, :], x_ref[b, :, 1, :], kmat
        )
        y_ref[b, :, H - 1, :] = _row_conv(
            x_ref[b, :, H - 2, :], x_ref[b, :, H - 1, :], south, kmat
        )
        return 0

    lax.fori_loop(0, B, edges, 0)


def _overlap_local(x, kernel, axis_name, data_axis, interpret=False):
    """Per-shard overlapped stencil (inside shard_map)."""
    B, C, H, W = x.shape
    O = kernel.shape[0]
    assert kernel.shape[-2:] == (3, 3), "overlap kernel supports 3x3 only"
    assert H >= 2, "need at least 2 local rows"
    kmat = jnp.transpose(kernel, (2, 3, 1, 0)).reshape(9 * C, O).T
    kern = partial(_overlap_kernel, axis_name=axis_name, data_axis=data_axis)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, O, H, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, B, C, 1, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x.astype(jnp.float32), kmat.astype(jnp.float32))


def overlapped_cyclic_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    data_axis: str | None = "data",
    lat_axis_name: str = "lat",
    interpret=False,
) -> jax.Array:
    """3x3 cyclic conv with ICI halo exchange overlapped against interior
    MXU compute. Semantics identical to
    ``cyclic_conv2d(x, k, lat_mode='zero')`` under lat-band sharding."""
    spec = P(data_axis, None, lat_axis_name, None)
    fn = partial(
        _overlap_local, axis_name=lat_axis_name, data_axis=data_axis,
        interpret=interpret,
    )
    return jax.shard_map(
        lambda a, k: fn(a, k),
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
        check_vma=False,
    )(x, kernel)
