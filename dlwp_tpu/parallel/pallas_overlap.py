"""Overlapped halo-exchange + stencil: the compute/comm-overlap kernel.

The performance-critical pattern for latitude-band domain decomposition
(SURVEY.md section 7.3 "halo exchange overlap"): a single Pallas kernel per
shard that

1. starts the inter-chip remote DMAs for the neighbor halo rows (one
   whole-batch DMA per direction),
2. computes all *interior* output rows (which need no neighbor data) while
   the DMAs are in flight on the ICI links,
3. waits, then computes the two *edge* output rows from the received halos.

The 3x3 stencil runs on the MXU as three (O x 3C) @ (3C x W) matmuls per
output row (one per dx tap), with the longitude wrap applied by rolling the
per-dx outputs -- no padded activation copies at all.

Layout: the kernel operates on (H, B, C, W) blocks -- latitude leading --
so the single-row halo DMAs slice an untiled dimension (Mosaic requires
sublane-tile-aligned slices on the tiled dims). The public wrapper
transposes from the framework's (B, C, H, W).

Scope: 3x3 kernels, stride 1, zero latitude boundary (the reference's
canonical configuration, train.py:152-158). Any nlon, including the
canonical 144 (cfsr.py:116-118): all DMAs copy whole refs because Mosaic
rejects memref slices whose lane extent is not 128-aligned, and lane rolls
at arbitrary widths verify on current toolchains. Batches are chunked so
each block fits VMEM.

Measured (TPU v5e, 1 chip): at (8, 32, 40, 256) fp32, 0.81 ms vs 0.77 ms
for the XLA conv; at the canonical (8, 32, 36, 144) the kernel verifies to
2e-7 relative on a degenerate (data=1, lat=1) 2-D MESH (exercising the
device-id addressing) at XLA-conv parity. The double-buffered pipeline for
blocks beyond one VMEM mirror verifies to 2e-7 on hardware at
(256, 32, 36, 144) but runs 3.9x slower than the XLA conv single-chip
(10.1 vs 2.6 ms: per-row matmuls are MXU-starved and one chip has no ICI
latency to hide) -- 'overlap' is the opt-in impl for multi-chip meshes
where the exchange cost dominates, not a single-chip win. Interpret-mode
tests validate the multi-shard exchange on an 8-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_conv(r_above, r_center, r_below, kmats):
    """One output row from its 3 input rows (each (C, W)) -> (O, W).

    ``kmats`` is (3, O, 3C) -- one (O, 3C) matrix per dx in (-1, 0, 1),
    columns ordered [dy, c]. The longitude wrap is applied by rolling the
    per-dx *outputs* (Mosaic cannot concatenate lane-rolled vectors at
    non-128-multiple widths, so inputs stay unshifted).
    """
    W = r_center.shape[-1]
    rows = jnp.concatenate([r_above, r_center, r_below], axis=0)  # (3C, W)
    out = None
    for i, dx in enumerate((-1, 0, 1)):
        m = jax.lax.dot_general(
            kmats[i], rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # out[w] needs input[w + dx]: shift the contribution left by dx.
        if dx:
            m = pltpu.roll(m, (-dx) % W, axis=1)
        out = m if out is None else out + m
    return out


def _overlap_kernel(
    x_hbm, edges_hbm, k_ref, y_ref, x_vmem, halo_n, halo_s,
    send_sem, recv_sem, local_sem,
    *, axis_name: str, data_axis: str | None,
):
    """x_hbm (H, B, C, W) and edges_hbm (2, B, C, W; my top/bottom rows,
    pre-sliced by XLA) live in HBM; y (H, B, O, W) is a VMEM out-operand
    (XLA-visible operands draw on the 128M vmem pool, while kernel
    *scratch* is capped by the 16M scoped-vmem limit -- hence the batch
    chunking below); x_vmem is the VMEM compute mirror; halo_n / halo_s
    (2, B, C, W) VMEM receive buffers.

    Every DMA copies a WHOLE ref -- no memref slicing -- because Mosaic
    requires sliced memrefs to be lane-tile-aligned (128), which the
    canonical nlon=144 grid is not. Each device ships both its edge rows to
    both neighbors (2x a tiny transfer) instead of slicing one row per
    direction; receivers pick the row they need from VMEM.
    """
    my = lax.axis_index(axis_name)
    n = jnp.int32(lax.psum(1, axis_name))
    H, B, C, W = x_hbm.shape

    # 0. Stage the block into VMEM for compute (overlaps the remote DMAs).
    stage = pltpu.make_async_copy(x_hbm, x_vmem, local_sem)
    stage.start()

    if data_axis is not None:
        dat = lax.axis_index(data_axis)
        dev_down = (dat, lax.rem(my + 1, n))
        dev_up = (dat, lax.rem(my - 1 + n, n))
    else:
        dev_down = lax.rem(my + 1, n)
        dev_up = lax.rem(my - 1 + n, n)

    # 1. Whole-ref edge DMAs. My edges go to the southern neighbor's
    # "north" buffer (they use row 1 = my bottom) and to the northern
    # neighbor's "south" buffer (they use row 0 = my top).
    down = pltpu.make_async_remote_copy(
        src_ref=edges_hbm,
        dst_ref=halo_n,
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=dev_down,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    up = pltpu.make_async_remote_copy(
        src_ref=edges_hbm,
        dst_ref=halo_s,
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=dev_up,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    down.start()
    up.start()

    kmats = k_ref[:]  # (3, O, 3C)
    stage.wait()

    # 2. Interior rows overlap the remote DMAs.
    def body(i, _):
        b = i // (H - 2)
        h = 1 + i % (H - 2)
        y_ref[h, b] = _row_conv(
            x_vmem[h - 1, b], x_vmem[h, b], x_vmem[h + 1, b], kmats
        )
        return 0

    lax.fori_loop(0, B * (H - 2), body, 0)

    # 3. Edge rows from the received halos (zeroed at outer boundaries).
    down.wait()
    up.wait()

    def edges(b, _):
        north = jnp.where(my == 0, 0.0, halo_n[1, b])
        south = jnp.where(my == n - 1, 0.0, halo_s[0, b])
        y_ref[0, b] = _row_conv(north, x_vmem[0, b], x_vmem[1, b], kmats)
        y_ref[H - 1, b] = _row_conv(
            x_vmem[H - 2, b], x_vmem[H - 1, b], south, kmats
        )
        return 0

    lax.fori_loop(0, B, edges, 0)


def _overlap_kernel_db(
    *args, axis_name: str, data_axis: str | None, chunk: int, nchunks: int,
):
    """Double-buffered variant for blocks too large for one VMEM mirror.

    One remote halo exchange for the WHOLE batch (the XLA-level fallback
    re-exchanged per chunk), then a software pipeline over batch chunks:
    while chunk j computes on the MXU, chunk j+1 stages HBM -> VMEM and
    chunk j-1's output stores VMEM -> HBM.

    The chunks arrive as SEPARATE whole HBM refs (pre-split by XLA) and
    the pipeline is python-unrolled over them: Mosaic requires memref
    slices to be lane-tile-aligned (128), which arbitrary nlon (e.g. the
    canonical 144) is not -- so no ref is ever sliced, mirroring the
    whole-ref-DMA design of the other halo kernels.
    """
    xs = args[:nchunks]
    edges_hbm, k_ref = args[nchunks], args[nchunks + 1]
    ys = args[nchunks + 2 : 2 * nchunks + 2]
    # The two pipeline slots are SEPARATE whole scratch refs (not a leading
    # axis sliced with .at[slot]): Mosaic requires memref slices to keep
    # 128-aligned lane extents, which arbitrary nlon (144) is not.
    (xb0, xb1, yb0, yb1, halo_n, halo_s,
     stage_sem, store_sem, send_sem, recv_sem) = args[2 * nchunks + 2 :]
    xbufs, ybufs = (xb0, xb1), (yb0, yb1)
    my = lax.axis_index(axis_name)
    n = jnp.int32(lax.psum(1, axis_name))
    H = xs[0].shape[0]

    if data_axis is not None:
        dat = lax.axis_index(data_axis)
        dev_down = (dat, lax.rem(my + 1, n))
        dev_up = (dat, lax.rem(my - 1 + n, n))
    else:
        dev_down = lax.rem(my + 1, n)
        dev_up = lax.rem(my - 1 + n, n)

    down = pltpu.make_async_remote_copy(
        src_ref=edges_hbm, dst_ref=halo_n,
        send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
        device_id=dev_down, device_id_type=pltpu.DeviceIdType.MESH,
    )
    up = pltpu.make_async_remote_copy(
        src_ref=edges_hbm, dst_ref=halo_s,
        send_sem=send_sem.at[1], recv_sem=recv_sem.at[1],
        device_id=dev_up, device_id_type=pltpu.DeviceIdType.MESH,
    )
    down.start()
    up.start()

    def x_copy(j):
        return pltpu.make_async_copy(
            xs[j], xbufs[j % 2], stage_sem.at[j % 2]
        )

    def y_copy(j):
        return pltpu.make_async_copy(
            ybufs[j % 2], ys[j], store_sem.at[j % 2]
        )

    x_copy(0).start()
    kmats = k_ref[:]  # (3, O, 3C)
    # The remote edge rows overlap chunk 0's staging; with multiple chunks
    # in flight the ICI latency is fully hidden behind the pipeline.
    down.wait()
    up.wait()

    for j in range(nchunks):  # static unroll: all slots/refs static
        slot = j % 2
        x_copy(j).wait()
        if j + 1 < nchunks:
            x_copy(j + 1).start()
        if j >= 2:
            y_copy(j - 2).wait()

        xb, yb = xbufs[slot], ybufs[slot]

        def interior(i, _, xb=xb, yb=yb):
            b = i // (H - 2)
            h = 1 + i % (H - 2)
            yb[h, b] = _row_conv(
                xb[h - 1, b], xb[h, b], xb[h + 1, b], kmats
            )
            return 0

        lax.fori_loop(0, chunk * (H - 2), interior, 0)

        def edges(b, _, j=j, xb=xb, yb=yb):
            bg = j * chunk + b
            north = jnp.where(my == 0, 0.0, halo_n[1, bg])
            south = jnp.where(my == n - 1, 0.0, halo_s[0, bg])
            yb[0, b] = _row_conv(north, xb[0, b], xb[1, b], kmats)
            yb[H - 1, b] = _row_conv(
                xb[H - 2, b], xb[H - 1, b], south, kmats
            )
            return 0

        lax.fori_loop(0, chunk, edges, 0)
        y_copy(j).start()

    for back in (2, 1):  # drain the last stores
        if nchunks - back >= 0:
            y_copy(nchunks - back).wait()


def _overlap_local_db(x, kernel, axis_name, data_axis, chunk, interpret=False):
    """Pipelined per-shard stencil for blocks beyond one VMEM mirror."""
    B, C, H, W = x.shape
    O = kernel.shape[0]
    nchunks = -(-B // chunk)
    pad_b = nchunks * chunk - B
    xt = jnp.transpose(x, (2, 0, 1, 3)).astype(jnp.float32)  # (H, B, C, W)
    if pad_b:
        xt = jnp.pad(xt, ((0, 0), (0, pad_b), (0, 0), (0, 0)))
    Bp = xt.shape[1]
    edges = jnp.stack([xt[0], xt[H - 1]])
    x_chunks = [
        xt[:, j * chunk : (j + 1) * chunk] for j in range(nchunks)
    ]
    kmat = jnp.transpose(
        jnp.transpose(kernel, (3, 2, 1, 0)).reshape(3, 3 * C, O), (0, 2, 1)
    )
    kern = partial(
        _overlap_kernel_db, axis_name=axis_name, data_axis=data_axis,
        chunk=chunk, nchunks=nchunks,
    )
    y_chunks = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((H, chunk, O, W), jnp.float32)
            for _ in range(nchunks)
        ],
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * (nchunks + 1)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        ),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        ] * nchunks,
        scratch_shapes=[
            pltpu.VMEM((H, chunk, C, W), jnp.float32),
            pltpu.VMEM((H, chunk, C, W), jnp.float32),
            pltpu.VMEM((H, chunk, O, W), jnp.float32),
            pltpu.VMEM((H, chunk, O, W), jnp.float32),
            pltpu.VMEM((2, Bp, C, W), jnp.float32),
            pltpu.VMEM((2, Bp, C, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*x_chunks, edges, kmat.astype(jnp.float32))
    yt = jnp.concatenate(y_chunks, axis=1)
    if pad_b:
        yt = yt[:, :B]
    return jnp.transpose(yt, (1, 2, 0, 3))


# Everything the kernel holds in VMEM -- scratch (x mirror + halo buffers)
# AND the pallas_call's VMEM-spec'd operands (the y output block) -- draws
# on the 16M scoped-vmem stack on current toolchains (measured: a B=11
# C=O=32 chunk was billed 26.12M = mirror + out + halos and rejected).
_SCOPED_VMEM_BUDGET = 14 * 1024 * 1024
_VMEM_BUDGET_BYTES = 96 * 1024 * 1024
# The pipelined kernel is python-unrolled over batch chunks; cap the unroll
# so Mosaic programs stay compilable for cheap-halo shapes (small C).
_MAX_PIPELINE_CHUNKS = 32


def _overlap_local(x, kernel, axis_name, data_axis, interpret=False):
    """Per-shard overlapped stencil (inside shard_map); x is (B, C, H, W).

    Large batches are chunked so the VMEM-resident block (input mirror +
    output + halo buffers) fits the budget; every chunk performs its own
    symmetric halo exchange, so all devices execute the same DMA sequence.
    """
    B, C, H, W = x.shape
    O = kernel.shape[0]
    assert kernel.shape[-2:] == (3, 3), "overlap kernel supports 3x3 only"
    assert H >= 2, "need at least 2 local rows"
    # Any W: Mosaic lane rolls at non-128-multiple widths (e.g. the
    # canonical nlon=144 grid, cfsr.py:116-118) compile and verify on
    # current toolchains (validated on v5e hardware; round 1's W % 128
    # restriction is obsolete). VMEM layouts pad W up to the 128 lane tile.
    w_pad = -(-W // 128) * 128
    # Single-mirror kernel's scoped bill: x mirror + y out block + 2x2 halo
    # receive rows (all per sample, w_pad lanes, fp32).
    scratch_per_sample = (H * (C + O) + 4 * C) * w_pad * 4
    max_b = max(1, min(
        _SCOPED_VMEM_BUDGET // max(scratch_per_sample, 1),
        _VMEM_BUDGET_BYTES // max(scratch_per_sample, 1),
    ))
    if B > max_b:
        # Batch beyond one VMEM mirror: software-pipelined kernel (ONE
        # remote halo exchange for the whole block; stage/compute/store of
        # successive chunks overlap via double buffering). Its scoped bill:
        # 2 slots x chunk x (mirror + out) + whole-block halo buffers.
        halo_per_sample = 4 * C * w_pad * 4
        per_chunk = 2 * H * (C + O) * w_pad * 4
        # Largest piece whose halos fit half the budget AND leave room for
        # at least one double-buffered chunk.
        size = min(
            B,
            (_SCOPED_VMEM_BUDGET // 2) // max(halo_per_sample, 1),
            max(0, _SCOPED_VMEM_BUDGET - per_chunk) // max(halo_per_sample, 1),
        )
        chunk = 0
        if size > max_b:
            chunk = min(
                size,
                (_SCOPED_VMEM_BUDGET - halo_per_sample * size) // per_chunk,
            )
            # Bound the python-unrolled pipeline length (small-C shapes have
            # cheap halos and would otherwise unroll hundreds of chunks).
            size = min(size, _MAX_PIPELINE_CHUNKS * chunk)
            # Re-fit chunk for the final size, padding allowance included
            # (Bp = nchunks * chunk >= size).
            while chunk > 1:
                nck = -(-size // chunk)
                if (per_chunk * chunk
                        + halo_per_sample * nck * chunk) <= _SCOPED_VMEM_BUDGET:
                    break
                chunk -= 1
        if size > max_b and chunk >= 1:
            if size >= B:
                return _overlap_local_db(
                    x, kernel, axis_name, data_axis, min(chunk, B), interpret
                )
            outs = [
                _overlap_local_db(
                    x[i : i + size], kernel, axis_name, data_axis,
                    min(chunk, x[i : i + size].shape[0]), interpret,
                )
                for i in range(0, B, size)
            ]
            return jnp.concatenate(outs, axis=0)
        # Degenerate fallback: XLA chunking at the single-mirror size.
        n_chunks = -(-B // max_b)
        size = -(-B // n_chunks)
        outs = [
            _overlap_local(
                x[i : i + size], kernel, axis_name, data_axis, interpret
            )
            for i in range(0, B, size)
        ]
        return jnp.concatenate(outs, axis=0)
    # (O, C, dy, dx) -> (dx, O, 3C) with columns ordered [dy, c].
    kmat = jnp.transpose(
        jnp.transpose(kernel, (3, 2, 1, 0)).reshape(3, 3 * C, O), (0, 2, 1)
    )
    kern = partial(_overlap_kernel, axis_name=axis_name, data_axis=data_axis)
    xt = jnp.transpose(x, (2, 0, 1, 3)).astype(jnp.float32)  # (H, B, C, W)
    edges = jnp.stack([xt[0], xt[H - 1]])  # (2, B, C, W), XLA-sliced
    yt = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, B, O, W), jnp.float32),
        in_specs=[
            # Pin to HBM: ANY lets XLA place small operands in scoped vmem,
            # which has a 16M stack limit the staged block would blow.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, B, C, W), jnp.float32),
            pltpu.VMEM((2, B, C, W), jnp.float32),
            pltpu.VMEM((2, B, C, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xt, edges, kmat.astype(jnp.float32))
    return jnp.transpose(yt, (1, 2, 0, 3))  # (B, O, H, W)


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
