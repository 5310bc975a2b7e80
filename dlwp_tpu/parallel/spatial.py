"""Spatial (latitude-band) sharding integration for model layers.

Round 1 built the domain-decomposed stencil paths as free functions
(:mod:`dlwp_tpu.parallel.halo`, :mod:`dlwp_tpu.parallel.pallas_halo`,
:mod:`dlwp_tpu.parallel.pallas_overlap`); this module wires them into the
layers users actually train. A :class:`SpatialSharding` config attaches to
:class:`~dlwp_tpu.models.layers.CyclicConv2D` (via ``build_sequential`` /
``DLWPNeuralNet.build_model(mesh=..., batch_spec=...)``) and dispatches each
conv to the explicit shard_map halo-exchange path whenever the shapes admit
it, falling back to the single-device formulation (which GSPMD partitions)
otherwise -- so one model definition serves single-chip, data-parallel, and
dp x sp spatial-parallel execution.

The reference's only integrated parallelism was ``multi_gpu_model`` inside
``DLWPNeuralNet.build_model`` (``DLWP/model/models.py:104-109``); this is
the TPU-native equivalent with spatial decomposition added on top.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P

from dlwp_tpu.ops.conv import cyclic_conv2d
from dlwp_tpu.parallel.halo import _local_cyclic_conv


@dataclasses.dataclass(frozen=True)
class SpatialSharding:
    """Latitude-band spatial decomposition config for spherical convs.

    Attributes:
        mesh: the device mesh; must contain ``lat_axis`` (and usually
            ``data_axis``).
        data_axis: mesh axis for batch sharding, or None for pure spatial.
        lat_axis: mesh axis the latitude dimension is sharded over.
        lon_axis: optional mesh axis the longitude dimension is sharded
            over (2-D lat x lon domain decomposition). The periodic
            boundary becomes a cyclic ppermute ring (SURVEY.md section 5.8)
            and the lat exchange runs first so corners ride along. The
            Pallas impls are lat-band-only; lon-sharded convs always take
            the ppermute path.
        impl: 'ppermute' (portable XLA collectives), 'pallas' (explicit
            ICI remote-DMA halo kernel + XLA conv; any kernel size and
            dilation -- the halo is a single contiguous multi-row DMA per
            direction), or 'overlap' (single Pallas kernel computing the
            interior stencil on the MXU while the halo DMAs fly; 3x3
            undilated convs only, others take the 'pallas' path). TPU, or
            interpret mode on CPU meshes.
        interpret: run Pallas kernels in interpret mode (CPU testing).

    Hashable/frozen so flax modules can carry it as a static field.
    """

    mesh: Mesh
    data_axis: str | None = "data"
    lat_axis: str = "lat"
    lon_axis: str | None = None
    impl: str = "ppermute"
    interpret: bool = False

    @property
    def lat_shards(self) -> int:
        return self.mesh.shape[self.lat_axis]

    @property
    def lon_shards(self) -> int:
        if self.lon_axis is None:
            return 1
        return self.mesh.shape[self.lon_axis]

    @property
    def data_shards(self) -> int:
        if self.data_axis is None:
            return 1
        return self.mesh.shape[self.data_axis]

    def activation_spec(self, ndim: int) -> P:
        """PartitionSpec for an (..., C, H, W) activation of rank ndim."""
        lead: tuple = (self.data_axis,) + (None,) * (ndim - 4)
        return P(*lead, None, self.lat_axis, self.lon_axis)

    # ------------------------------------------------------------- dispatch
    def shardable(self, x_shape, kernel_shape, strides, dilation, lat_mode) -> bool:
        """Whether the explicit shard_map halo path applies to this conv.

        Conditions (all static, evaluated at trace time):
        - more than one spatial shard (else the plain conv is the same op);
        - unit strides and zero-latitude boundaries (halo-exchange
          semantics deliver zeros on outer edges);
        - H / W divide evenly over the lat / lon shards, batch over the
          data shards;
        - each halo fits inside one neighbor block (single-hop exchange).
        """
        if self.lat_shards <= 1 and self.lon_shards <= 1:
            return False
        if strides != (1, 1) or lat_mode != "zero":
            return False
        H, W = x_shape[-2], x_shape[-1]
        B = x_shape[0] if len(x_shape) >= 4 else 1
        if H % self.lat_shards or (self.data_axis and B % self.data_shards):
            return False
        eh = (kernel_shape[-2] - 1) * dilation[0]
        halo = max(eh // 2, eh - eh // 2)
        if halo > H // self.lat_shards:
            return False
        if self.lon_shards > 1:
            if W % self.lon_shards:
                return False
            ew = (kernel_shape[-1] - 1) * dilation[1]
            if max(ew // 2, ew - ew // 2) > W // self.lon_shards:
                return False
        return True

    def conv(
        self,
        x: jax.Array,
        kernel: jax.Array,
        strides=(1, 1),
        dilation=(1, 1),
        lat_mode: str = "zero",
    ) -> jax.Array:
        """Cyclic conv via the sharded path when admissible, else local."""
        if not self.shardable(x.shape, kernel.shape, strides, dilation, lat_mode):
            return cyclic_conv2d(
                x, kernel, strides=strides, lat_mode=lat_mode, dilation=dilation
            )
        if self.impl in ("pallas", "overlap") and self.lon_shards <= 1:
            # Pallas kernels carry no autodiff rules: forward runs the
            # fast kernel, backward recomputes through the numerically
            # identical ppermute formulation (remat-style custom_vjp).
            return _fast_conv(x, kernel, self, tuple(dilation))
        return _ppermute_conv(x, kernel, self, tuple(dilation))


def _ppermute_conv(x, kernel, cfg: "SpatialSharding", dilation):
    """Sharded conv via the portable XLA-collective halo exchange."""
    kh = kernel.shape[-2]
    eh = (kh - 1) * dilation[0]
    fn = partial(
        _local_cyclic_conv,
        halo=(eh // 2, eh - eh // 2),
        axis_name=cfg.lat_axis,
        dilation=dilation,
        lon_axis_name=cfg.lon_axis if cfg.lon_shards > 1 else None,
    )
    spec = cfg.activation_spec(x.ndim)
    return jax.shard_map(
        fn, mesh=cfg.mesh, in_specs=(spec, P()), out_specs=spec
    )(x, kernel)


def _fast_conv_impl(x, kernel, cfg: "SpatialSharding", dilation):
    spec = cfg.activation_spec(x.ndim)
    if (
        cfg.impl == "overlap"
        and kernel.shape[-2:] == (3, 3)
        and dilation == (1, 1)
        and x.ndim == 4
    ):
        from dlwp_tpu.parallel.pallas_overlap import overlapped_cyclic_conv2d

        return overlapped_cyclic_conv2d(
            x, kernel, cfg.mesh, data_axis=cfg.data_axis,
            lat_axis_name=cfg.lat_axis, interpret=cfg.interpret,
        )
    from dlwp_tpu.parallel.pallas_halo import pallas_halo_exchange_lat
    from dlwp_tpu.ops.padding import pad_periodic
    from jax import lax

    kh, kw = kernel.shape[-2], kernel.shape[-1]
    # Dilation only widens the halo slab (still one contiguous
    # multi-row DMA per direction) and dilates the local conv.
    eh = (kh - 1) * dilation[0]
    ew = (kw - 1) * dilation[1]
    halo = (eh // 2, eh - eh // 2)

    def local_fn(xb, k):
        x4 = xb.reshape((-1,) + xb.shape[-3:])
        padded = pallas_halo_exchange_lat(
            x4, halo, axis_name=cfg.lat_axis,
            data_axis=cfg.data_axis, interpret=cfg.interpret,
        )
        padded = pad_periodic(padded, ((0, 0), (ew // 2, ew - ew // 2)))
        out = lax.conv_general_dilated(
            padded, k, (1, 1), "VALID",
            rhs_dilation=dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out.reshape(xb.shape[:-3] + out.shape[1:])

    return jax.shard_map(
        local_fn, mesh=cfg.mesh, in_specs=(spec, P()),
        out_specs=spec, check_vma=False,
    )(x, kernel)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fast_conv(x, kernel, cfg, dilation):
    return _fast_conv_impl(x, kernel, cfg, dilation)


def _fast_conv_fwd(x, kernel, cfg, dilation):
    return _fast_conv_impl(x, kernel, cfg, dilation), (x, kernel)


def _fast_conv_bwd(cfg, dilation, res, ct):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda xx, kk: _ppermute_conv(xx, kk, cfg, dilation), x, kernel
    )
    return vjp(ct)


_fast_conv.defvjp(_fast_conv_fwd, _fast_conv_bwd)


def attach_spatial(layer, spatial: SpatialSharding | None):
    """Return ``layer`` with ``spatial`` attached if it supports it (a
    no-op for layers without a ``spatial`` field or with one already set)."""
    if spatial is None:
        return layer
    if getattr(layer, "spatial", "missing") is None:
        return layer.clone(spatial=spatial)
    return layer
