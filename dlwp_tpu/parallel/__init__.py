"""Parallelism: device meshes, shardings, halo exchange, sharded spectral.

The reference's entire parallelism surface is single-host multi-GPU data
parallelism via ``keras.utils.multi_gpu_model`` (models.py:104-109) plus
multiprocessing download pools (SURVEY.md section 2.5). This package replaces
it with the TPU-native stack:

- ``data`` mesh axis: batch sharding (pure data parallelism);
- ``lat`` mesh axis: spatial domain decomposition in latitude bands, with
  neighbor halo exchange for stencils (``shard_map`` + ``ppermute`` --
  portable; a Pallas ICI remote-DMA kernel is the TPU fast path);
- spectral parallelism: all-to-all transpose between lat-band grid sharding
  and m-band spectral sharding around the Legendre contraction;
- multi-host: ``jax.distributed.initialize`` over DCN.
"""

from dlwp_tpu.parallel.mesh import MeshConfig, build_mesh, batch_sharding
from dlwp_tpu.parallel.halo import halo_exchange_lat, sharded_cyclic_conv2d
from dlwp_tpu.parallel.pallas_halo import pallas_sharded_cyclic_conv2d
from dlwp_tpu.parallel.pallas_overlap import overlapped_cyclic_conv2d
from dlwp_tpu.parallel.spatial import SpatialSharding

__all__ = [
    "MeshConfig",
    "build_mesh",
    "batch_sharding",
    "halo_exchange_lat",
    "sharded_cyclic_conv2d",
    "pallas_sharded_cyclic_conv2d",
    "overlapped_cyclic_conv2d",
    "SpatialSharding",
]
