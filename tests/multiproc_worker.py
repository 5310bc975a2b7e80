"""Subprocess worker for the real multi-process ``jax.distributed`` test.

Run as::

    python multiproc_worker.py <coordinator> <num_processes> <process_id>

Each process exposes 2 virtual CPU devices, so two processes form a
4-device global mesh across 2 "hosts" connected over localhost TCP — the
DCN stand-in. This exercises ``dlwp_tpu.parallel.distributed`` (coordinator
bring-up, ``multihost_mesh``, ``is_primary``) plus the two cross-host
collective patterns the framework relies on (SURVEY.md section 5.8):

1. data-parallel gradient reduction: a jitted loss/grad over a global batch
   whose shards live on different processes (XLA inserts the cross-host
   psum, lowered onto the gloo CPU collectives backend here, ICI/DCN on
   TPU);
2. latitude-band halo exchange across the process boundary:
   ``sharded_cyclic_conv2d`` on a lat-sharded field whose neighbouring
   bands belong to different processes (the ppermute rides the same
   cross-host transport).

Prints machine-checkable ``KEY value`` lines that the parent test asserts
on. Exit code 0 means every in-process assertion held.
"""

import os
import sys


def main() -> None:
    coordinator = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])

    # Must be in place before the CPU backend is created (jax itself may
    # already be imported by site customization; these are read lazily).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # The env var alone is ineffective if jax was already imported (its
    # config default is captured at import time) -- pin via the config API
    # too, so the documented standalone invocation cannot silently pick a
    # non-CPU backend.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

    from dlwp_tpu.parallel.distributed import (
        initialize_distributed,
        is_primary,
        multihost_mesh,
    )

    # Coordinator bring-up before any backend-initializing query.
    initialize_distributed(coordinator, nproc, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlwp_tpu.ops.conv import cyclic_conv2d
    from dlwp_tpu.parallel.halo import sharded_cyclic_conv2d
    from dlwp_tpu.parallel.mesh import MeshConfig

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert is_primary() == (pid == 0)
    print(f"CHECKS_OK {pid}", flush=True)
    print(f"PRIMARY {int(is_primary())}", flush=True)

    # mixed dp x sp multihost mesh resolves over all processes' devices
    mesh_mixed = multihost_mesh(MeshConfig(data=nproc, lat=2))
    assert dict(mesh_mixed.shape) == {"data": nproc, "lat": 2}

    # --- 1. cross-host data-parallel gradient -----------------------------
    mesh = multihost_mesh(MeshConfig(data=-1, lat=1))
    assert mesh.shape["data"] == 2 * nproc

    batch, feat = 8, 5
    rng = np.random.RandomState(0)
    x_all = rng.randn(batch, feat).astype(np.float32)
    y_all = rng.randn(batch).astype(np.float32)
    w0 = np.linspace(-1.0, 1.0, feat).astype(np.float32)

    per = batch // nproc
    x_sh = NamedSharding(mesh, P("data", None))
    y_sh = NamedSharding(mesh, P("data"))
    xg = jax.make_array_from_process_local_data(
        x_sh, x_all[pid * per : (pid + 1) * per]
    )
    yg = jax.make_array_from_process_local_data(
        y_sh, y_all[pid * per : (pid + 1) * per]
    )

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    loss, grad = jax.jit(jax.value_and_grad(loss_fn))(jnp.asarray(w0), xg, yg)
    # loss/grad are fully replicated -> fetchable on every process.
    loss = float(jax.device_get(loss))
    grad = np.asarray(jax.device_get(grad))
    print(f"LOSS {loss:.9e}", flush=True)
    print("GRAD " + " ".join(f"{g:.9e}" for g in grad), flush=True)

    # --- 2. lat-band halo exchange across the process boundary ------------
    mesh_sp = multihost_mesh(MeshConfig(data=1, lat=-1))
    assert mesh_sp.shape["lat"] == 2 * nproc

    B, C, H, W = 2, 3, 8, 16
    field = rng.randn(B, C, H, W).astype(np.float32)
    kernel = rng.randn(4, C, 3, 3).astype(np.float32)
    f_sh = NamedSharding(mesh_sp, P(None, None, "lat", None))
    fg = jax.make_array_from_callback(field.shape, f_sh, lambda idx: field[idx])

    out = jax.jit(
        lambda a, k: sharded_cyclic_conv2d(
            a, k, mesh_sp, data_axis=None, lat_axis_name="lat"
        )
    )(fg, jnp.asarray(kernel))
    out_full = np.asarray(multihost_utils.process_allgather(out, tiled=True))

    oracle = np.asarray(
        jax.device_get(
            jax.jit(cyclic_conv2d)(jnp.asarray(field), jnp.asarray(kernel))
        )
    )
    err = float(np.max(np.abs(out_full - oracle)))
    assert err < 1e-5, err
    print(f"SPCONV_OK {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
