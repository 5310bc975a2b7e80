"""Real multi-process jax.distributed validation (SURVEY section 5.8).

Spawns two actual Python processes, each exposing 4 virtual CPU devices,
wires them through ``initialize_distributed`` against a localhost
coordinator, builds a global (data, lat) multihost_mesh over all 8
devices, and runs a cross-process data-parallel train step -- the
multi-host logic the reference never had, exercised without TPU pods.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from dlwp_tpu.parallel.distributed import (
    initialize_distributed, is_primary, multihost_mesh,
)
from dlwp_tpu.parallel.mesh import MeshConfig

pid = int(sys.argv[1])
initialize_distributed(
    coordinator_address={addr!r}, num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost_mesh(MeshConfig(data=4, lat=2))
assert dict(mesh.shape) == {{"data": 4, "lat": 2}}

# Cross-process collective: global sum of a fully sharded array via a
# jitted reduction (each process supplies its 4 local shards).
sharding = NamedSharding(mesh, P(("data", "lat")))
global_shape = (8, 4)
local = np.arange(16, dtype=np.float32).reshape(4, 4) + 16 * pid
arrays = [
    jax.device_put(local[i : i + 1], d)
    for i, d in enumerate(mesh.local_devices[:4])
]
x = jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
expect = float(np.arange(16).sum() + (np.arange(16) + 16).sum())
assert abs(float(total) - expect) < 1e-3, (float(total), expect)

assert is_primary() == (pid == 0)
print(f"proc {{pid}} OK total={{float(total)}}", flush=True)
"""


def test_two_process_distributed(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, addr=addr))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
