#!/usr/bin/env python
"""Scaling-efficiency benchmark harness.

Measures grid-points/s of the sharded stencil + spectral paths at 1 chip vs
the full mesh, reporting scaling efficiency (target >= 85% at >= 2 hosts,
BASELINE.md). Runs on any device set: real TPU slices in deployment, or the
virtual CPU mesh (`--virtual 8`) for plumbing validation (virtual-mesh
numbers measure correctness, not hardware scaling).

Usage:
    python benchmarks/scaling.py [--virtual 8] [--lat-shards 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (plumbing mode)")
    p.add_argument("--lat-shards", type=int, default=0,
                   help="latitude shards (default: all devices)")
    p.add_argument("--nlat", type=int, default=128)
    p.add_argument("--nlon", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dlwp_tpu.parallel import sharded_cyclic_conv2d
    from dlwp_tpu.utils.profiling import ThroughputMeter

    devices = jax.devices()
    n = len(devices)
    lat_shards = args.lat_shards or n
    meter = ThroughputMeter(args.nlat, args.nlon)

    k = jnp.asarray(
        np.random.RandomState(1).randn(
            args.channels, args.channels, 3, 3
        ).astype(np.float32) * 0.05
    )
    x = np.random.RandomState(0).randn(
        args.batch, args.channels, args.nlat, args.nlon
    ).astype(np.float32)

    def measure(mesh, xs):
        @jax.jit
        def many(a):
            def body(c, _):
                return sharded_cyclic_conv2d(c, k, mesh, data_axis=None), None

            out, _ = jax.lax.scan(body, a, None, length=args.steps)
            return out

        out = many(xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = many(xs)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # Single device.
    mesh1 = Mesh(np.asarray(devices[:1]).reshape(1), ("lat",))
    x1 = jax.device_put(jnp.asarray(x), NamedSharding(mesh1, P()))
    t1 = measure(mesh1, x1)
    r1 = meter.rate(args.batch, args.steps, t1)

    # Full mesh, lat sharded.
    meshn = Mesh(np.asarray(devices[:lat_shards]).reshape(lat_shards), ("lat",))
    xn = jax.device_put(
        jnp.asarray(x), NamedSharding(meshn, P(None, None, "lat", None))
    )
    tn = measure(meshn, xn)
    rn = meter.rate(args.batch, args.steps, tn)

    eff = meter.scaling_efficiency(r1, rn, lat_shards)
    print(json.dumps({
        "devices": n,
        "lat_shards": lat_shards,
        "single_rate_gp_s": round(r1, 1),
        "sharded_rate_gp_s": round(rn, 1),
        "scaling_efficiency": round(eff, 4),
    }))


if __name__ == "__main__":
    main()
