#!/usr/bin/env python
"""Distributed (dp x sp) training workflow.

Demonstrates the parallelism the reference lacked entirely (SURVEY.md
section 2.5): a 2-D (data, lat) mesh with batch sharding for data
parallelism and latitude-band activation sharding for spatial
decomposition, over a real TPU slice or virtual CPU devices
(``--virtual 8``). For multi-host pods, initialize with
``dlwp_tpu.parallel.distributed.initialize_distributed`` first.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices for a dry run")
    p.add_argument("--data-shards", type=int, default=-1)
    p.add_argument("--lat-shards", type=int, default=1)
    p.add_argument("--predictor-file", default=None)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args(argv)

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    import _path  # noqa: F401
    import jax
    from jax.sharding import PartitionSpec as P

    from dlwp_tpu.data import PredictorDataset, SeriesSampler, device_prefetch
    from dlwp_tpu.models import DLWPNeuralNet
    from dlwp_tpu.parallel import MeshConfig, build_mesh, batch_sharding

    print(f"devices: {len(jax.devices())}")
    mesh = build_mesh(
        MeshConfig(data=args.data_shards, lat=args.lat_shards)
    )
    print(f"mesh: {dict(mesh.shape)}")

    if args.predictor_file:
        data = PredictorDataset.from_file(args.predictor_file)
    else:
        from _synthetic import synthetic_predictor_file

        data = synthetic_predictor_file()

    dlwp = DLWPNeuralNet(time_dim=1, scaler_type=None)
    sampler = SeriesSampler(data, model=dlwp, batch_size=args.batch_size,
                            shuffle=True)
    c = sampler.convolution_shape[0]
    # With lat shards, the batch_spec also shards latitude bands and every
    # spherical conv switches onto the explicit halo-exchange path
    # (dlwp_tpu.parallel.spatial); with lat=1 this is plain data parallelism.
    spec = (
        P("data", None, "lat", None) if mesh.shape["lat"] > 1 else P("data")
    )
    dlwp.build_model(
        [("CyclicConv2D", (32, 3), {"activation": "tanh"}),
         ("CyclicConv2D", (64, 3), {"activation": "tanh"}),
         ("CyclicConv2D", (c, 3), {})],
        mesh=mesh,
        batch_spec=spec,
    )
    if dlwp._spatial is not None:
        print(f"spatial sharding: {mesh.shape['lat']} lat bands "
              f"({dlwp._spatial.impl})")
    t0 = time.time()
    dlwp.fit_generator(sampler, epochs=args.epochs, verbose=True)
    print(f"Train time -- {time.time() - t0:.0f} seconds")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
