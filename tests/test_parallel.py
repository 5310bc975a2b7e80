"""Multi-device tests on the 8-device virtual CPU mesh.

Validates sharded paths against their single-device oracles, per
SURVEY.md section 4(c): shard_map/halo-exchange/all-to-all-transpose
correctness without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dlwp_tpu.grid import LatLonGrid
from dlwp_tpu.ops import cyclic_conv2d
from dlwp_tpu.parallel import (
    MeshConfig,
    build_mesh,
    batch_sharding,
    sharded_cyclic_conv2d,
)
from dlwp_tpu.parallel.spectral import ShardedSphericalHarmonics
from dlwp_tpu.spectral import SphericalHarmonics


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


class TestMesh:
    def test_mesh_config_resolution(self):
        assert MeshConfig(data=-1, lat=2).resolve(8) == (4, 2, 1)
        assert MeshConfig(data=2, lat=-1).resolve(8) == (2, 4, 1)
        assert MeshConfig(data=2, lat=2, lon=2).resolve(8) == (2, 2, 2)
        assert MeshConfig(data=-1, lat=2, lon=2).resolve(8) == (2, 2, 2)
        with pytest.raises(ValueError):
            MeshConfig(data=3, lat=3).resolve(8)

    def test_build_mesh(self):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=4))
        assert mesh.shape == {"data": 2, "lat": 4}


class TestShardedConv:
    def test_matches_single_device(self):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=4))
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 24))
        k = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 3, 3)) * 0.1
        expect = cyclic_conv2d(x, k)

        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "lat", None)))
        out = sharded_cyclic_conv2d(xs, k, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-12)

    def test_dilated(self):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=1, lat=8))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 32, 16))
        k = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 3, 3)) * 0.1
        expect = cyclic_conv2d(x, k, dilation=(2, 2))
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = sharded_cyclic_conv2d(xs, k, mesh, dilation=(2, 2), data_axis=None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-12)


class TestLonSharding:
    """2-D (lat x lon) tile decomposition: the periodic longitude boundary
    as a cyclic ppermute ring (SURVEY.md section 5.8)."""

    def test_lon_halo_ring_matches_wrap(self):
        require_devices(4)
        from jax.sharding import Mesh
        from dlwp_tpu.parallel.halo import halo_exchange_lon

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("lon",))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 16))
        out = jax.shard_map(
            lambda a: halo_exchange_lon(a, (2, 1)),
            mesh=mesh,
            in_specs=P(None, None, None, "lon"),
            out_specs=P(None, None, None, "lon"),
        )(x)
        # Each local 4-column block becomes 7 columns: 2 wrapped from the
        # west, 1 from the east; globally that interleaves into blocks.
        blocks = [
            np.concatenate(
                [
                    np.asarray(x[..., (4 * i - 2) % 16 : (4 * i - 2) % 16 + 2]
                               if i else x[..., -2:]),
                    np.asarray(x[..., 4 * i : 4 * i + 4]),
                    np.asarray(x[..., (4 * i + 4) % 16 : (4 * i + 4) % 16 + 1]),
                ],
                axis=-1,
            )
            for i in range(4)
        ]
        np.testing.assert_allclose(
            np.asarray(out), np.concatenate(blocks, axis=-1), atol=1e-12
        )

    @pytest.mark.parametrize(
        "kshape,dilation",
        [((3, 3), (1, 1)), ((3, 3), (2, 2)), ((5, 5), (1, 1))],
    )
    def test_2d_tile_conv_matches_single_device(self, kshape, dilation):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=2, lon=2))
        assert mesh.shape == {"data": 2, "lat": 2, "lon": 2}
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 16, 24))
        k = jax.random.normal(jax.random.PRNGKey(5), (5, 3, *kshape)) * 0.1
        expect = cyclic_conv2d(x, k, dilation=dilation)
        xs = jax.device_put(
            x, NamedSharding(mesh, P("data", None, "lat", "lon"))
        )
        out = sharded_cyclic_conv2d(
            xs, k, mesh, dilation=dilation, lon_axis_name="lon"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), atol=1e-12
        )

    def test_lon_only_sharding(self):
        """Longitude-only decomposition (single lat band): the lat exchange
        degenerates to zero boundaries, the lon ring does all the work."""
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=1, lat=1, lon=8))
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 2, 8, 32))
        k = jax.random.normal(jax.random.PRNGKey(7), (4, 2, 3, 3)) * 0.1
        expect = cyclic_conv2d(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, None, "lon")))
        out = sharded_cyclic_conv2d(
            xs, k, mesh, data_axis=None, lon_axis_name="lon"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), atol=1e-12
        )

    def test_spatial_sharding_lon_grad_matches(self):
        """Gradients flow through the cyclic lon ring identically to the
        single-device conv (ppermute transposes to the reverse ring)."""
        require_devices(8)
        from dlwp_tpu.parallel.spatial import SpatialSharding

        mesh = build_mesh(MeshConfig(data=2, lat=2, lon=2))
        cfg = SpatialSharding(mesh=mesh, lat_axis="lat", lon_axis="lon")
        x = jax.random.normal(jax.random.PRNGKey(8), (4, 2, 8, 16))
        k = jax.random.normal(jax.random.PRNGKey(9), (3, 2, 3, 3)) * 0.1
        assert cfg.shardable(x.shape, k.shape, (1, 1), (1, 1), "zero")

        def loss_sharded(xx, kk):
            xx = jax.lax.with_sharding_constraint(
                xx, NamedSharding(mesh, cfg.activation_spec(4))
            )
            return jnp.sum(cfg.conv(xx, kk) ** 2)

        def loss_single(xx, kk):
            return jnp.sum(cyclic_conv2d(xx, kk) ** 2)

        gx_s, gk_s = jax.grad(loss_sharded, argnums=(0, 1))(x, k)
        gx_1, gk_1 = jax.grad(loss_single, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_1),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_1),
                                   atol=1e-10)

    def test_lon_sharded_training_matches_single_device(self):
        """Model-level 3-D mesh (data x lat x lon): build via
        DLWPNeuralNet.build_model with a 2-D-spatial batch_spec; loss
        history and rollout match the single-device oracle."""
        require_devices(8)
        from dlwp_tpu.models import DLWPNeuralNet

        mesh = build_mesh(MeshConfig(data=2, lat=2, lon=2))
        x = np.random.RandomState(0).randn(4, 2, 8, 16).astype(np.float32)
        y = np.roll(x, 1, axis=-1)

        def make(mesh=None, batch_spec=None):
            dlwp = DLWPNeuralNet(scaler_type=None)
            dlwp.build_model(
                [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
                 ("CyclicConv2D", (2, 3), {"activation": "linear"})],
                learning_rate=3e-3, mesh=mesh, batch_spec=batch_spec,
            )
            return dlwp

        sharded = make(mesh, P("data", None, "lat", "lon"))
        assert sharded._spatial is not None
        assert sharded._spatial.lon_axis == "lon"
        hist_s = sharded.fit(x, y, epochs=3, batch_size=4, verbose=False)
        single = make()
        hist_1 = single.fit(x, y, epochs=3, batch_size=4, verbose=False)
        np.testing.assert_allclose(
            hist_s.history["loss"], hist_1.history["loss"], rtol=2e-5
        )
        ts_s = sharded.predict_timeseries(x[:2], 3)
        ts_1 = single.predict_timeseries(x[:2], 3)
        np.testing.assert_allclose(ts_s, ts_1, rtol=2e-4, atol=1e-5)


class TestShardedSpectral:
    def _engines(self, lat_shards=4):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=-1, lat=lat_shards))
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        ssh = ShardedSphericalHarmonics(sh, mesh)
        return sh, ssh, mesh

    def test_divisibility_check(self):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(30, 60)  # 30 lats not divisible by 4
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        with pytest.raises(ValueError, match="divide"):
            ShardedSphericalHarmonics(sh, mesh)

    def test_analyze_matches(self):
        sh, ssh, mesh = self._engines()
        f = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64))
        expect = sh.analyze(f)
        fs = jax.device_put(f, NamedSharding(mesh, P(None, "lat", None)))
        got = ssh.analyze(fs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-12)

    def test_synthesize_matches(self):
        sh, ssh, mesh = self._engines()
        f = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
        spec = sh.analyze(f)
        expect = sh.synthesize(spec)
        specs = jax.device_put(spec, NamedSharding(mesh, P("lat", None)))
        got = ssh.synthesize(specs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-12)

    def test_roundtrip_sharded(self):
        sh, ssh, mesh = self._engines()
        f = jax.random.normal(jax.random.PRNGKey(2), (32, 64))
        spec = sh.analyze(f)
        fs = ssh.synthesize(
            jax.device_put(spec, NamedSharding(mesh, P("lat", None)))
        )
        spec2 = ssh.analyze(fs)
        np.testing.assert_allclose(
            np.asarray(spec2), np.asarray(spec), atol=1e-12
        )

    def test_vector_transforms_match(self):
        sh, ssh, mesh = self._engines()
        key1, key2 = jax.random.split(jax.random.PRNGKey(3))
        T = sh.truncation
        vrt = (
            jax.random.normal(key1, (T + 1, T + 1))
            + 1j * jax.random.normal(key2, (T + 1, T + 1))
        ) * sh.mask
        vrt = vrt.at[0].set(vrt[0].real * sh.mask[0]).at[:, 0].set(0)
        div = 0.3 * vrt
        eu, ev = sh.uv_from_vrtdiv(vrt, div)
        sspec = NamedSharding(mesh, P("lat", None))
        u, v = ssh.uv_from_vrtdiv(
            jax.device_put(vrt, sspec), jax.device_put(div, sspec)
        )
        np.testing.assert_allclose(np.asarray(u), np.asarray(eu), atol=1e-11)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ev), atol=1e-11)
        evrt, ediv = sh.vrtdiv_from_uv(eu, ev)
        gspec = NamedSharding(mesh, P("lat", None))
        vrt2, div2 = ssh.vrtdiv_from_uv(
            jax.device_put(u, gspec), jax.device_put(v, gspec)
        )
        np.testing.assert_allclose(np.asarray(vrt2), np.asarray(evrt), atol=1e-11)
        np.testing.assert_allclose(np.asarray(div2), np.asarray(ediv), atol=1e-11)


class TestDataParallelTraining:
    def test_batch_sharded_train_step(self):
        require_devices(8)
        from dlwp_tpu.models import build_sequential
        from dlwp_tpu.train import Trainer, TrainConfig

        mesh = build_mesh(MeshConfig(data=8, lat=1))
        model = build_sequential(
            [("CyclicConv2D", (4, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (2, 3), {})]
        )
        x = np.random.RandomState(0).randn(16, 2, 8, 16).astype(np.float32)
        y = np.roll(x, 1, axis=-1)
        # Data-parallel trainer: batch sharded over 'data'.
        tr = Trainer(model, TrainConfig(epochs=3, batch_size=16, seed=1),
                     mesh=mesh, batch_spec=P("data"))
        hist = tr.fit(x=x, y=y, verbose=False)
        # Oracle: identical config on a single device.
        tr2 = Trainer(model, TrainConfig(epochs=3, batch_size=16, seed=1))
        hist2 = tr2.fit(x=x, y=y, verbose=False)
        np.testing.assert_allclose(
            hist.history["loss"], hist2.history["loss"], rtol=1e-5
        )

    def test_spatial_sharded_training_matches_single_device(self):
        """The integrated dp x sp path (VERDICT round-1 item 1): a flagship
        SkipTower built via DLWPNeuralNet.build_model(mesh, batch_spec) with
        a lat axis trains with the explicit shard_map halo-exchange convs,
        and its loss history matches the single-device oracle."""
        require_devices(8)
        from jax.sharding import PartitionSpec as P
        from dlwp_tpu.models import DLWPNeuralNet
        from dlwp_tpu.parallel.spatial import SpatialSharding

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        x = np.random.RandomState(0).randn(8, 2, 16, 32).astype(np.float32)
        y = np.roll(x, 1, axis=-1)

        def make(mesh=None, batch_spec=None):
            dlwp = DLWPNeuralNet(scaler_type=None)
            dlwp.build_model(
                [("CyclicConv2D", (8, 3), {"dilation": 2, "activation": "tanh"}),
                 ("MaxPooling2D", (2,), None),
                 ("CyclicConv2D", (16, 3), {"activation": "tanh"}),
                 ("UpSampling2D", (2,), None),
                 ("CyclicConv2D", (2, 5), {"activation": "linear"})],
                learning_rate=3e-3, mesh=mesh, batch_spec=batch_spec,
            )
            return dlwp

        sharded = make(mesh, P("data", None, "lat", None))
        # The spatial config must actually be attached to the conv layers.
        assert isinstance(sharded._spatial, SpatialSharding)
        assert sharded.base_model.layers[0].spatial is sharded._spatial
        # And the top-level conv must take the explicit shard_map path.
        assert sharded._spatial.shardable(
            x.shape, (8, 2, 3, 3), (1, 1), (2, 2), "zero"
        )
        hist_s = sharded.fit(x, y, epochs=3, batch_size=8, verbose=False)
        single = make()
        hist_1 = single.fit(x, y, epochs=3, batch_size=8, verbose=False)
        np.testing.assert_allclose(
            hist_s.history["loss"], hist_1.history["loss"], rtol=2e-5
        )
        # Rollout parity: lat-sharded autoregressive scan vs single device.
        ts_s = sharded.predict_timeseries(x[:2], 3)
        ts_1 = single.predict_timeseries(x[:2], 3)
        np.testing.assert_allclose(ts_s, ts_1, rtol=2e-4, atol=1e-5)

    def test_spatial_sharded_sequence_training(self):
        """Sequence (multi-step) training with a lat-sharded batch: target
        sharding shifts past the step axis automatically."""
        require_devices(8)
        from jax.sharding import PartitionSpec as P
        from dlwp_tpu.models import DLWPFunctional

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        x = np.random.RandomState(0).randn(4, 1, 8, 16).astype(np.float32)
        y = np.stack([np.roll(x, 1, -1), np.roll(x, 2, -1)], axis=1)

        def make(mesh=None, batch_spec=None):
            dlwp = DLWPFunctional()
            dlwp.build_model(
                [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
                 ("CyclicConv2D", (1, 3), {})],
                sequence_steps=2, learning_rate=3e-3,
                mesh=mesh, batch_spec=batch_spec,
            )
            return dlwp

        sharded = make(mesh, P("data", None, "lat", None))
        hist_s = sharded.fit(x, y, epochs=3, batch_size=4, verbose=False)
        single = make()
        hist_1 = single.fit(x, y, epochs=3, batch_size=4, verbose=False)
        np.testing.assert_allclose(
            hist_s.history["loss"], hist_1.history["loss"], rtol=2e-5
        )

    def test_spatial_sharding_pallas_impl(self):
        """SpatialSharding(impl='pallas') drives the Pallas remote-DMA halo
        kernel (interpret mode on the 1-D CPU mesh) inside the layer."""
        require_devices(8)
        import jax
        from jax.sharding import Mesh
        from dlwp_tpu.models.layers import CyclicConv2D
        from dlwp_tpu.parallel.spatial import SpatialSharding

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("lat",))
        spatial = SpatialSharding(
            mesh=mesh, data_axis=None, lat_axis="lat", impl="pallas",
            interpret=True,
        )
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 3, 16, 24).astype(np.float32)
        )
        layer = CyclicConv2D(features=4, kernel_size=3, activation="tanh")
        params = layer.init(jax.random.PRNGKey(0), x)
        oracle = layer.apply(params, x)
        sharded_layer = CyclicConv2D(
            features=4, kernel_size=3, activation="tanh", spatial=spatial
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = sharded_layer.apply(params, xs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(oracle), atol=1e-5
        )

    def test_spatial_sharding_pallas_impl_dilated_and_5x5(self):
        """The 'pallas' impl covers dilated and 5x5 convs (multi-row halo
        slabs): the flagship's d2 3x3 and 5x5 output convs shard too."""
        require_devices(8)
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from dlwp_tpu.models.layers import CyclicConv2D
        from dlwp_tpu.parallel.spatial import SpatialSharding

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("lat",))
        spatial = SpatialSharding(
            mesh=mesh, data_axis=None, lat_axis="lat", impl="pallas",
            interpret=True,
        )
        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 3, 16, 24).astype(np.float32)
        )
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        for kw in [dict(kernel_size=3, dilation=2), dict(kernel_size=5)]:
            layer = CyclicConv2D(features=4, activation="tanh", **kw)
            params = layer.init(jax.random.PRNGKey(0), x)
            oracle = layer.apply(params, x)
            out = layer.clone(spatial=spatial).apply(params, xs)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(oracle), atol=1e-5
            )

    def test_spatial_sharding_overlap_impl(self):
        """SpatialSharding(impl='overlap') routes 3x3 undilated convs to
        the compute/comm-overlap kernel (interpret mode, 1-D mesh)."""
        require_devices(8)
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from dlwp_tpu.models.layers import CyclicConv2D
        from dlwp_tpu.parallel.spatial import SpatialSharding

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("lat",))
        spatial = SpatialSharding(
            mesh=mesh, data_axis=None, lat_axis="lat", impl="overlap",
            interpret=True,
        )
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 3, 16, 24).astype(np.float32)
        )
        layer = CyclicConv2D(features=4, kernel_size=3, activation="tanh")
        params = layer.init(jax.random.PRNGKey(0), x)
        oracle = layer.apply(params, x)
        sharded_layer = layer.clone(spatial=spatial)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = sharded_layer.apply(params, xs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(oracle), atol=1e-5
        )
        # Dilated convs are outside the overlap kernel's scope -> they
        # take the 'pallas' halo path (x here is unsharded, so the
        # shard_map runs via auto-sharding); result must still match.
        d = CyclicConv2D(features=4, kernel_size=3, dilation=2,
                         spatial=spatial)
        pd = CyclicConv2D(features=4, kernel_size=3, dilation=2).init(
            jax.random.PRNGKey(1), x
        )
        np.testing.assert_allclose(
            np.asarray(d.apply(pd, x)),
            np.asarray(
                CyclicConv2D(features=4, kernel_size=3, dilation=2).apply(pd, x)
            ),
            atol=1e-6,
        )

    def test_spatial_fallback_on_indivisible_shapes(self):
        """Odd H or ragged batch falls back to the local conv (same math)."""
        require_devices(8)
        import jax
        from dlwp_tpu.models.layers import CyclicConv2D
        from dlwp_tpu.parallel.spatial import SpatialSharding

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        spatial = SpatialSharding(mesh=mesh)
        # H=9 not divisible by 4 lat shards; B=1 not divisible by 2.
        assert not spatial.shardable((1, 2, 9, 16), (4, 2, 3, 3), (1, 1), (1, 1), "zero")
        x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 9, 16).astype(np.float32))
        layer = CyclicConv2D(features=4, kernel_size=3, spatial=spatial)
        plain = CyclicConv2D(features=4, kernel_size=3)
        params = plain.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(layer.apply(params, x)),
            np.asarray(plain.apply(params, x)),
            atol=1e-6,
        )

    def test_indivisible_lat_axis_degrades_gracefully(self):
        """A 37-lat grid over 4 lat shards cannot be spatially sharded;
        device placement drops the lat axis (with one warning) instead of
        crashing, and training proceeds data-parallel."""
        require_devices(8)
        import warnings as _warnings
        from jax.sharding import PartitionSpec as P
        from dlwp_tpu.models import DLWPNeuralNet

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        x = np.random.RandomState(0).randn(4, 2, 37, 72).astype(np.float32)
        dlwp = DLWPNeuralNet(scaler_type=None)
        dlwp.build_model(
            [("CyclicConv2D", (4, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (2, 3), {})],
            mesh=mesh, batch_spec=P("data", None, "lat", None),
        )
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            hist = dlwp.fit(x, x, epochs=1, batch_size=4, verbose=False)
        assert np.isfinite(hist.history["loss"][0])
        msgs = [w for w in caught if "non-dividing" in str(w.message)]
        assert len(msgs) == 1

    def test_ragged_batch_warns_once(self):
        require_devices(8)
        import warnings as _warnings
        from dlwp_tpu.models import build_sequential
        from dlwp_tpu.train import Trainer, TrainConfig

        mesh = build_mesh(MeshConfig(data=8, lat=1))
        model = build_sequential([("CyclicConv2D", (1, 1), {})])
        # 20 samples @ batch 16 -> final batch of 4 is not divisible by 8.
        x = np.zeros((20, 1, 4, 8), dtype=np.float32)
        tr = Trainer(model, TrainConfig(epochs=2, batch_size=16, shuffle=False),
                     mesh=mesh, batch_spec=P("data"))
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            tr.fit(x=x, y=x, verbose=False)
        ragged = [w for w in caught if "ragged batch" in str(w.message)]
        assert len(ragged) == 1  # warned, and only once across epochs


class TestPallasHalo:
    def test_interpret_mode_matches_oracle(self):
        """Pallas ICI halo-exchange kernel vs the single-device conv oracle,
        on a 1-D 8-device mesh in interpret mode (interpret-mode remote DMA
        supports single-axis meshes; real TPU path supports the 2-D
        (data, lat) mesh via MESH device ids)."""
        require_devices(8)
        from jax.sharding import Mesh
        from dlwp_tpu.parallel.pallas_halo import pallas_sharded_cyclic_conv2d

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("lat",))
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 24),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 3, 3),
                              dtype=jnp.float32) * 0.1
        expect = cyclic_conv2d(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = pallas_sharded_cyclic_conv2d(xs, k, mesh, data_axis=None,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)

    def test_5x5_kernel_halo2(self):
        require_devices(8)
        from jax.sharding import Mesh
        from dlwp_tpu.parallel.pallas_halo import pallas_sharded_cyclic_conv2d

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("lat",))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 32, 16),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 5, 5),
                              dtype=jnp.float32) * 0.1
        expect = cyclic_conv2d(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = pallas_sharded_cyclic_conv2d(xs, k, mesh, data_axis=None,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)


class TestShardedBarotropic:
    def test_matches_single_device_trajectory(self):
        """20-step sharded integration must match the single-device model."""
        require_devices(8)
        import jax.numpy as jnp
        from dlwp_tpu.parallel.barotropic import ShardedBarotropicModel
        from dlwp_tpu.barotropic import BarotropicModel

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(32, 64)
        T = 15  # T+1 = 16 divisible by 4
        kwargs = dict(dt=1800.0, damping_coefficient=1e-4, dtype=jnp.float64)
        ref = BarotropicModel(grid, T, **kwargs)
        shd = ShardedBarotropicModel(grid, T, mesh=mesh, **kwargs)

        lat = np.radians(grid.lat)[:, None]
        lon = np.radians(grid.lon)[None, :]
        z = 5500.0 - 300.0 * np.sin(lat) ** 2 + 60.0 * np.cos(lat) ** 3 * np.cos(3 * lon)
        state = ref.from_z(jnp.asarray(np.broadcast_to(z, (32, 64))))
        expect = ref.run(state, 20)

        sharded_state = BarotropicState = state.replace(
            vrt_spec=jax.device_put(state.vrt_spec, shd.spec_sharding()),
            vrt_spec_prev=jax.device_put(state.vrt_spec_prev, shd.spec_sharding()),
        )
        got = shd.run_sharded(sharded_state, 20)
        scale = np.abs(np.asarray(expect.vrt_spec)).max()
        np.testing.assert_allclose(
            np.asarray(got.vrt_spec), np.asarray(expect.vrt_spec),
            atol=1e-12 * scale,
        )
        assert int(got.step) == 20


class TestOverlappedStencil:
    def test_interpret_matches_oracle(self):
        """Compute/comm-overlap kernel (remote DMA + in-kernel MXU stencil)
        vs the single-device oracle."""
        require_devices(8)
        from jax.sharding import Mesh
        from dlwp_tpu.parallel.pallas_overlap import overlapped_cyclic_conv2d

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("lat",))
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 24),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 3, 3),
                              dtype=jnp.float32) * 0.1
        expect = cyclic_conv2d(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = overlapped_cyclic_conv2d(xs, k, mesh, data_axis=None,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)

    def test_double_buffered_pipeline_matches_oracle(self, monkeypatch):
        """The software-pipelined (double-buffered) kernel path, forced by
        shrinking the scoped-vmem budget, must match the oracle -- incl. a
        batch that does not divide the chunk (padding path)."""
        require_devices(8)
        from jax.sharding import Mesh
        import dlwp_tpu.parallel.pallas_overlap as po

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("lat",))
        k = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 3, 3),
                              dtype=jnp.float32) * 0.1
        for B in (6, 5):
            x = jax.random.normal(jax.random.PRNGKey(B), (B, 3, 16, 24),
                                  dtype=jnp.float32)
            expect = cyclic_conv2d(x, k)
            xs = jax.device_put(
                x, NamedSharding(mesh, P(None, None, "lat", None))
            )
            # Budget forces B > max_b -> pipelined path, chunk=1 (B chunks
            # in flight; B=5 additionally exercises the pad path).
            monkeypatch.setattr(po, "_SCOPED_VMEM_BUDGET", 40 * 1024)
            out = po.overlapped_cyclic_conv2d(
                xs, k, mesh, data_axis=None, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(expect), atol=1e-5
            )

    def test_two_shard_minimum_rows(self):
        require_devices(2)
        from jax.sharding import Mesh
        from dlwp_tpu.parallel.pallas_overlap import overlapped_cyclic_conv2d

        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("lat",))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 4, 16),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 3, 3),
                              dtype=jnp.float32) * 0.1
        expect = cyclic_conv2d(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "lat", None)))
        out = overlapped_cyclic_conv2d(xs, k, mesh, data_axis=None,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)


class TestDistributedHelpers:
    def test_multihost_mesh_single_process(self):
        require_devices(8)
        from dlwp_tpu.parallel.distributed import is_primary, multihost_mesh

        mesh = multihost_mesh(MeshConfig(data=-1, lat=2))
        assert mesh.shape == {"data": 4, "lat": 2}
        assert is_primary()  # single-process environment


class TestProfilingUtils:
    def test_throughput_meter(self):
        from dlwp_tpu.utils.profiling import StepTimer, ThroughputMeter

        m = ThroughputMeter(36, 144, n_chips=4)
        r = m.rate(batch=16, steps=10, seconds=2.0)
        assert r == 16 * 10 * 36 * 144 / 2.0
        assert m.rate_per_chip(16, 10, 2.0) == r / 4
        assert m.scaling_efficiency(100.0, 360.0, 4) == 0.9

        t = StepTimer()
        t.start()
        t.stop()
        assert t.best >= 0.0 and len(t.times) == 1


class TestShardedSpectralOptions:
    """fourier='matmul' and fold=True under the sharded engine must match
    the single-device engine exactly (f64 CPU: both reduce to the same
    arithmetic reassociated)."""

    @pytest.mark.parametrize(
        "fourier,fold",
        [("matmul", False), ("fft", True), ("matmul", True)],
    )
    def test_scalar_roundtrip_matches(self, fourier, fold):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(
            grid, 15, dtype=jnp.float64, fourier=fourier, fold=fold
        )
        ssh = ShardedSphericalHarmonics(sh, mesh)
        f = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64))
        expect_spec = sh.analyze(f)
        fs = jax.device_put(f, NamedSharding(mesh, P(None, "lat", None)))
        got_spec = ssh.analyze(fs)
        np.testing.assert_allclose(
            np.asarray(got_spec), np.asarray(expect_spec), atol=1e-12
        )
        expect_g = sh.synthesize(expect_spec)
        got_g = ssh.synthesize(
            jax.device_put(
                expect_spec, NamedSharding(mesh, P(None, "lat", None))
            )
        )
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(expect_g), atol=1e-12
        )

    @pytest.mark.parametrize(
        "fourier,fold",
        [("matmul", False), ("fft", True), ("matmul", True)],
    )
    def test_vector_transforms_match(self, fourier, fold):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(
            grid, 15, dtype=jnp.float64, fourier=fourier, fold=fold
        )
        ssh = ShardedSphericalHarmonics(sh, mesh)
        key1, key2 = jax.random.split(jax.random.PRNGKey(3))
        T = sh.truncation
        vrt = (
            jax.random.normal(key1, (T + 1, T + 1))
            + 1j * jax.random.normal(key2, (T + 1, T + 1))
        ) * sh.mask
        vrt = vrt.at[0].set(vrt[0].real * sh.mask[0]).at[:, 0].set(0)
        div = 0.3 * vrt
        eu, ev = sh.uv_from_vrtdiv(vrt, div)
        sspec = NamedSharding(mesh, P("lat", None))
        su, sv = ssh.uv_from_vrtdiv(
            jax.device_put(vrt, sspec), jax.device_put(div, sspec)
        )
        np.testing.assert_allclose(np.asarray(su), np.asarray(eu), atol=1e-11)
        np.testing.assert_allclose(np.asarray(sv), np.asarray(ev), atol=1e-11)
        evr, edv = sh.vrtdiv_from_uv(eu, ev)
        gspec = NamedSharding(mesh, P(None))
        svr, sdv = ssh.vrtdiv_from_uv(
            jax.device_put(eu, NamedSharding(mesh, P("lat", None))),
            jax.device_put(ev, NamedSharding(mesh, P("lat", None))),
        )
        np.testing.assert_allclose(
            np.asarray(svr), np.asarray(evr), atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(sdv), np.asarray(edv), atol=1e-11
        )

    def test_sharded_barotropic_matmul_fourier(self):
        """The domain-decomposed barotropic step inherits fourier='matmul'
        through the delegated longitude stage."""
        require_devices(8)
        from dlwp_tpu.barotropic import BarotropicModel
        from dlwp_tpu.parallel.barotropic import ShardedBarotropicModel

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(32, 64)
        kwargs = dict(dt=1800.0, damping_coefficient=1e-4,
                      dtype=jnp.float64, fourier="matmul")
        ref = BarotropicModel(grid, 15, **kwargs)
        shd = ShardedBarotropicModel(grid, 15, mesh=mesh, **kwargs)
        lat = np.radians(grid.lat)[:, None]
        lon = np.radians(grid.lon)[None, :]
        z = (5500.0 - 300.0 * np.sin(lat) ** 2
             + 60.0 * np.cos(lat) ** 3 * np.cos(3 * lon))
        state = ref.from_z(jnp.asarray(np.broadcast_to(z, (32, 64))))
        expect = ref.run(state, 10)
        got = shd.run_sharded(
            state.replace(
                vrt_spec=jax.device_put(state.vrt_spec, shd.spec_sharding()),
                vrt_spec_prev=jax.device_put(
                    state.vrt_spec_prev, shd.spec_sharding()
                ),
            ),
            10,
        )
        scale = np.abs(np.asarray(expect.vrt_spec)).max()
        np.testing.assert_allclose(
            np.asarray(got.vrt_spec), np.asarray(expect.vrt_spec),
            atol=1e-11 * scale,
        )


def _subjaxprs(v):
    """Yield any jaxprs hiding in an eqn param value (ClosedJaxpr, Jaxpr,
    or containers thereof)."""
    if hasattr(v, "eqns"):
        yield v
    elif hasattr(v, "jaxpr"):
        yield v.jaxpr
    elif isinstance(v, (tuple, list)):
        for item in v:
            yield from _subjaxprs(item)


def _collect_dot_precisions(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append(eqn.params.get("precision"))
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                _collect_dot_precisions(sub, out)


class TestShardedPrecisionAudit:
    """Every contraction in the *sharded* spectral paths must carry HIGHEST
    matmul precision.

    TPU lowers fp32 matmuls to reduced-precision bf16 MXU passes at DEFAULT
    precision -- the round-2 transforms finding (T170 fp32 round trips:
    3.1e-3 relative at default vs 2.5e-7 at 'highest', BASELINE.md) -- and
    the CPU-mesh parity tests that validate these paths structurally cannot
    detect it (CPU ignores the precision hint).  This audit walks the jaxpr
    instead, so a dropped ``precision=`` kwarg fails loudly on any backend.
    """

    HIGHEST = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)

    def _assert_all_highest(self, fn, *args, min_dots=1):
        closed = jax.make_jaxpr(fn)(*args)
        dots = []
        _collect_dot_precisions(closed.jaxpr, dots)
        assert len(dots) >= min_dots, (
            f"expected >= {min_dots} dot_general eqns, found {len(dots)}"
            " -- the audit no longer covers the contraction path"
        )
        bad = [p for p in dots if p != self.HIGHEST]
        assert not bad, f"dot_general(s) without HIGHEST precision: {bad}"

    def _engine(self):
        require_devices(8)
        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float32)
        return ShardedSphericalHarmonics(sh, mesh), mesh

    def test_analyze_synthesize(self):
        ssh, mesh = self._engine()
        f = jnp.zeros((2, 32, 64), jnp.float32)
        self._assert_all_highest(ssh.analyze, f)
        spec = jnp.zeros((2, 16, 16), jnp.complex64)
        self._assert_all_highest(ssh.synthesize, spec)

    def test_vector_transforms(self):
        ssh, mesh = self._engine()
        spec = jnp.zeros((16, 16), jnp.complex64)
        self._assert_all_highest(
            lambda v, d: ssh.uv_from_vrtdiv(v, d), spec, spec, min_dots=4
        )
        g = jnp.zeros((32, 64), jnp.float32)
        self._assert_all_highest(
            lambda u, v: ssh.vrtdiv_from_uv(u, v), g, g, min_dots=4
        )

    def test_sharded_barotropic_step(self):
        require_devices(8)
        from dlwp_tpu.parallel.barotropic import ShardedBarotropicModel

        mesh = build_mesh(MeshConfig(data=2, lat=4))
        grid = LatLonGrid.gaussian(32, 64)
        shd = ShardedBarotropicModel(
            grid, 15, mesh=mesh, dt=1800.0, damping_coefficient=1e-4,
            dtype=jnp.float32,
        )
        z = jnp.full((32, 64), 5500.0, jnp.float32)
        state = shd.from_z(z)
        self._assert_all_highest(
            lambda vs, vp: shd.run_sharded(
                state.replace(vrt_spec=vs, vrt_spec_prev=vp), 2
            ).vrt_spec,
            state.vrt_spec, state.vrt_spec_prev,
            min_dots=4,
        )
