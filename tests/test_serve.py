"""AOT serving export (dlwp_tpu.serve): parity with predict_timeseries,
artifact round-trips, batch polymorphism, and error paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_tpu.models import DLWPNeuralNet
from dlwp_tpu.serve import Servable, export_jitted, export_rollout


def _small_model(time_dim=2, c=2, nlat=8, nlon=16, scaler_type=None,
                 recurrent=False):
    dlwp = DLWPNeuralNet(
        is_recurrent=recurrent, time_dim=time_dim, scaler_type=scaler_type
    )
    c_io = time_dim * c
    if recurrent:
        specs = [
            ("ConvLSTM2D", (4, 3), {"return_sequences": True,
                                    "activation": "tanh"}),
            ("Reshape", ((time_dim * 4, nlat, nlon),), None),
            ("CyclicConv2D", (c, 3), {"activation": "linear"}),
            ("Reshape", ((1, c, nlat, nlon),), None),
        ]
        x = np.random.RandomState(0).randn(
            4, time_dim, c, nlat, nlon
        ).astype(np.float32)
    else:
        specs = [
            ("CyclicConv2D", (8, 3), {"activation": "tanh"}),
            ("CyclicConv2D", (c_io, 3), {"activation": "linear"}),
        ]
        x = np.random.RandomState(0).randn(4, c_io, nlat, nlon).astype(
            np.float32
        )
    dlwp.build_model(specs)
    dlwp.trainer.init(x)
    return dlwp, x


class TestExportRollout:
    def test_parity_and_batch_polymorphism(self, tmp_path):
        dlwp, x = _small_model()
        servable = export_rollout(dlwp, x, 4)
        # Same batch as the example.
        np.testing.assert_allclose(
            servable.predict_timeseries(x),
            dlwp.predict_timeseries(x, 4),
            rtol=1e-6,
        )
        # A batch size never seen at export time (symbolic 'b').
        x7 = np.random.RandomState(1).randn(7, *x.shape[1:]).astype(
            np.float32
        )
        np.testing.assert_allclose(
            servable.predict_timeseries(x7),
            dlwp.predict_timeseries(x7, 4),
            rtol=1e-6,
        )

    def test_save_load_roundtrip(self, tmp_path):
        dlwp, x = _small_model()
        path = str(tmp_path / "fc.dlwpserve")
        servable = export_rollout(dlwp, x, 2, path=path)
        loaded = Servable.load(path)
        assert "cpu" in loaded.platforms and "tpu" in loaded.platforms
        assert loaded.meta["kind"] == "rollout"
        np.testing.assert_allclose(
            loaded.predict_timeseries(x),
            servable.predict_timeseries(x),
            rtol=1e-6,
        )
        assert "rollout" in repr(loaded)
        # Bytes round-trip too.
        again = Servable.load(servable.serialize())
        np.testing.assert_allclose(
            again.predict_timeseries(x), servable.predict_timeseries(x),
            rtol=1e-6,
        )

    def test_scaler_travels_with_artifact(self, tmp_path):
        dlwp, x = _small_model(scaler_type="standard")
        y = np.random.RandomState(2).randn(*x.shape).astype(np.float32)
        dlwp.init_fit(x, y)
        servable = export_rollout(dlwp, x, 4)
        loaded = Servable.load(servable.serialize())
        np.testing.assert_allclose(
            loaded.predict_timeseries(x),
            dlwp.predict_timeseries(x, 4),
            rtol=1e-5,
        )

    def test_step_sequence(self):
        dlwp, x = _small_model()
        servable = export_rollout(dlwp, x, 3, step_sequence=True)
        np.testing.assert_allclose(
            servable.predict_timeseries(x),
            dlwp.predict_timeseries(x, 3, step_sequence=True),
            rtol=1e-6,
        )

    def test_recurrent(self):
        dlwp, x = _small_model(recurrent=True, time_dim=2)
        servable = export_rollout(dlwp, x, 2, step_sequence=True)
        np.testing.assert_allclose(
            servable.predict_timeseries(x),
            dlwp.predict_timeseries(x, 2, step_sequence=True),
            rtol=1e-6,
        )

    def test_pinned_batch(self):
        dlwp, x = _small_model()
        servable = export_rollout(dlwp, x, 2, batch=4)
        assert servable.predict_timeseries(x).shape[1] == 4
        with pytest.raises(ValueError):
            servable.call(jnp.zeros((5,) + x.shape[1:], jnp.float32))


class TestErrors:
    def test_unfitted_model(self):
        dlwp = DLWPNeuralNet(scaler_type=None)
        dlwp.build_model([("CyclicConv2D", (4, 3), {})])
        with pytest.raises(ValueError, match="no parameters"):
            export_rollout(dlwp, np.zeros((1, 4, 8, 16), np.float32), 2)

    def test_bad_magic_and_truncation(self, tmp_path):
        with pytest.raises(ValueError, match="magic"):
            Servable.load(b"NOTDLWP" + b"\0" * 64)
        dlwp, x = _small_model()
        blob = export_rollout(dlwp, x, 2).serialize()
        with pytest.raises(ValueError, match="truncated"):
            Servable.load(blob[: len(blob) // 2])

    def test_wrong_shape_call(self):
        dlwp, x = _small_model()
        servable = export_rollout(dlwp, x, 2)
        with pytest.raises(ValueError):
            servable.call(jnp.zeros((2, 3, 8, 16), jnp.float32))

    def test_custom_kind_has_no_timeseries(self):
        servable = export_jitted(
            lambda a: a * 2.0,
            (jax.ShapeDtypeStruct((3,), jnp.float32),),
            platforms=("cpu",),
        )
        np.testing.assert_allclose(
            servable.call(jnp.ones((3,), jnp.float32)), 2.0
        )
        with pytest.raises(ValueError, match="export_rollout"):
            servable.predict_timeseries(np.ones((3,), np.float32))


class TestBarotropicExport:
    def test_roundtrip_and_parity(self, tmp_path):
        from dlwp_tpu.barotropic import BarotropicModelPsi
        from dlwp_tpu.grid import LatLonGrid
        from dlwp_tpu.serve import Servable, export_barotropic

        grid = LatLonGrid.regular(25, 48)
        model = BarotropicModelPsi(grid, truncation=15, dt=1800.0)
        p = str(tmp_path / "baro.dlwpserve")
        sv = export_barotropic(model, 2, 3, platforms=("cpu",), path=p)
        z0 = jnp.asarray(
            100.0 * np.random.RandomState(0).randn(25, 48), jnp.float32
        )
        out = np.asarray(Servable.load(p).call(z0))
        assert out.shape == (2, 25, 48)
        _, _, ref = model.run_with_snapshots(model.from_z(z0), 2, 3)
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-5, atol=1e-4)

    def test_batch_polymorphic(self):
        from dlwp_tpu.barotropic import BarotropicModelPsi
        from dlwp_tpu.grid import LatLonGrid
        from dlwp_tpu.serve import export_barotropic

        grid = LatLonGrid.regular(25, 48)
        model = BarotropicModelPsi(grid, truncation=15, dt=1800.0)
        sv = export_barotropic(model, 2, 2, batch="b", platforms=("cpu",))
        for B in (1, 3):
            z0 = jnp.asarray(
                np.random.RandomState(B).randn(B, 25, 48), jnp.float32
            )
            assert np.asarray(sv.call(z0)).shape == (2, B, 25, 48)

    def test_pallas_model_rejected(self):
        from dlwp_tpu.barotropic import BarotropicModelPsi
        from dlwp_tpu.grid import LatLonGrid
        from dlwp_tpu.serve import export_barotropic

        grid = LatLonGrid.regular(25, 48)
        model = BarotropicModelPsi(
            grid, truncation=15, dt=1800.0, step_impl="pallas"
        )
        with pytest.raises(ValueError):
            export_barotropic(model, 2, 2)
