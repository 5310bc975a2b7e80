"""Tests for typed configs and orbax checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlwp_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from dlwp_tpu.train import TrainConfig, save_checkpoint, restore_checkpoint
from dlwp_tpu.parallel.mesh import MeshConfig


class TestExperimentConfig:
    def test_roundtrip_json(self, tmp_path):
        cfg = ExperimentConfig(
            name="test",
            data=DataConfig(input_time_steps=3, batch_size=32),
            model=ModelConfig(
                layers=(("CyclicConv2D", (8, 3), {"activation": "tanh"}),)
            ),
            train=TrainConfig(loss="mse", learning_rate=2e-3, epochs=5),
            mesh=MeshConfig(data=2, lat=4),
        )
        path = str(tmp_path / "cfg.json")
        cfg.to_json(path)
        back = ExperimentConfig.from_json(path)
        assert back.data.input_time_steps == 3
        assert back.train.learning_rate == 2e-3
        assert back.mesh.lat == 4
        assert back.name == "test"

    def test_unknown_field_rejected(self):
        with pytest.raises(ValueError, match="unknown"):
            ExperimentConfig.from_dict({"data": {"bogus_field": 1}})

    def test_defaults(self):
        cfg = ExperimentConfig()
        assert cfg.data.add_insolation is True
        assert cfg.train.optimizer == "adam"


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        params = {
            "dense": {
                "kernel": jnp.asarray(np.random.RandomState(0).randn(4, 8)),
                "bias": jnp.zeros(8),
            }
        }
        import optax

        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        save_checkpoint(
            str(tmp_path / "ckpt"), params, opt_state, step=7,
            metadata={"scaler_mean": [1.0, 2.0], "note": "test"},
        )
        state, meta = restore_checkpoint(str(tmp_path / "ckpt"))
        np.testing.assert_allclose(
            np.asarray(state["params"]["dense"]["kernel"]),
            np.asarray(params["dense"]["kernel"]),
        )
        assert meta["note"] == "test"
        assert meta["scaler_mean"] == [1.0, 2.0]

    def test_latest_step_selected(self, tmp_path):
        p1 = {"w": jnp.ones(3)}
        p2 = {"w": jnp.full(3, 2.0)}
        save_checkpoint(str(tmp_path / "c"), p1, step=1)
        save_checkpoint(str(tmp_path / "c"), p2, step=5)
        state, _ = restore_checkpoint(str(tmp_path / "c"))
        np.testing.assert_allclose(np.asarray(state["params"]["w"]), 2.0)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            restore_checkpoint(str(tmp_path / "empty"))


class TestTrainerCheckpointResume:
    def test_checkpoint_and_resume(self, tmp_path):
        from dlwp_tpu.models import build_sequential
        from dlwp_tpu.train import Trainer, TrainConfig

        model = build_sequential([("CyclicConv2D", (2, 3), {})])
        x = np.random.RandomState(0).randn(8, 2, 6, 12).astype(np.float32)
        y = np.roll(x, 1, axis=-1)
        ckpt = str(tmp_path / "ck")

        # Train 3 epochs with checkpointing.
        tr = Trainer(model, TrainConfig(epochs=3, batch_size=8, seed=2,
                                        shuffle=False))
        tr.fit(x=x, y=y, verbose=False, checkpoint_dir=ckpt)
        params_3 = jax.tree.map(np.asarray, tr.params)

        # Fresh trainer resumes from epoch 3 and trains to 6.
        tr2 = Trainer(model, TrainConfig(epochs=6, batch_size=8, seed=2,
                                         shuffle=False))
        tr2.init(jnp.asarray(x[:1]))
        hist = tr2.fit(x=x, y=y, verbose=False, checkpoint_dir=ckpt,
                       resume=True)
        assert hist.epoch[0] == 3  # continued, not restarted
        # Reference: one uninterrupted 6-epoch run with same config.
        tr3 = Trainer(model, TrainConfig(epochs=6, batch_size=8, seed=2,
                                         shuffle=False))
        hist3 = tr3.fit(x=x, y=y, verbose=False)
        np.testing.assert_allclose(
            hist.history["loss"], hist3.history["loss"][3:], rtol=1e-5
        )

    def test_fit_device_checkpoint_and_resume(self, tmp_path):
        """The device-resident epoch driver checkpoints/resumes like the
        per-batch path: a run killed after 3 epochs continues to 6 and
        reproduces the uninterrupted run's loss trajectory (including the
        shuffled batch order, whose RNG stream is re-aligned on resume)."""
        from dlwp_tpu.data import (
            DeviceSeriesSampler, PredictorDataset, SeriesSampler,
        )
        from dlwp_tpu.models import build_sequential
        from dlwp_tpu.train import Trainer

        rs = np.random.RandomState(1)
        ds = PredictorDataset(
            predictors=rs.randn(40, 2, 6, 12).astype(np.float32),
            sample=np.datetime64("2000-01-01")
            + np.arange(40) * np.timedelta64(6, "h"),
            varlev=["A/1", "B/1"],
            lat=np.linspace(75, -75, 6), lon=np.arange(12) * 30.0,
        )
        ckpt = str(tmp_path / "ckdev")

        def mk():
            dev = DeviceSeriesSampler(
                SeriesSampler(ds, batch_size=8, shuffle=True, seed=5)
            )
            model = build_sequential([("CyclicConv2D", (2, 3), {})])
            return dev, Trainer(model, TrainConfig(batch_size=8, seed=5))

        dev, tr = mk()
        tr.fit_device(dev, epochs=3, verbose=False, checkpoint_dir=ckpt)
        dev2, tr2 = mk()
        hist = tr2.fit_device(dev2, epochs=6, verbose=False,
                              checkpoint_dir=ckpt, resume=True)
        assert hist.epoch[0] == 3
        dev3, tr3 = mk()
        hist3 = tr3.fit_device(dev3, epochs=6, verbose=False)
        np.testing.assert_allclose(
            hist.history["loss"], hist3.history["loss"][3:], rtol=1e-5
        )
