"""Tests for the model layer: flax layers, declarative builder, wrapper API,
and the training loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlwp_tpu.models import (
    ConvLSTM2D,
    CyclicConv2D,
    DLWPNeuralNet,
    SequentialModel,
    build_sequential,
)
from dlwp_tpu.train import Trainer, TrainConfig
from dlwp_tpu.utils import save_model, load_model


def rand(*shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


def canonical_tower_specs(c_in, c_out, nlat, nlon):
    """The reference's conv-pool-upsample tower (examples/train.py:142-221)
    expressed in fused TPU-native layers."""
    return [
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh"}),
        ("MaxPooling2D", (2,), None),
        ("CyclicConv2D", (64, 3), {"activation": "tanh"}),
        ("MaxPooling2D", (2,), None),
        ("CyclicConv2D", (128, 3), {"activation": "tanh"}),
        ("UpSampling2D", (2,), None),
        ("CyclicConv2D", (64, 3), {"activation": "tanh"}),
        ("UpSampling2D", (2,), None),
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh"}),
        ("CyclicConv2D", (c_out, 5), {"activation": "linear"}),
    ]


class TestLayers:
    def test_cyclic_conv_shape_and_periodicity(self):
        m = CyclicConv2D(features=8, kernel_size=3, activation="tanh")
        x = rand(2, 3, 12, 24)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 8, 12, 24)
        y2 = m.apply(params, jnp.roll(x, 7, axis=-1))
        np.testing.assert_allclose(
            np.asarray(jnp.roll(y, 7, axis=-1)), np.asarray(y2), atol=1e-5
        )

    def test_convlstm_shapes(self):
        m = ConvLSTM2D(features=6, kernel_size=3, return_sequences=True)
        x = rand(2, 4, 3, 8, 16)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 4, 6, 8, 16)
        m2 = ConvLSTM2D(features=6, kernel_size=3, return_sequences=False)
        p2 = m2.init(jax.random.PRNGKey(0), x)
        assert m2.apply(p2, x).shape == (2, 6, 8, 16)

    def test_convlstm_gate_dtype(self):
        # gate_dtype='bfloat16' is a measured serving option (BASELINE.md:
        # -14% recurrent-step time on v5e): the gate elementwise chain runs
        # in bf16, the carry stays fp32. Same params, close trajectories,
        # fp32 output dtype.
        m32 = ConvLSTM2D(features=6, kernel_size=3)
        mbf = ConvLSTM2D(features=6, kernel_size=3, gate_dtype="bfloat16")
        x = rand(2, 5, 3, 8, 16)
        params = m32.init(jax.random.PRNGKey(0), x)
        y32 = m32.apply(params, x)
        ybf = mbf.apply(params, x)
        assert ybf.dtype == jnp.float32
        rms = float(jnp.sqrt(jnp.mean((y32 - ybf) ** 2)))
        mag = float(jnp.sqrt(jnp.mean(y32**2)))
        assert rms < 0.02 * mag, (rms, mag)
        # it must actually differ (bf16 rounding) -- guards against the
        # option silently not being applied
        assert rms > 0.0

    def test_convlstm_joint_unroll_equivalence(self, monkeypatch):
        # The joint zx+zh conv formulation (one conv of concat([x_t, h_t])
        # with the channel-concatenated kernel, input taps zero-stuffed to
        # the dense dilated-equivalent window) must be EXACT vs the
        # separate-conv form, including dilation > 1 and non-zero lat
        # modes (same padding extent, so identical boundary treatment).
        import dlwp_tpu.models.layers as layers_mod

        for dil, lat_mode in [(1, "zero"), (2, "zero"), (2, "edge")]:
            m = ConvLSTM2D(features=5, kernel_size=3, dilation=dil,
                           lat_mode=lat_mode, return_sequences=True)
            x = rand(2, 3, 4, 8, 16)  # T=3 -> unrolled branch
            params = m.init(jax.random.PRNGKey(2), x)
            monkeypatch.setattr(layers_mod, "CONVLSTM_UNROLL_JOINT",
                                "separate")
            y_sep = m.apply(params, x)
            monkeypatch.setattr(layers_mod, "CONVLSTM_UNROLL_JOINT",
                                "joint")
            y_joint = m.apply(params, x)
            np.testing.assert_allclose(
                np.asarray(y_sep), np.asarray(y_joint), atol=2e-6,
                err_msg=f"dil={dil} lat_mode={lat_mode}",
            )

    def test_convlstm_temporal_dependence(self):
        # Output at t must depend on inputs at t' <= t only.
        m = ConvLSTM2D(features=4, kernel_size=3)
        x = rand(1, 3, 2, 6, 12)
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        x_mod = x.at[:, 2].add(10.0)  # perturb the last step
        y_mod = m.apply(params, x_mod)
        np.testing.assert_allclose(
            np.asarray(y[:, :2]), np.asarray(y_mod[:, :2]), atol=1e-6
        )
        assert np.abs(np.asarray(y[:, 2] - y_mod[:, 2])).max() > 1e-3


class TestBuilder:
    def test_reference_style_specs(self):
        """Literal reference-style spec list (train.py:142-221 vocabulary)
        must resolve and run."""
        cs = (2, 9, 16)  # C, H, W (post-crop style)
        specs = [
            ("PeriodicPadding2D", ((0, 2),), {"data_format": "channels_first"}),
            ("ZeroPadding2D", ((2, 0),), {"data_format": "channels_first"}),
            ("Conv2D", (16, 3), {
                "dilation_rate": 2, "padding": "valid", "activation": "tanh",
                "data_format": "channels_first",
            }),
            ("MaxPooling2D", (2,), {"data_format": "channels_first"}),
            ("UpSampling2D", (2,), {"data_format": "channels_first"}),
            ("PeriodicPadding2D", ((0, 1),), {"data_format": "channels_first"}),
            ("ZeroPadding2D", ((1, 0),), {"data_format": "channels_first"}),
            ("Conv2D", (cs[0], 3), {"padding": "valid", "activation": "linear",
                                    "data_format": "channels_first"}),
        ]
        model = build_sequential(specs)
        x = rand(2, *cs)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        # 9 -> pad 2+2 -> 13 -> conv d2 valid -> 9 -> pool -> 4 -> up -> 8
        # -> pad 1+1 -> 10 -> conv valid -> 8
        assert y.shape == (2, cs[0], 8, 16)

    def test_fused_tower(self):
        specs = canonical_tower_specs(4, 2, 8, 16)
        model = build_sequential(specs)
        x = rand(2, 4, 8, 16)
        params = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(params, x).shape == (2, 2, 8, 16)

    def test_unknown_layer_raises(self):
        with pytest.raises(ValueError, match="unknown layer"):
            build_sequential([("NotALayer", (), {})])

    def test_peephole_fusion_equivalent_and_param_compatible(self):
        """build_sequential(fuse=True) rewrites conv+pool and upsample+conv
        pairs into fused layers with an IDENTICAL parameter tree and
        equivalent outputs (including the deferred-upsample chain where a
        dilation-2 UpConv's consumer also collapses)."""
        from __graft_entry__ import _tower_specs
        from dlwp_tpu.models.layers import (
            FusedConvPool2D, Identity, UpConv2D,
        )

        specs = _tower_specs(4)
        unfused = build_sequential(specs, fuse=False)
        fused = build_sequential(specs, fuse=True)
        kinds = [type(l) for l in fused.layers]
        assert kinds.count(FusedConvPool2D) == 2
        assert kinds.count(UpConv2D) == 3  # incl. the collapsed 5x5 conv10
        assert kinds.count(Identity) == 4
        assert fused.layers[8].emit_small  # conv9 defers its upsample
        x = rand(2, 6, 36, 144, key=3)
        params = unfused.init(jax.random.PRNGKey(0), x)
        y1 = unfused.apply(params, x)
        y2 = fused.apply(params, x)  # same params drive the fused graph
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y2), atol=3e-5
        )
        assert jax.tree_util.tree_structure(
            fused.init(jax.random.PRNGKey(0), x)
        ) == jax.tree_util.tree_structure(params)

    def test_tf_padding_registry(self):
        """Reference TFPadding2D/3D specs (custom.py:527-672) resolve and
        apply CONSTANT / SYMMETRIC / REFLECT semantics."""
        x = rand(2, 3, 4, 8)
        for mode, np_mode in [("SYMMETRIC", "symmetric"), ("REFLECT", "reflect")]:
            m = build_sequential([
                ("TFPadding2D", (((1, 1), (2, 2)),),
                 {"mode": mode, "data_format": "channels_first"}),
            ])
            p = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(p, x)
            expect = np.pad(
                np.asarray(x), [(0, 0), (0, 0), (1, 1), (2, 2)], mode=np_mode
            )
            np.testing.assert_allclose(np.asarray(y), expect)
        m = build_sequential([
            ("TFPadding2D", (((0, 1), (0, 0)),),
             {"mode": "CONSTANT", "constant_values": 7.0}),
        ])
        p = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(p, x))
        assert y.shape == (2, 3, 5, 8)
        np.testing.assert_allclose(y[:, :, -1], 7.0)
        # 3-D variant pads three trailing axes (ConvLSTM-style inputs).
        x5 = rand(2, 2, 3, 4, 8)
        m3 = build_sequential([
            ("TFPadding3D", (((0, 0), (1, 1), (2, 2)),), {"mode": "SYMMETRIC"}),
        ])
        p3 = m3.init(jax.random.PRNGKey(0), x5)
        assert m3.apply(p3, x5).shape == (2, 2, 3, 6, 12)


class TestTrainer:
    def test_loss_decreases(self):
        model = build_sequential(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (2, 3), {"activation": "linear"})]
        )
        x = np.asarray(rand(32, 2, 8, 16))
        y = np.roll(x, 1, axis=-1)  # learn a fixed shift
        tr = Trainer(model, TrainConfig(
            loss="mse", optimizer="adam", learning_rate=3e-3, epochs=30,
            batch_size=16, shuffle=True,
        ))
        hist = tr.fit(x=x, y=y, verbose=False)
        losses = hist.history["loss"]
        assert losses[-1] < 0.3 * losses[0]

    def test_early_stopping_min_epochs(self):
        model = build_sequential([("CyclicConv2D", (1, 1), {})])
        # Zero-in/zero-out: loss is exactly 0 every epoch, so no epoch ever
        # "improves" on the first -> stop as soon as min_epochs allows.
        x = np.zeros((8, 1, 4, 8), dtype=np.float32)
        tr = Trainer(model, TrainConfig(
            loss="mse", epochs=50, batch_size=8, early_stopping=True,
            min_epochs=5, patience=0, monitor="val_loss",
        ))
        hist = tr.fit(x=x, y=x, validation_data=(x, x), verbose=False)
        # Stops once past min_epochs with patience 0 (cannot stop earlier).
        assert len(hist.epoch) >= 5
        assert len(hist.epoch) < 50

    def test_sequence_training(self):
        """Multi-step joint loss (reference DLWPFunctional / sequence=k)."""
        model = build_sequential(
            [("CyclicConv2D", (4, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (1, 3), {})]
        )
        x = np.asarray(rand(16, 1, 6, 12))
        # Sequence target: two successive one-pixel shifts.
        y = np.stack([np.roll(x, 1, axis=-1), np.roll(x, 2, axis=-1)], axis=1)
        tr = Trainer(model, TrainConfig(
            loss="mse", learning_rate=3e-3, epochs=40, batch_size=16,
            sequence_steps=2,
        ))
        hist = tr.fit(x=x, y=y, verbose=False)
        assert hist.history["loss"][-1] < 0.5 * hist.history["loss"][0]

    def test_eval_impl_grad_matches_forward(self):
        """eval_impl='grad' (the TPU sequence-eval workaround,
        repro_eval_fault.py bisect) must return the same metrics as the
        forward-only program."""
        def mk(eval_impl):
            model = build_sequential(
                [("CyclicConv2D", (4, 3), {"activation": "tanh"}),
                 ("CyclicConv2D", (1, 3), {})]
            )
            tr = Trainer(model, TrainConfig(
                loss="mse", sequence_steps=2, eval_impl=eval_impl,
            ))
            return tr

        x = np.asarray(rand(8, 1, 6, 12))
        y = np.stack(
            [np.roll(x, 1, axis=-1), np.roll(x, 2, axis=-1)], axis=1
        )
        tr_f, tr_g, tr_o = mk("forward"), mk("grad"), mk("outer")
        tr_f.init(jnp.asarray(x))
        for other in (tr_g, tr_o):
            other.params = tr_f.params  # identical weights
            other.opt_state = tr_f.opt_state
        m_f = tr_f.evaluate((x, y))
        for other in (tr_g, tr_o):
            m_o = other.evaluate((x, y))
            assert m_f.keys() == m_o.keys()
            for k in m_f:
                np.testing.assert_allclose(m_f[k], m_o[k], rtol=1e-5)

    def test_generator_input(self):
        model = build_sequential([("CyclicConv2D", (1, 1), {})])

        class Gen:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                x = np.full((4, 1, 4, 8), float(i), dtype=np.float32)
                return x, x

            def __iter__(self):
                return (self[i] for i in range(len(self)))

        tr = Trainer(model, TrainConfig(epochs=2, batch_size=4))
        hist = tr.fit(generator=Gen(), verbose=False)
        assert len(hist.epoch) == 2


class TestDLWPNeuralNet:
    def _build(self, c=2, h=8, w=16, **kw):
        dlwp = DLWPNeuralNet(time_dim=1, scaler_type="standard", **kw)
        dlwp.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (c, 3), {})],
            loss="mse", optimizer="adam", learning_rate=3e-3,
        )
        return dlwp

    def test_fit_predict_with_scaling(self):
        dlwp = self._build()
        x = np.asarray(rand(32, 2, 8, 16)) * 50.0 + 5500.0
        y = np.roll(x, 1, axis=-1)
        dlwp.init_fit(x, y)
        dlwp.fit(x, y, epochs=30, batch_size=16, verbose=False)
        pred = dlwp.predict(x[:4])
        assert pred.shape == (4, 2, 8, 16)
        # Prediction is inverse-scaled back to physical units.
        assert abs(pred.mean() - 5500.0) < 200.0

    def test_predict_timeseries_whole_state(self):
        dlwp = self._build()
        x = np.asarray(rand(3, 2, 8, 16))
        dlwp.init_fit(x, x)
        dlwp.fit(x, x, epochs=1, batch_size=4, verbose=False)
        ts = dlwp.predict_timeseries(x, 4)
        assert ts.shape == (4, 3, 2, 8, 16)
        # Whole-state mode: step t+1 = model(step t); verify vs manual loop.
        p = x.copy()
        for t in range(2):
            p = dlwp.predict(p)
        np.testing.assert_allclose(ts[1], p, rtol=1e-4, atol=1e-5)

    def test_predict_timeseries_step_sequence(self):
        dlwp = DLWPNeuralNet(time_dim=2, scaler_type=None)
        dlwp.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (4, 3), {})],  # 4 = time_dim * 2 channels
        )
        x = np.asarray(rand(3, 4, 8, 16))
        dlwp.fit(x, x, epochs=1, batch_size=4, verbose=False)
        ts = dlwp.predict_timeseries(x, 3, step_sequence=True)
        assert ts.shape == (3, 3, 2, 8, 16)
        ts_keep = dlwp.predict_timeseries(x, 3, step_sequence=True, keep_time_dim=True)
        assert ts_keep.shape == (3, 3, 2, 2, 8, 16)

    def test_save_load_roundtrip(self, tmp_path):
        dlwp = self._build()
        x = np.asarray(rand(8, 2, 8, 16))
        dlwp.init_fit(x, x)
        dlwp.fit(x, x, epochs=2, batch_size=8, verbose=False)
        pred1 = dlwp.predict(x)
        path = str(tmp_path / "model")
        save_model(dlwp, path)
        loaded = load_model(path)
        pred2 = loaded.predict(x)
        np.testing.assert_allclose(pred1, pred2, atol=1e-6)

    def test_save_load_with_unpicklable_optimizer(self, tmp_path):
        """A model built with an optax transform (local-closure
        GradientTransformation, e.g. clip + cosine-decay adam -- the paper
        training configuration) must still persist: save strips the
        non-picklable optimizer (as the reference nulls Keras compile
        objects, util.py:143-147), reload warns and restores defaults, and
        inference is exact."""
        import optax

        dlwp = DLWPNeuralNet(time_dim=1, scaler_type=None)
        dlwp.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (2, 3), {})],
            optimizer=optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adam(optax.cosine_decay_schedule(1e-3, 10, 0.05)),
            ),
        )
        x = np.asarray(rand(8, 2, 8, 16))
        dlwp.fit(x, x, epochs=1, batch_size=8, verbose=False)
        pred1 = dlwp.predict(x)
        path = str(tmp_path / "chain_model")
        save_model(dlwp, path)
        with pytest.warns(UserWarning, match="non-picklable"):
            loaded = load_model(path)
        np.testing.assert_allclose(pred1, loaded.predict(x), atol=1e-6)

    def test_imputation(self):
        dlwp = self._build(impute_missing=True)
        x = np.asarray(rand(16, 2, 8, 16)).copy()
        x[0, 0, 0, 0] = np.nan
        y = np.nan_to_num(np.roll(x, 1, axis=-1))
        dlwp.init_fit(x, y)
        dlwp.fit(x, y, epochs=1, batch_size=8, verbose=False)
        pred = dlwp.predict(x[:2])
        assert np.isfinite(pred).all()


class TestDLWPFunctional:
    def test_sequence_training_and_predict(self):
        from dlwp_tpu.models import DLWPFunctional

        dlwp = DLWPFunctional(time_dim=1)
        assert dlwp.scaler_type is None  # reference models.py:321-322
        dlwp.build_model(
            [("CyclicConv2D", (4, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (1, 3), {})],
            sequence_steps=2, learning_rate=3e-3,
        )
        x = np.asarray(rand(8, 1, 6, 12))
        y = np.stack([np.roll(x, 1, -1), np.roll(x, 2, -1)], axis=1)
        hist = dlwp.fit(x, y, epochs=5, batch_size=8, verbose=False)
        assert len(hist.epoch) == 5
        seq = dlwp.predict_sequence(x[:2])
        assert seq.shape == (2, 2, 1, 6, 12)  # (_n_steps, sample, ...)

    def test_save_load_roundtrip(self, tmp_path):
        """DLWPFunctional persists and reloads through load_model's class
        registry (round-1 gap: only DLWPNeuralNet was registered)."""
        from dlwp_tpu.models import DLWPFunctional

        dlwp = DLWPFunctional(time_dim=1)
        dlwp.build_model(
            [("CyclicConv2D", (4, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (1, 3), {})],
            sequence_steps=2,
        )
        x = np.asarray(rand(4, 1, 6, 12))
        y = np.stack([np.roll(x, 1, -1), np.roll(x, 2, -1)], axis=1)
        dlwp.fit(x, y, epochs=1, batch_size=4, verbose=False)
        pred1 = dlwp.predict(x)
        path = str(tmp_path / "func_model")
        save_model(dlwp, path)
        loaded = load_model(path)
        assert isinstance(loaded, DLWPFunctional)
        assert loaded._n_steps == 2
        np.testing.assert_allclose(pred1, loaded.predict(x), atol=1e-6)


class TestLossPickling:
    def test_factories_pickle(self):
        import pickle
        from dlwp_tpu.ops.losses import (
            anomaly_correlation_loss, latitude_weighted_loss, mse,
        )

        lats = np.linspace(90, -90, 5)
        l1 = latitude_weighted_loss(mse, lats)
        l2 = anomaly_correlation_loss(mean=np.zeros((1, 2, 5, 8)))
        r1 = pickle.loads(pickle.dumps(l1))
        r2 = pickle.loads(pickle.dumps(l2))
        yt = rand(2, 2, 5, 8)
        yp = rand(2, 2, 5, 8, key=1)
        assert abs(float(l1(yt, yp)) - float(r1(yt, yp))) < 1e-12
        assert abs(float(l2(yt, yp)) - float(r2(yt, yp))) < 1e-12


class TestRecurrentTimeseries:
    def test_recurrent_step_sequence(self):
        """predict_timeseries step_sequence for is_recurrent models
        (models.py:282-283: slide the time axis directly)."""
        dlwp = DLWPNeuralNet(is_recurrent=True, time_dim=3, scaler_type=None)
        # Recurrent model: (B, T, C, H, W) -> (B, T, C, H, W) via ConvLSTM.
        dlwp.build_model(
            [("ConvLSTM2D", (4, 3), {"return_sequences": True}),
             # project features back to C=2 per step with a 3-D-safe conv
             ("CyclicConv2D", (2, 1), {})],
        )
        x = np.asarray(rand(2, 3, 2, 6, 12))
        dlwp.fit(x, x, epochs=1, batch_size=2, verbose=False)
        ts = dlwp.predict_timeseries(x, 4, step_sequence=True)
        assert ts.shape == (4, 2, 2, 6, 12)
        ts_k = dlwp.predict_timeseries(x, 4, step_sequence=True,
                                       keep_time_dim=True)
        assert ts_k.shape == (4, 2, 3, 2, 6, 12)


class TestSkipTower:
    def test_shapes_and_training(self):
        from dlwp_tpu.models import SkipTower

        model = SkipTower(c_out=2, width=16)
        x = rand(4, 2, 8, 16)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (4, 2, 8, 16)
        # It trains.
        tr = Trainer(model, TrainConfig(epochs=10, learning_rate=3e-3,
                                        batch_size=4))
        xs = np.asarray(rand(8, 2, 8, 16))
        hist = tr.fit(x=xs, y=np.roll(xs, 1, -1), verbose=False)
        assert hist.history["loss"][-1] < hist.history["loss"][0]

    def test_recurrent_front_end(self):
        from dlwp_tpu.models import SkipTower

        model = SkipTower(c_out=2, width=16, time_steps=2, lstm_features=4)
        x = rand(2, 2, 3, 8, 16)  # (B, T, C, H, W)
        params = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(params, x).shape == (2, 2, 8, 16)

    def test_slice_layer_registry(self):
        specs = [
            ("slice_layer", (0, 2, 1), None),
            ("CyclicConv2D", (3, 3), {}),
        ]
        m = build_sequential(specs)
        x = rand(2, 5, 6, 12)
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == (2, 3, 6, 12)
