"""Tests for utility modules: scalers, splits, NaN handling, reflection."""

import os
import numpy as np
import pytest

from dlwp_tpu.utils import (
    MeanImputer,
    MinMaxScaler,
    StandardScaler,
    delete_nan_samples,
    get_classes,
    get_from_module,
    get_methods,
    train_test_split_ind,
)


class TestScalers:
    def test_standard_roundtrip(self):
        x = np.random.RandomState(0).randn(50, 3, 4) * 7 + 3
        s = StandardScaler().fit(x)
        xs = s.transform(x)
        assert abs(xs.mean()) < 1e-10
        np.testing.assert_allclose(s.inverse_transform(xs), x, atol=1e-10)

    def test_standard_nan_tolerant_and_zero_std(self):
        x = np.ones((10, 2))
        x[0, 0] = np.nan
        s = StandardScaler().fit(x)
        assert (s.std_ == 1.0).all()  # zero-variance guard
        assert np.isfinite(s.transform(np.ones((3, 2)))).all()

    def test_minmax(self):
        x = np.random.RandomState(1).rand(30, 4) * 10 - 5
        s = MinMaxScaler().fit(x)
        xs = s.transform(x)
        assert xs.min() >= -1e-12 and xs.max() <= 1 + 1e-12
        np.testing.assert_allclose(s.inverse_transform(xs), x, atol=1e-10)

    def test_imputer(self):
        x = np.arange(12, dtype=float).reshape(4, 3)
        x[1, 2] = np.nan
        imp = MeanImputer().fit(x)
        out = imp.transform(x)
        assert np.isfinite(out).all()
        expect = np.nanmean(x[:, 2])  # mean over non-NaN rows of column 2
        assert out[1, 2] == pytest.approx(expect)


class TestSplits:
    def test_split_modes(self):
        tr, te = train_test_split_ind(10, 3, "first")
        assert list(te) == [0, 1, 2] and len(tr) == 7
        tr, te = train_test_split_ind(10, 3, "last")
        assert list(te) == [7, 8, 9]
        tr1, te1 = train_test_split_ind(10, 3, "random", seed=5)
        tr2, te2 = train_test_split_ind(10, 3, "random", seed=5)
        np.testing.assert_array_equal(te1, te2)
        assert len(set(te1) & set(tr1)) == 0
        with pytest.raises(ValueError):
            train_test_split_ind(10, 3, "bogus")

    def test_delete_nan_samples(self):
        p = np.random.RandomState(0).randn(6, 4)
        t = np.random.RandomState(1).randn(6, 4)
        p[2, 1] = np.nan
        t[4, 0] = np.nan
        p2, t2, keep = delete_nan_samples(p, t)
        assert len(p2) == 4 and len(t2) == 4
        assert not keep[2] and not keep[4]

    def test_delete_nan_threshold(self):
        p = np.zeros((3, 10))
        p[0, :6] = np.nan  # 60% NaN -> dropped at threshold 0.5
        p[1, 0] = np.nan  # 10% NaN -> kept, zero-filled
        p2, _, keep = delete_nan_samples(p, threshold=0.5)
        assert list(keep) == [False, True, True]
        assert np.isfinite(p2).all()

    def test_large_fill_value(self):
        p = np.zeros((3, 4))
        p[1, 2] = 1e32
        p2, _, keep = delete_nan_samples(p, large_fill_value=True)
        assert list(keep) == [True, False, True]


class TestReflection:
    def test_get_from_module(self):
        fn = get_from_module("dlwp_tpu.ops.losses", "mse")
        import dlwp_tpu.ops.losses as m

        assert fn is m.mse
        with pytest.raises(AttributeError):
            get_from_module("dlwp_tpu.ops.losses", "nope")

    def test_get_classes_methods(self):
        classes = get_classes("dlwp_tpu.utils.scaler")
        assert "StandardScaler" in classes
        methods = get_methods(classes["StandardScaler"])
        assert "fit" in methods and "transform" in methods


class TestPreprocessorProductMode:
    def test_variables_times_levels(self):
        from dlwp_tpu.data import Preprocessor
        from test_data import SyntheticSource

        pp = Preprocessor(SyntheticSource(n=10))
        ds = pp.data_to_series(["HGT", "THICK"], [500, 1000], pairwise=False)
        assert ds.varlev == ["HGT/500", "HGT/1000", "THICK/500", "THICK/1000"]
        assert ds.predictors.shape[1] == 4

    def test_levelless_variable(self):
        from dlwp_tpu.data import Preprocessor
        from test_data import SyntheticSource

        pp = Preprocessor(SyntheticSource(n=10))
        ds = pp.data_to_series(["T2M"], [None], pairwise=True)
        assert ds.varlev == ["T2M"]


class TestTensorBoardWriter:
    """The hand-encoded event files must parse with the OFFICIAL tensorboard
    reader (the oracle for the TFRecord/Event wire format)."""

    def _read_events(self, logdir):
        tb = pytest.importorskip("tensorboard")  # noqa: F841  (oracle only)
        from tensorboard.backend.event_processing import event_file_loader
        import glob

        (path,) = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
        return list(event_file_loader.EventFileLoader(path).Load())

    def test_scalars_readable_by_tensorboard(self, tmp_path):
        from dlwp_tpu.utils import TensorBoardWriter

        with TensorBoardWriter(str(tmp_path)) as tb:
            for step, v in enumerate([0.5, 0.25, 0.125]):
                tb.scalar("loss", v, step)
            tb.scalar("val_loss", 1.5, 0, wall_time=123.25)
        events = self._read_events(str(tmp_path))
        assert events[0].file_version == "brain.Event:2"

        def val(v):
            # The loader's data-compat layer migrates simple_value into the
            # generic tensor form; accept either.
            return (v.tensor.float_val[0] if v.HasField("tensor")
                    else v.simple_value)

        scalars = [
            (e.summary.value[0].tag, e.step,
             pytest.approx(val(e.summary.value[0])))
            for e in events[1:]
        ]
        assert scalars == [
            ("loss", 0, 0.5), ("loss", 1, 0.25), ("loss", 2, 0.125),
            ("val_loss", 0, 1.5),
        ]
        assert events[4].wall_time == 123.25

    def test_trainer_callback_and_run_protocols(self, tmp_path):
        from dlwp_tpu.utils import TensorBoardWriter
        from dlwp_tpu.train.callbacks import RunHistory

        tb = TensorBoardWriter(str(tmp_path))
        tb(0, {"loss": 1.0, "val_loss": 2.0}, None)  # epoch callback
        RunHistory(tb)(1, {"loss": 0.5}, None)       # run.log protocol
        tb.close()
        events = self._read_events(str(tmp_path))[1:]
        got = {(e.summary.value[0].tag, e.step) for e in events}
        assert ("loss", 0) in got and ("val_loss", 0) in got
        assert ("loss", 0) in got  # run protocol starts its own step count

    def test_crc32c_known_vectors(self):
        # RFC 3720 / golang hash/crc32 Castagnoli test vectors.
        from dlwp_tpu.utils.tensorboard import crc32c

        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
