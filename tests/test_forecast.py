"""Tests for rollout orchestration and verification metrics."""

import numpy as np
import jax
import pytest

from dlwp_tpu.data import Preprocessor, SeriesSampler
from dlwp_tpu.forecast import TimeSeriesEstimator, verify
from dlwp_tpu.models import DLWPNeuralNet

from test_data import SyntheticSource, make_series


class TestVerifyMetrics:
    def test_forecast_error_same_rank(self):
        f = np.zeros((3, 4, 5))
        v = np.ones((3, 4, 5))
        np.testing.assert_allclose(verify.forecast_error(f, v, "mse"), [1, 1, 1])
        np.testing.assert_allclose(verify.forecast_error(f, v, "rmse"), [1, 1, 1])
        with pytest.raises(ValueError):
            verify.forecast_error(f, v, "bogus")

    def test_forecast_error_lagged(self):
        # valid is a series; forecast[f] aligns with valid[f:].
        valid = np.full((6, 1), 5.0)
        forecast = np.stack([valid + 1, valid + 2])  # constant biases 1, 2
        err = verify.forecast_error(forecast, valid, "mae")
        np.testing.assert_allclose(err, [1.0, 2.0])

    def test_persistence_and_climo(self):
        valid = np.sin(np.arange(10))[:, None]
        pers = verify.persistence_error(valid, valid, 3, "mse")
        assert pers[0] == 0.0  # persistence at lag 0 is exact
        assert pers[1] > 0.0
        cl = verify.climo_error(valid, 3, "mse")
        assert (cl > 0).all()

    def test_monthly_climo(self):
        times = np.datetime64("2001-01-01") + np.arange(365) * np.timedelta64(1, "D")
        months = times.astype("datetime64[M]").astype(int) % 12
        series = months.astype(float)[:, None]  # exactly the monthly mean
        err = verify.monthly_climo_error(series, times, np.arange(365), method="rmse")
        assert err < 1e-12
        errs = verify.monthly_climo_error(series, times, np.arange(365), n_fhour=4)
        assert errs.shape == (4,)

    def test_predictors_to_time_series(self):
        p = np.arange(2 * 3 * 4).reshape(2, 3, 4)
        np.testing.assert_array_equal(
            verify.predictors_to_time_series(p, 3), p[:, -1]
        )
        np.testing.assert_array_equal(
            verify.predictors_to_time_series(p, 3, use_first_step=True), p[:, 0]
        )
        flat = p.reshape(2, 12)
        np.testing.assert_array_equal(
            verify.predictors_to_time_series(flat, 3, has_time_dim=False),
            p.reshape(2, 3, 4)[:, -1],
        )

    def test_verification_from_series(self):
        ds = make_series(n=20)
        ver, f_hour = verify.verification_from_series(ds, forecast_steps=3, dt_hours=6)
        assert ver.shape == (3,) + ds.predictors.shape
        np.testing.assert_array_equal(f_hour, [6, 12, 18])
        arr = np.asarray(ds.predictors)
        # Entry [f, d] = state at init_time d + (f+1) steps.
        np.testing.assert_allclose(ver[0, 0], arr[1])
        np.testing.assert_allclose(ver[2, 4], arr[7])
        # Beyond the end: NaN.
        assert np.isnan(ver[2, -1]).all()

    def test_verification_masks_across_restart_markers(self):
        """An all-NaN marker row (segment restart boundary in barotropic
        archives) breaks series continuity: valid states past it belong to
        an unrelated restarted flow and must be masked, not scored — with
        K boundaries in a subset, every lead-L error row otherwise absorbs
        ~K*L cross-restart pairs of O(field-variance) magnitude (measured
        28.8 m at 72 h on the round-5 paper archive whose true baseline
        error was 0.06 m; BASELINE.md round 5)."""
        ds = make_series(n=20)
        arr = np.asarray(ds.predictors).copy()
        arr[10] = np.nan  # restart marker
        ds.predictors = arr
        ver, _ = verify.verification_from_series(ds, forecast_steps=4)
        # init 8: leads land on 9 (ok), 10 (marker -> NaN), 11, 12 (past
        # the marker -> masked)
        assert np.isfinite(ver[0, 8]).all()
        assert np.isnan(ver[1, 8]).all()
        assert np.isnan(ver[2, 8]).all()
        assert np.isnan(ver[3, 8]).all()
        # init 11 (after the marker): all leads within the new segment
        assert np.isfinite(ver[0, 11]).all()
        assert np.isfinite(ver[3, 11]).all()
        # opt-out restores the raw lookup
        ver_raw, _ = verify.verification_from_series(
            ds, forecast_steps=4, mask_discontinuous=False
        )
        assert np.isfinite(ver_raw[2, 8]).all()


class TestTimeSeriesEstimator:
    def _fit_model(self, ds, **sampler_kw):
        model = DLWPNeuralNet(time_dim=sampler_kw.get("input_time_steps", 1),
                              scaler_type=None)
        sampler = SeriesSampler(ds, model=model, batch_size=8, **sampler_kw)
        c_in = sampler.convolution_shape[0]
        c_out = sampler.output_convolution_shape[0]
        model.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (c_out, 3), {})],
        )
        x, y = sampler[0]
        model.fit(x, y, epochs=1, batch_size=8, verbose=False)
        return model, sampler

    def test_matched_io_rollout(self):
        ds = make_series(n=30)
        model, sampler = self._fit_model(ds)
        est = TimeSeriesEstimator(model, sampler)
        fc = est.predict(4, samples=[0, 1, 2])
        assert fc.values.shape == (4, 3, 2, 9, 18)
        np.testing.assert_array_equal(fc.f_hour, [6, 12, 18, 24])
        assert np.isfinite(fc.values).all()

    def test_init_batch_size_chunking_exact(self):
        """Chunked prediction (incl. a padded ragged final chunk) must be
        bit-identical to the all-at-once rollout."""
        ds = make_series(n=40)
        model, sampler = self._fit_model(ds)
        est = TimeSeriesEstimator(model, sampler)
        samples = list(range(7))  # 7 inits, chunk 3 -> 3+3+1(padded)
        full = est.predict(3, samples=samples)
        chunked = est.predict(3, samples=samples, init_batch_size=3)
        np.testing.assert_array_equal(full.values, chunked.values)
        np.testing.assert_array_equal(full.f_hour, chunked.f_hour)
        assert list(full.times) == list(chunked.times)
        # chunk >= n_init degenerates to the unchunked path
        big = est.predict(3, samples=samples, init_batch_size=64)
        np.testing.assert_array_equal(full.values, big.values)

    def test_insolation_precompute_matches_in_scan(self):
        """The memory-gated precomputed insolation scan input must produce
        the same rollout as the in-scan per-step contraction."""
        import dlwp_tpu.forecast.rollout as R

        ds = make_series(n=40)
        model = DLWPNeuralNet(time_dim=2, scaler_type=None)
        sampler = SeriesSampler(
            ds, model=model, input_time_steps=2, output_time_steps=2,
            add_insolation=True, batch_size=8,
        )
        c_out = sampler.output_convolution_shape[0]
        model.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (c_out, 3), {})],
        )
        x, y = sampler[0]
        model.fit(x, y, epochs=1, batch_size=8, verbose=False)
        est = TimeSeriesEstimator(model, sampler)
        pre = est.predict(4, samples=[0, 1, 2])
        saved = R.SOL_PRECOMPUTE_BUDGET
        R.SOL_PRECOMPUTE_BUDGET = 0  # force the in-scan path
        try:
            ins = est.predict(4, samples=[0, 1, 2])
        finally:
            R.SOL_PRECOMPUTE_BUDGET = saved
        np.testing.assert_allclose(
            np.asarray(pre.values), np.asarray(ins.values),
            rtol=1e-6, atol=1e-6,
        )

    def test_rollout_matches_manual_loop(self):
        """Whole-state matched-I/O rollout must equal repeated predict."""
        ds = make_series(n=30)
        model, sampler = self._fit_model(ds)
        est = TimeSeriesEstimator(model, sampler)
        fc = est.predict(3, samples=[0, 1])
        p, _ = sampler.generate([0, 1])
        cur = p
        for step in range(3):
            cur = model.predict(cur)
            np.testing.assert_allclose(
                fc.values[step], cur, rtol=2e-4, atol=1e-5
            )

    def test_insolation_and_imputed_channels(self):
        """Model predicts only HGT; THICK is imputed with the mean state and
        SOL recomputed per valid time (extensions.py:231-240 semantics)."""
        ds = make_series(n=30)
        model = DLWPNeuralNet(time_dim=2, scaler_type=None)
        sampler = SeriesSampler(
            ds, model=model, input_time_steps=2, output_time_steps=2,
            output_sel=["HGT/500"], add_insolation=True, batch_size=8,
        )
        c_out = sampler.output_convolution_shape[0]
        model.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (c_out, 3), {})],
        )
        x, y = sampler[0]
        model.fit(x, y, epochs=1, batch_size=8, verbose=False)
        est = TimeSeriesEstimator(model, sampler)
        assert est._sources == [("pred", 0), ("impute", 1), ("sol", None)]
        fc = est.predict(3, samples=[0, 1, 2])
        assert fc.values.shape == (6, 3, 1, 9, 18)  # 3 iters x out_ts=2
        np.testing.assert_array_equal(fc.f_hour, [6, 12, 18, 24, 30, 36])
        assert np.isfinite(fc.values).all()
        assert fc.varlev == ["HGT/500"]

    def test_unscale(self):
        ds = make_series(n=30)
        model, sampler = self._fit_model(ds)
        est = TimeSeriesEstimator(model, sampler)
        fc_scaled = est.predict(2, samples=[0])
        fc_phys = est.predict(2, samples=[0], unscale=True)
        expect = fc_scaled.values * ds.std[:, None, None] + ds.mean[:, None, None]
        np.testing.assert_allclose(fc_phys.values, expect, rtol=1e-5)

    def test_interval_stride(self):
        """interval=2: the input/output gap is one extra data step; the
        rollout feeds whole states back and f_hour advances accordingly
        (reference extensions.py:220-224 sample arithmetic)."""
        ds = make_series(n=30)
        model, sampler = self._fit_model(ds, interval=2)
        est = TimeSeriesEstimator(model, sampler)
        fc = est.predict(3, samples=[0, 1])
        # f_hour(it, 0) = (it*adv + k)*dt with es=1, k=2 -> adv=2: 12,24,36 h.
        np.testing.assert_array_equal(fc.f_hour, [12, 24, 36])
        # Matched I/O: window = prediction each step, so values must equal
        # repeated model application regardless of interval.
        p, _ = sampler.generate([0, 1])
        cur = p
        for step in range(3):
            cur = model.predict(cur)
            np.testing.assert_allclose(
                fc.values[step], cur, rtol=2e-4, atol=1e-5
            )

    def test_output_exceeds_input_time_steps(self):
        """out_ts > in_ts (reference extensions.py:165-172): the next window
        is seeded from the first (prefer_first_times) or last in_ts
        predicted steps."""
        ds = make_series(n=30)
        model = DLWPNeuralNet(time_dim=1, scaler_type=None)
        sampler = SeriesSampler(
            ds, model=model, input_time_steps=1, output_time_steps=2,
            batch_size=8,
        )
        c_out = sampler.output_convolution_shape[0]
        model.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (c_out, 3), {})],
        )
        x, y = sampler[0]
        model.fit(x, y, epochs=1, batch_size=8, verbose=False)
        est = TimeSeriesEstimator(model, sampler)
        for prefer_first, sel in [(True, slice(0, 2)), (False, slice(2, 4))]:
            fc = est.predict(2, samples=[0, 1], prefer_first_times=prefer_first)
            assert fc.values.shape == (4, 2, 2, 9, 18)
            # Manual loop: predict gives 2 steps (4 channels); next input is
            # the first (or last) predicted step.
            p, _ = sampler.generate([0, 1])
            pred1 = model.predict(p)  # (B, 2*2, H, W)
            np.testing.assert_allclose(
                fc.values[0], pred1[:, :2], rtol=2e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                fc.values[1], pred1[:, 2:], rtol=2e-4, atol=1e-5
            )
            nxt = pred1[:, sel]
            pred2 = model.predict(nxt)
            np.testing.assert_allclose(
                fc.values[2], pred2[:, :2], rtol=2e-4, atol=1e-5
            )
        # f_hour: prefer_first -> es=in_ts=1, adv=1: [6,12,12,18].
        fc = est.predict(2, samples=[0], prefer_first_times=True)
        np.testing.assert_array_equal(fc.f_hour, [6, 12, 12, 18])

    def test_interval_with_kept_inputs_imputes_stale_slots(self):
        """out_ts < in_ts with interval > 1: window slots that are neither
        predicted nor carried from the previous window fall back to the mean
        state (the reference reindexes to missing and imputes,
        extensions.py:228-233)."""
        ds = make_series(n=40)
        model = DLWPNeuralNet(time_dim=2, scaler_type=None)
        sampler = SeriesSampler(
            ds, model=model, input_time_steps=2, output_time_steps=1,
            interval=3, batch_size=8,
        )
        c_out = sampler.output_convolution_shape[0]
        model.build_model(
            [("CyclicConv2D", (8, 3), {"activation": "tanh"}),
             ("CyclicConv2D", (c_out, 3), {})],
        )
        x, y = sampler[0]
        model.fit(x, y, epochs=1, batch_size=8, verbose=False)
        est = TimeSeriesEstimator(model, sampler)
        fc = est.predict(2, samples=[0, 1])
        assert fc.values.shape == (2, 2, 2, 9, 18)
        assert np.isfinite(fc.values).all()
        # adv = es + k - 1 = 3; slot 0 has j=None and 0+3 >= in_ts=2 -> mean.
        np.testing.assert_array_equal(fc.f_hour, [18, 36])


class TestVerifyACC:
    def test_perfect_forecast_acc_one(self):
        rng = np.random.RandomState(0)
        valid = rng.randn(4, 6, 5, 5)
        acc = verify.anomaly_correlation(valid, valid)
        np.testing.assert_allclose(acc, np.ones(4), atol=1e-12)

    def test_climatology_forecast_acc_zero_denominator_safe(self):
        valid = np.random.RandomState(1).randn(3, 8, 4, 4)
        # Anti-correlated forecast -> ACC near -1.
        climo = valid.mean(axis=(0, 1), keepdims=True)
        anti = 2 * climo - valid
        acc = verify.anomaly_correlation(anti, valid)
        np.testing.assert_allclose(acc, -np.ones(3), atol=1e-10)


class TestServingGateDtype:
    def test_estimator_gate_dtype_override(self):
        """TimeSeriesEstimator(gate_dtype='bfloat16') rebuilds ConvLSTM2D
        specs with the serving-precision gate chain (weights unchanged)
        and rolls out close to the fp32 trajectory — the measured +26%
        serving lever (BASELINE.md round 5). Default None must leave the
        specs untouched so scoring paths see the as-trained dtype."""
        import jax.numpy as jnp

        ds = make_series(n=30)
        model = DLWPNeuralNet(is_recurrent=True, time_dim=2,
                              scaler_type=None)
        sampler = SeriesSampler(ds, model=model, batch_size=8,
                                input_time_steps=2, output_time_steps=2)
        model.build_model(
            [("ConvLSTM2D", (4, 3), {"return_sequences": True}),
             ("CyclicConv2D", (2, 1), {})],
        )
        x, y = sampler[0]
        model.fit(x, y, epochs=1, batch_size=8, verbose=False)
        params_before = model.trainer.params

        est32 = TimeSeriesEstimator(model, sampler)
        assert all(
            (s[2] or {}).get("gate_dtype") is None
            for s in model.layer_specs if s[0] == "ConvLSTM2D"
        )
        fc32 = est32.predict(3, samples=[0, 1])

        est16 = TimeSeriesEstimator(model, sampler, gate_dtype="bfloat16")
        # The SERVED copy gets the bf16 gate chain...
        assert any(
            (s[2] or {}).get("gate_dtype") == jnp.bfloat16
            for s in est16.model.layer_specs if s[0] == "ConvLSTM2D"
        )
        assert est16.model.trainer.params is params_before  # weights survive
        # ...while the caller's model keeps its as-trained specs and
        # trainer (round-5b fix: the serving estimator must not mutate
        # the model that scoring paths keep using).
        assert est16.model is not model
        assert all(
            (s[2] or {}).get("gate_dtype") is None
            for s in model.layer_specs if s[0] == "ConvLSTM2D"
        )
        assert model.trainer.params is params_before
        fc16 = est16.predict(3, samples=[0, 1])

        assert fc16.values.shape == fc32.values.shape
        # bf16 gates perturb, not break: small relative deviation.
        scale = np.sqrt(np.mean(fc32.values ** 2))
        dev = np.sqrt(np.mean((fc32.values - fc16.values) ** 2))
        assert 0 < dev < 0.05 * scale, (dev, scale)
        # The caller's model still predicts the exact fp32 trajectory.
        fc32b = TimeSeriesEstimator(model, sampler).predict(3,
                                                           samples=[0, 1])
        np.testing.assert_array_equal(fc32.values, fc32b.values)
