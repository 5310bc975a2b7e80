"""compile_forward_safe: the forward-only-compile workaround as API.

The wrapper must (a) return the forward values unchanged, (b) actually
attach a backward pass (the whole point — the fwd+bwd program class is the
one that compiles/runs where forward-only lowerings fault on v5e,
benchmarks/probes/repro_eval_fault.py), and (c) cover the known-bad
program shape: a latitude-WEIGHTED loss reduction inside a forward-only
sequence scan (BASELINE.md round 4 bisect).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.utils import compile_forward_safe
from dlwp_tpu.ops.losses import latitude_weighted_loss


def _n_eqns(fn, *args):
    def count(jaxpr):
        n = len(jaxpr.eqns)
        for eq in jaxpr.eqns:
            for v in eq.params.values():
                if hasattr(v, "jaxpr"):
                    n += count(v.jaxpr)
        return n

    return count(jax.make_jaxpr(fn)(*args).jaxpr)


def _has_backward(fn, safe_fn, *args):
    """The safe form must lower strictly more work (the attached backward
    pass); scans additionally show a reverse=True backward scan."""
    return _n_eqns(safe_fn, *args) > _n_eqns(fn, *args)


class TestCompileForwardSafe:
    def test_values_unchanged_pytree(self):
        def fn(params, x):
            y = jnp.tanh(x @ params["w"] + params["b"])
            return {"y": y, "n": jnp.int32(3), "s": jnp.sum(y)}

        rng = np.random.RandomState(0)
        params = {
            "w": jnp.asarray(rng.randn(4, 5)),
            "b": jnp.asarray(rng.randn(5)),
        }
        x = jnp.asarray(rng.randn(3, 4))
        ref = fn(params, x)
        out = jax.jit(compile_forward_safe(fn))(params, x)
        np.testing.assert_allclose(out["y"], ref["y"], rtol=1e-12)
        np.testing.assert_allclose(out["s"], ref["s"], rtol=1e-12)
        assert int(out["n"]) == 3

    def test_backward_pass_present(self):
        def fn(p, x):
            return jnp.tanh(x * p).sum(axis=0)

        p = jnp.float32(0.3)
        x = jnp.ones((4, 3), jnp.float32)
        assert _has_backward(fn, compile_forward_safe(fn), p, x)

    def test_decorator_with_argnums(self):
        @compile_forward_safe(argnums=1)
        def fn(n_steps, params, x):
            # First positional arg is an int — differentiating through it
            # would fail; argnums=1 selects the params.
            def body(c, _):
                return jnp.tanh(c @ params), c

            out, _ = lax.scan(body, x, None, length=n_steps)
            return out

        params = jnp.eye(3) * 0.5
        x = jnp.ones((2, 3))
        ref = jnp.tanh(jnp.tanh(x @ params) @ params)
        np.testing.assert_allclose(fn(2, params, x), ref, rtol=1e-12)

    def test_integer_leaves_ride_along(self):
        def fn(bundle):
            return bundle["x"] * 2.0 + bundle["k"].astype(jnp.float32)

        bundle = {"x": jnp.arange(3.0), "k": jnp.int32(7)}
        np.testing.assert_allclose(
            compile_forward_safe(fn)(bundle), fn(bundle), rtol=1e-12
        )

    def test_no_float_arg_raises(self):
        with pytest.raises(TypeError, match="no inexact"):
            compile_forward_safe(lambda k: jnp.float32(k))(jnp.int32(2))

    def test_no_float_output_raises(self):
        with pytest.raises(TypeError, match="no inexact leaves"):
            compile_forward_safe(lambda x: jnp.int32(1))(jnp.float32(1.0))

    def test_complex_outputs(self):
        # Spectral stacks return complex coefficients; the scalar probe
        # must stay real-valued.
        def fn(x):
            return jnp.fft.rfft(x, axis=-1)

        x = jnp.asarray(np.random.RandomState(1).randn(4, 8))
        np.testing.assert_allclose(
            compile_forward_safe(fn)(x), fn(x), rtol=1e-10
        )

    def test_known_bad_shape_weighted_loss_in_forward_scan(self):
        """Regression for the v5e fault shape: latitude-weighted loss
        reduction inside a forward-only sequence scan. The safe form must
        (a) match the plain forward value and (b) lower with a backward
        pass attached."""
        lats = np.linspace(87.5, -87.5, 8)
        wloss = latitude_weighted_loss(lats=lats, lat_axis=-2)

        def seq_loss(params, x, ys):
            def body(inp, y):
                pred = jnp.tanh(
                    jnp.einsum("ij,bjhw->bihw", params, inp)
                )
                return pred, wloss(y, pred)

            _, losses = lax.scan(body, x, ys)
            return jnp.mean(losses)

        rng = np.random.RandomState(0)
        params = jnp.asarray(rng.randn(2, 2) * 0.3)
        x = jnp.asarray(rng.randn(3, 2, 8, 4))
        ys = jnp.asarray(rng.randn(2, 3, 2, 8, 4))
        safe = compile_forward_safe(seq_loss)
        np.testing.assert_allclose(
            jax.jit(safe)(params, x, ys), seq_loss(params, x, ys),
            rtol=1e-12,
        )
        assert _has_backward(seq_loss, safe, params, x, ys)
        # The backward scan is structurally visible (reverse=True).
        assert "reverse=True" in str(jax.make_jaxpr(safe)(params, x, ys))

    def test_trainer_grad_eval_routes_through_helper(self, monkeypatch):
        """Trainer eval_impl='grad' must use the shared wrapper (one
        implementation of the workaround, round-4 verdict item 2)."""
        import flax.linen as nn
        from dlwp_tpu.train import trainer as trainer_mod
        from dlwp_tpu.train.trainer import Trainer, TrainConfig

        calls = []
        orig = trainer_mod.compile_forward_safe

        def spy(fn, **kw):
            calls.append(fn)
            return orig(fn, **kw)

        monkeypatch.setattr(trainer_mod, "compile_forward_safe", spy)

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                return x * self.param(
                    "g", nn.initializers.ones, (), jnp.float32
                )

        tr = Trainer(Tiny(), TrainConfig(eval_impl="grad", sequence_steps=2))
        x = jnp.ones((2, 3), jnp.float32)
        y = jnp.ones((2, 2, 3), jnp.float32)
        tr.init(x)
        out = tr._jit_eval_step(tr.params, x, y)
        assert calls, "eval_impl='grad' did not call compile_forward_safe"
        assert np.isfinite(float(out["loss"]))

    def test_rollout_forward_safe_parity(self):
        """TimeSeriesEstimator.rollout_fn(forward_safe=True) returns the
        same trajectory as the plain rollout."""
        from dlwp_tpu.data import PredictorDataset, SeriesSampler
        from dlwp_tpu.forecast import TimeSeriesEstimator
        from dlwp_tpu.models import DLWPNeuralNet

        c, td, nlat, nlon = 2, 1, 6, 8
        n = 10
        rng = np.random.RandomState(0)
        data = PredictorDataset(
            predictors=rng.randn(n, c, nlat, nlon).astype(np.float32),
            sample=(np.datetime64("2007-01-01")
                    + np.arange(n) * np.timedelta64(6, "h")),
            varlev=["HGT/500", "THICK/300-700"],
            lat=np.linspace(75.0, 0.0, nlat),
            lon=np.arange(nlon) * (360.0 / nlon),
            mean=np.zeros(c, np.float32),
            std=np.ones(c, np.float32),
        )
        dlwp = DLWPNeuralNet(time_dim=td, scaler_type=None)
        dlwp.build_model([
            ("CyclicConv2D", (c + 1, 3), {"activation": "tanh"}),
            ("CyclicConv2D", (c, 3), None),
        ])
        sampler = SeriesSampler(
            data, model=dlwp, input_time_steps=td, output_time_steps=td,
            batch_size=4, add_insolation=True,
        )
        xs, _ = sampler.generate(np.arange(1), scale_and_impute=True)
        dlwp.trainer.init(jnp.asarray(xs))
        est = TimeSeriesEstimator(dlwp, sampler)
        x0, days, ms, _ = est.prepare_inputs(np.arange(4))
        plain = est.rollout_fn(3)(x0, days, ms)
        safe = est.rollout_fn(3, forward_safe=True)(x0, days, ms)
        np.testing.assert_allclose(
            np.asarray(safe), np.asarray(plain), rtol=1e-6, atol=1e-7
        )
