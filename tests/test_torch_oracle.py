"""Cross-framework parity: dlwp_tpu layers vs an independent torch oracle.

The golden fixtures pin the framework's own trajectories (regression); the
barotropic core has an independent numpy transliteration oracle
(``tests/oracles/reference_barotropic.py``). This module closes the same
gap for the ML stack: ``tests/oracles/torch_cnn.py`` re-implements the
spherical layer semantics (reference custom.py:139-214, 695-896;
train.py:142-221) straight-line in PyTorch, with none of the production
side's algebraic fusions — so agreement here independently validates both
the base layer semantics and the fused fast paths (conv+pool parity forms,
dense upsample collapse, first-LSTM-step specialization) that
``build_sequential(fuse=True)`` swaps in.

Everything runs in float64 on CPU; tolerances are at rounding level.
"""

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from dlwp_tpu.models import build_sequential  # noqa: E402
from dlwp_tpu.ops.conv import cyclic_conv2d  # noqa: E402

from tests.oracles import torch_cnn  # noqa: E402

RNG = np.random.RandomState(7)


def _t(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float64))


def _run_both(specs, x, fuse=True):
    """Apply the jax model (optionally fused) and the torch oracle with the
    SAME parameters; return both outputs as numpy."""
    model = build_sequential(specs, fuse=fuse)
    params = model.init(jax.random.PRNGKey(0), x)
    out_jax = np.asarray(model.apply(params, x))
    weights = {
        int(k.split("_")[1]): jax.tree.map(np.asarray, v)
        for k, v in params["params"].items()
    }
    out_torch = torch_cnn.forward(specs, weights, x)
    return out_jax, out_torch


class TestCyclicConvVsTorch:
    @pytest.mark.parametrize(
        "kshape,dilation,lat_mode",
        [
            ((5, 3, 3, 3), (1, 1), "zero"),
            ((4, 3, 3, 3), (2, 2), "zero"),
            ((2, 3, 5, 5), (1, 1), "zero"),
            ((3, 3, 4, 4), (1, 1), "zero"),  # even kernel: asymmetric pads
            ((5, 3, 3, 3), (1, 1), "edge"),
            ((5, 3, 3, 5), (2, 1), "reflect"),
        ],
    )
    def test_conv(self, kshape, dilation, lat_mode):
        x = RNG.randn(2, 3, 9, 14)
        k = RNG.randn(*kshape)
        ours = np.asarray(
            cyclic_conv2d(x, k, dilation=dilation, lat_mode=lat_mode)
        )
        theirs = (
            torch_cnn.cyclic_conv2d(
                _t(x), _t(k), dilation=dilation, lat_mode=lat_mode
            )
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_strided(self):
        x = RNG.randn(2, 3, 8, 12)
        k = RNG.randn(4, 3, 3, 3)
        ours = np.asarray(cyclic_conv2d(x, k, strides=(2, 2)))
        theirs = torch_cnn.cyclic_conv2d(_t(x), _t(k), strides=(2, 2)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


class TestTowerVsTorch:
    """The canonical conv-pool-upsample tower (reference train.py:159-218),
    through the FUSED build path, vs the unfused torch implementation."""

    def _specs(self, c_out):
        from __graft_entry__ import _tower_specs

        return _tower_specs(c_out)

    def test_tower(self):
        x = RNG.randn(2, 6, 8, 16)
        out_jax, out_torch = _run_both(self._specs(4), x)
        assert out_jax.shape == out_torch.shape == (2, 4, 8, 16)
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-10)

    def test_tower_unfused_matches_too(self):
        x = RNG.randn(1, 6, 8, 16)
        out_jax, out_torch = _run_both(self._specs(2), x, fuse=False)
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-10)


class TestConvLSTMVsTorch:
    # Both gate semantics are pinned: 'hard_sigmoid' is the standalone-Keras
    # default the reference model actually runs with (train.py:150-156
    # passes only activation='tanh'); 'sigmoid' is the smooth variant.
    @pytest.mark.parametrize("r_act", ["hard_sigmoid", "sigmoid"])
    def test_convlstm_layer(self, r_act):
        specs = [
            ("ConvLSTM2D", (8, 3),
             {"dilation": 2, "return_sequences": True, "activation": "tanh",
              "recurrent_activation": r_act}),
        ]
        x = RNG.randn(2, 4, 3, 8, 16)
        out_jax, out_torch = _run_both(specs, x)
        assert out_jax.shape == (2, 4, 8, 8, 16)
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-10)

    def test_default_is_hard_sigmoid(self):
        """The framework's default gate matches the reference's Keras
        default -- and the Keras definition (clip(0.2x+0.5)), not torch/jax's
        relu6 variant."""
        from dlwp_tpu.models.layers import ConvLSTM2D, get_activation

        assert ConvLSTM2D(features=2).recurrent_activation == "hard_sigmoid"
        x = np.linspace(-4, 4, 33)
        np.testing.assert_allclose(
            np.asarray(get_activation("hard_sigmoid")(x)),
            np.clip(0.2 * x + 0.5, 0, 1), atol=1e-12,
        )

    def test_flagship_convlstm_model(self):
        """The full flagship (ConvLSTM front end + fused tower + reshapes,
        __graft_entry__._flagship configuration at a reduced grid)."""
        from __graft_entry__ import _tower_specs

        nlat, nlon, c, time_dim = 8, 16, 2, 2
        cv = c + 1
        lstm_features = 4 * cv
        specs = [
            ("ConvLSTM2D", (lstm_features, 3),
             {"dilation": 2, "return_sequences": True, "activation": "tanh"}),
            ("Reshape", ((time_dim * lstm_features, nlat, nlon),), None),
            *_tower_specs(time_dim * c),
            ("Reshape", ((time_dim, c, nlat, nlon),), None),
        ]
        x = RNG.randn(2, time_dim, cv, nlat, nlon)
        out_jax, out_torch = _run_both(specs, x)
        assert out_jax.shape == (2, time_dim, c, nlat, nlon)
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-10)


class TestRowConnectedVsTorch:
    def test_row_conv(self):
        specs = [("RowConnected2D", (4, 3), {"activation": "tanh"})]
        x = RNG.randn(2, 3, 6, 10)
        out_jax, out_torch = _run_both(specs, x)
        np.testing.assert_allclose(out_jax, out_torch, atol=1e-12)


class TestGradientsVsTorch:
    """Parameter gradients through the fused jax model vs torch autograd
    through the unfused oracle — the training path's independent check
    (catches VJP bugs the forward-parity tests cannot)."""

    def _grads_both(self, specs, x):
        import jax.numpy as jnp

        model = build_sequential(specs)
        params = model.init(jax.random.PRNGKey(0), x)
        out_shape = jax.eval_shape(model.apply, params, x).shape
        probe = np.random.RandomState(11).randn(*out_shape)

        def loss_fn(p):
            return jnp.sum(model.apply(p, x) * probe)

        g_jax = jax.grad(loss_fn)(params)["params"]

        weights = {
            int(k.split("_")[1]): jax.tree.map(np.asarray, v)
            for k, v in params["params"].items()
        }
        wt = torch_cnn.to_tensors(weights, requires_grad=True)
        out = torch_cnn.apply(specs, wt, _t(x))
        (out * _t(probe)).sum().backward()
        return g_jax, wt

    def _compare(self, g_jax, wt):
        for name, leaves in g_jax.items():
            i = int(name.split("_")[1])
            for key, g in leaves.items():
                np.testing.assert_allclose(
                    np.asarray(g),
                    wt[i][key].grad.numpy(),
                    atol=1e-9,
                    err_msg=f"{name}/{key}",
                )

    def test_tower_grads(self):
        from __graft_entry__ import _tower_specs

        x = RNG.randn(2, 6, 8, 16)
        self._compare(*self._grads_both(_tower_specs(4), x))

    @pytest.mark.parametrize("r_act", ["hard_sigmoid", "sigmoid"])
    def test_convlstm_grads(self, r_act):
        specs = [
            ("ConvLSTM2D", (6, 3),
             {"dilation": 2, "return_sequences": True, "activation": "tanh",
              "recurrent_activation": r_act}),
        ]
        x = RNG.randn(2, 3, 4, 8, 16)
        self._compare(*self._grads_both(specs, x))
