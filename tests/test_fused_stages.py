"""Oracle tests for the fused full-resolution tower stages (interpret
mode): each fused Pallas chain must match its unfused XLA composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlwp_tpu.ops.conv import conv_after_upsample2, cyclic_conv2d
from dlwp_tpu.ops.pooling import max_pool2d, upsample2d
from dlwp_tpu.ops.fused_stages import fused_conv_pool


def rand(*shape, key=0, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(key).randn(*shape).astype(np.float32) * scale
    )


class TestFusedConvPool:
    @pytest.mark.parametrize("shape,dil", [
        ((3, 6, 36, 144), 2),   # flagship entry stage
        ((2, 5, 8, 16), 1),
        ((1, 3, 12, 20), 2),
    ])
    def test_matches_unfused(self, shape, dil):
        B, C, H, W = shape
        x = rand(*shape, key=1)
        k = rand(8, C, 3, 3, key=2, scale=0.2)
        b = rand(8, key=3, scale=0.1)
        fused = fused_conv_pool(x, k, b, dilation=dil, interpret=True)
        oracle = max_pool2d(
            jnp.tanh(
                cyclic_conv2d(x, k, dilation=(dil, dil))
                + b[:, None, None]
            ),
            (2, 2),
        )
        assert fused.shape == oracle.shape == (B, 8, H // 2, W // 2)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), atol=2e-6
        )

    def test_batch_chunking(self, monkeypatch):
        import dlwp_tpu.ops.fused_stages as fs

        monkeypatch.setattr(fs, "_SCOPED_VMEM_BUDGET", 200_000)
        x = rand(5, 3, 8, 16, key=4)
        k = rand(4, 3, 3, 3, key=5, scale=0.2)
        fused = fused_conv_pool(x, k, None, dilation=1, interpret=True)
        oracle = max_pool2d(jnp.tanh(cyclic_conv2d(x, k)), (2, 2))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), atol=2e-6
        )


class TestConvAfterUpsample2:
    """conv_after_upsample2 must equal conv(upsample2(a)) exactly: the
    algebraic collapse of nearest-x2 upsampling onto the small grid."""

    @pytest.mark.parametrize("k,dil", [(3, 2), (3, 1), (5, 1), (5, 2)])
    def test_matches_unfused(self, k, dil):
        a = rand(2, 8, 18, 72, key=6)
        kern = rand(12, 8, k, k, key=7, scale=0.15)
        fused = conv_after_upsample2(a, kern, dilation=(dil, dil))
        oracle = cyclic_conv2d(
            upsample2d(a, (2, 2)), kern, dilation=(dil, dil)
        )
        assert fused.shape == oracle.shape == (2, 12, 36, 144)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), atol=2e-5
        )

    def test_flagship_tail_chain(self):
        """upsample -> conv9(3x3 d2 tanh) -> conv10(5x5): the full tail
        runs on the small grid with no full-resolution intermediate."""
        a = rand(2, 16, 18, 72, key=8)
        k9 = rand(12, 16, 3, 3, key=9, scale=0.15)
        b9 = rand(12, key=10, scale=0.1)
        k10 = rand(4, 12, 5, 5, key=11, scale=0.1)
        b10 = rand(4, key=12, scale=0.1)
        # Fused: conv9 commutes with the upsample (d2); conv10 parity-
        # decomposes over the upsampled mid (tanh is pointwise so it
        # commutes with the upsample too).
        s_small = jnp.tanh(cyclic_conv2d(a, k9) + b9[:, None, None])
        fused = conv_after_upsample2(s_small, k10) + b10[:, None, None]
        up = upsample2d(a, (2, 2))
        mid = jnp.tanh(
            cyclic_conv2d(up, k9, dilation=(2, 2)) + b9[:, None, None]
        )
        oracle = cyclic_conv2d(mid, k10) + b10[:, None, None]
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), atol=2e-5
        )

    def test_odd_small_grid(self):
        a = rand(1, 3, 5, 9, key=13)
        kern = rand(2, 3, 3, 3, key=14, scale=0.3)
        fused = conv_after_upsample2(a, kern)
        oracle = cyclic_conv2d(upsample2d(a, (2, 2)), kern)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), atol=1e-5
        )


class TestConvPoolFormulations:
    """The selectable FusedConvPool2D entry formulations and the
    conv_pool2_even_dilation op must all match the unfused chain."""

    @pytest.mark.parametrize("form", ["group", "dense"])
    @pytest.mark.parametrize("dil", [2, 4])
    def test_conv_pool2_even_dilation(self, dil, form):
        from dlwp_tpu.ops.conv import conv_pool2_even_dilation

        x = rand(2, 3, 16, 24, key=4)
        k = rand(5, 3, 3, 3, key=5, scale=0.2)
        fused = conv_pool2_even_dilation(x, k, dilation=(dil, dil), form=form)
        oracle = max_pool2d(cyclic_conv2d(x, k, dilation=(dil, dil)), (2, 2))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), atol=2e-6
        )

    @pytest.mark.parametrize("impl", ["group", "chandense", "parity4", "unfused"])
    def test_layer_impls_match(self, impl):
        from dlwp_tpu.models.layers import FusedConvPool2D

        x = rand(2, 3, 16, 24, key=6)
        layer = FusedConvPool2D(
            features=5, dilation=2, activation="tanh", parity_impl=impl
        )
        params = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(params, x)
        k = params["params"]["kernel"]
        b = params["params"]["bias"]
        oracle = max_pool2d(
            jnp.tanh(
                cyclic_conv2d(x, k, dilation=(2, 2)) + b[:, None, None]
            ),
            (2, 2),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(oracle), atol=2e-6
        )

    def test_split_conv_pool(self):
        from dlwp_tpu.models.layers import SplitConvPool2D

        x = rand(2, 4, 16, 24, key=7)
        layer = SplitConvPool2D(
            features=8, keep=3, dilation=2, activation="tanh"
        )
        params = layer.init(jax.random.PRNGKey(0), x)
        pooled, skip = layer.apply(params, x)
        k = params["params"]["kernel"]
        b = params["params"]["bias"]
        full = jnp.tanh(
            cyclic_conv2d(x, k, dilation=(2, 2)) + b[:, None, None]
        )
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(max_pool2d(full[:, :3], (2, 2))),
            atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(skip), np.asarray(full[:, 3:]), atol=2e-6
        )


class TestFusedLSTMGates:
    """Oracle tests for the one-pass gate-chain kernel (interpret mode on
    CPU; ops/lstm_gates.py)."""

    def _operands(self, B=3, F=5, H=9, W=17, seed=0):
        rng = np.random.RandomState(seed)
        return (
            jnp.asarray(rng.randn(B, 4 * F, H, W), jnp.float32),
            jnp.asarray(rng.randn(B, 4 * F, H, W), jnp.float32),
            jnp.asarray(rng.randn(B, F, H, W), jnp.float32),
        )

    def test_matches_reference_all_activations(self):
        from dlwp_tpu.ops.lstm_gates import (
            fused_lstm_gates, lstm_gates_reference,
        )

        zx, zh, c = self._operands()
        for ra in ("hard_sigmoid", "sigmoid"):
            for gd in (None, jnp.bfloat16):
                h1, c1 = fused_lstm_gates(zx, zh, c, "tanh", ra, gd)
                h2, c2 = lstm_gates_reference(
                    zx, zh, c, "tanh", ra, gd
                )
                tol = 5e-2 if gd is not None else 5e-6
                np.testing.assert_allclose(
                    np.asarray(h1), np.asarray(h2), atol=tol
                )
                np.testing.assert_allclose(
                    np.asarray(c1), np.asarray(c2), atol=tol
                )

    def test_gradients_match_reference(self):
        from dlwp_tpu.ops.lstm_gates import (
            fused_lstm_gates, lstm_gates_reference,
        )

        zx, zh, c = self._operands(B=2, F=3, H=6, W=8)

        def loss(fn):
            def g(*ops):
                h, cn = fn(*ops, "tanh", "hard_sigmoid", None)
                return jnp.sum(h**2) + jnp.sum(jnp.tanh(cn))

            return g

        g1 = jax.grad(loss(fused_lstm_gates), argnums=(0, 1, 2))(
            zx, zh, c
        )
        g2 = jax.grad(loss(lstm_gates_reference), argnums=(0, 1, 2))(
            zx, zh, c
        )
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )

    def test_convlstm_layer_pallas_path_matches_xla(self):
        """Full ConvLSTM2D forward with gate_impl='pallas' (interpret on
        CPU) vs the default XLA formulation."""
        from dlwp_tpu.models.layers import ConvLSTM2D

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 3, 4, 10, 16), jnp.float32)
        kw = dict(features=6, kernel_size=3, dilation=2,
                  return_sequences=True)
        ref_layer = ConvLSTM2D(gate_impl="xla", **kw)
        pal_layer = ConvLSTM2D(gate_impl="pallas", **kw)
        params = ref_layer.init(jax.random.PRNGKey(0), x)
        y_ref = ref_layer.apply(params, x)
        y_pal = pal_layer.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), atol=5e-6
        )
        # and gradients through the layer
        gfun = lambda layer: jax.grad(
            lambda p: jnp.sum(layer.apply(p, x) ** 2)
        )(params)
        g_ref, g_pal = gfun(ref_layer), gfun(pal_layer)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref),
            jax.tree_util.tree_leaves(g_pal),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
