"""Tests for padding / convolution / pooling / loss ops.

Oracle strategy per SURVEY.md section 4: stencils vs. ``jnp.pad`` +
``lax.conv`` references; row conv vs. an explicit per-row loop.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from dlwp_tpu.ops import (
    pad_periodic,
    pad_fill,
    pad_constant,
    cyclic_conv2d,
    row_conv2d,
    max_pool2d,
    avg_pool2d,
    upsample2d,
    latitude_weighted_loss,
    anomaly_correlation,
    anomaly_correlation_loss,
    mse,
)


def rand(*shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


class TestPadding:
    def test_periodic_matches_wrap(self):
        x = rand(2, 3, 8, 16)
        out = pad_periodic(x, ((1, 2), (3, 1)))
        ref = jnp.pad(x, [(0, 0), (0, 0), (1, 2), (3, 1)], mode="wrap")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_periodic_edge_values(self):
        # Left padding must equal columns from the right edge (custom.py:205).
        x = rand(1, 1, 4, 8)
        out = pad_periodic(x, ((0, 0), (2, 2)))
        np.testing.assert_array_equal(
            np.asarray(out[..., :2]), np.asarray(x[..., -2:])
        )
        np.testing.assert_array_equal(
            np.asarray(out[..., -2:]), np.asarray(x[..., :2])
        )

    def test_fill_matches_edge(self):
        x = rand(2, 8, 16)
        out = pad_fill(x, ((2, 1), (0, 0)))
        ref = jnp.pad(x, [(0, 0), (2, 1), (0, 0)], mode="edge")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_constant_symmetric_int(self):
        x = rand(4, 6)
        out = pad_constant(x, 1, value=7.0)
        assert out.shape == (6, 8)
        assert float(out[0, 0]) == 7.0


class TestCyclicConv:
    def test_matches_pad_then_valid_conv(self):
        x = rand(2, 3, 9, 16)
        k = rand(5, 3, 3, 3, key=1) * 0.1
        out = cyclic_conv2d(x, k)
        # Oracle: wrap-pad longitude, zero-pad latitude, VALID conv.
        xp = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (1, 1)], mode="wrap")
        xp = jnp.pad(xp, [(0, 0), (0, 0), (1, 1), (0, 0)])
        ref = lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        assert out.shape == (2, 5, 9, 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    def test_longitude_shift_equivariance(self):
        # Rolling the input in longitude must roll the output identically.
        x = rand(1, 2, 9, 16)
        k = rand(4, 2, 3, 3, key=2) * 0.1
        out1 = jnp.roll(cyclic_conv2d(x, k), 5, axis=-1)
        out2 = cyclic_conv2d(jnp.roll(x, 5, axis=-1), k)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-12)

    def test_edge_lat_mode(self):
        x = rand(1, 1, 6, 8)
        k = jnp.ones((1, 1, 3, 3)) / 9.0
        out = cyclic_conv2d(x, k, lat_mode="edge")
        xp = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (1, 1)], mode="wrap")
        xp = jnp.pad(xp, [(0, 0), (0, 0), (1, 1), (0, 0)], mode="edge")
        ref = lax.conv_general_dilated(
            xp, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    def test_strides(self):
        x = rand(1, 2, 8, 16)
        k = rand(3, 2, 3, 3, key=3)
        out = cyclic_conv2d(x, k, strides=(2, 2))
        assert out.shape == (1, 3, 4, 8)

    def test_leading_batch_dims(self):
        x = rand(2, 4, 3, 9, 16)
        k = rand(5, 3, 3, 3, key=4)
        out = cyclic_conv2d(x, k)
        assert out.shape == (2, 4, 5, 9, 16)
        np.testing.assert_allclose(
            np.asarray(out[1, 2]),
            np.asarray(cyclic_conv2d(x[1, 2][None], k)[0]),
            atol=1e-12,
        )


class TestRowConv:
    def test_matches_per_row_loop(self):
        """Oracle: the reference's per-row algorithm (custom.py:879-893) --
        for each output row, a VALID conv of the row's kh-slab with that
        row's own filters."""
        B, C_in, C_out, H, W, kh, kw = 2, 3, 4, 7, 12, 3, 5
        x = rand(B, C_in, H, W)
        wts = rand(H, C_out, C_in, kh, kw, key=5) * 0.1
        bias = rand(H, C_out, key=6)
        out = row_conv2d(x, wts, bias)
        assert out.shape == (B, C_out, H, W)

        # Reference-style loop oracle.
        pad_t = (kh - 1) // 2
        pad_l = (kw - 1) // 2
        xp = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (pad_l, kw - 1 - pad_l)], mode="wrap")
        xp = jnp.pad(xp, [(0, 0), (0, 0), (pad_t, kh - 1 - pad_t), (0, 0)])
        rows = []
        for h in range(H):
            slab = xp[:, :, h : h + kh, :]
            r = lax.conv_general_dilated(
                slab, wts[h], (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            rows.append(r + bias[h][None, :, None, None])
        ref = jnp.concatenate(rows, axis=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)

    def test_row_locality(self):
        # Different rows must apply different filters: zero out one row's
        # filters and check only that output row is zero.
        x = rand(1, 2, 5, 8)
        wts = np.array(rand(5, 3, 2, 1, 1, key=7))
        wts[2] = 0.0
        out = row_conv2d(x, jnp.asarray(wts))
        assert np.abs(np.asarray(out[:, :, 2])).max() == 0.0
        assert np.abs(np.asarray(out[:, :, 1])).max() > 0.0


class TestPooling:
    def test_max_pool_oracle(self):
        x = rand(2, 3, 8, 16)
        out = max_pool2d(x)
        assert out.shape == (2, 3, 4, 8)
        expect = np.asarray(x).reshape(2, 3, 4, 2, 8, 2).max(axis=(3, 5))
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)

    def test_avg_pool_oracle(self):
        x = rand(2, 3, 8, 16, key=1)
        out = avg_pool2d(x)
        expect = np.asarray(x).reshape(2, 3, 4, 2, 8, 2).mean(axis=(3, 5))
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)

    def test_upsample_inverts_pool_shape(self):
        x = rand(1, 2, 4, 8)
        up = upsample2d(x)
        assert up.shape == (1, 2, 8, 16)
        # Nearest-neighbor: every 2x2 block constant.
        a = np.asarray(up)
        assert (a[..., ::2, ::2] == a[..., 1::2, 1::2]).all()


class TestLosses:
    def test_latitude_weighted_mse(self):
        lats = np.linspace(90, -90, 7)
        loss = latitude_weighted_loss(mse, lats, "cosine")
        yt = rand(2, 1, 7, 12)
        yp = rand(2, 1, 7, 12, key=1)
        w = np.cos(np.radians(lats)).reshape(1, 1, 7, 1)
        expect = np.mean((w * np.asarray(yt) - w * np.asarray(yp)) ** 2)
        np.testing.assert_allclose(float(loss(yt, yp)), expect, rtol=1e-10)

    def test_pole_rows_zero_weighted(self):
        lats = np.linspace(90, -90, 7)
        loss = latitude_weighted_loss(mse, lats)
        yt = jnp.zeros((1, 1, 7, 4))
        yp = jnp.zeros((1, 1, 7, 4)).at[:, :, 0].set(100.0)  # pole-only error
        assert abs(float(loss(yt, yp))) < 1e-12

    def test_acc_perfect_correlation(self):
        y = rand(2, 3, 8, 8)
        assert abs(float(anomaly_correlation(y, y)) - 1.0) < 1e-10
        assert abs(float(anomaly_correlation(y, -y)) + 1.0) < 1e-10

    def test_acc_loss_modes(self):
        yt = rand(2, 2, 6, 6)
        yp = rand(2, 2, 6, 6, key=1)
        plain = anomaly_correlation_loss(regularize_mean=None)
        assert abs(float(plain(yt, yp)) + float(anomaly_correlation(yt, yp))) < 1e-10
        reg = anomaly_correlation_loss(regularize_mean="mse")
        expect = float(mse(yt, yp)) - float(anomaly_correlation(yt, yp))
        np.testing.assert_allclose(float(reg(yt, yp)), expect, rtol=1e-10)
        with pytest.raises(ValueError):
            anomaly_correlation_loss(regularize_mean="bogus")

    def test_acc_loss_with_mean(self):
        mean = np.full((1, 2, 6, 6), 5.0)
        yt = rand(2, 2, 6, 6) + 5.0
        loss = anomaly_correlation_loss(mean=mean, regularize_mean=None)
        assert abs(float(loss(yt, yt)) + 1.0) < 1e-10

    def test_losses_differentiable(self):
        lats = np.linspace(90, -90, 7)
        loss = latitude_weighted_loss(mse, lats)
        yt = rand(1, 1, 7, 8)
        yp = rand(1, 1, 7, 8, key=1)
        g = jax.grad(lambda p: loss(yt, p))(yp)
        assert np.isfinite(np.asarray(g)).all()
        accl = anomaly_correlation_loss()
        g2 = jax.grad(lambda p: accl(yt, p))(yp)
        assert np.isfinite(np.asarray(g2)).all()


class TestEdgefixConv:
    @pytest.mark.parametrize("kw_,dil", [(3, (1, 1)), (5, (1, 1)), (3, (2, 2)),
                                          (1, (1, 1))])
    def test_matches_cyclic_conv(self, kw_, dil):
        from dlwp_tpu.ops.conv import cyclic_conv2d_edgefix

        x = rand(2, 3, 9, 16)
        k = rand(4, 3, kw_, kw_, key=1) * 0.1
        a = cyclic_conv2d(x, k, dilation=dil)
        b = cyclic_conv2d_edgefix(x, k, dilation=dil)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_gradients_match(self):
        from dlwp_tpu.ops.conv import cyclic_conv2d_edgefix

        x = rand(1, 2, 8, 16)
        k = rand(3, 2, 3, 3, key=2) * 0.1
        g1 = jax.grad(lambda kk: jnp.sum(cyclic_conv2d(x, kk) ** 2))(k)
        g2 = jax.grad(lambda kk: jnp.sum(cyclic_conv2d_edgefix(x, kk) ** 2))(k)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


class TestUpsample2Lhsdil:
    def test_lhsdil_matches_parity4(self):
        """The one-conv lhs-dilated form of conv_after_upsample2 must
        match the parity4 interleave form (and hence the literal
        upsample->conv reference) for the tower's kernel sizes."""
        from dlwp_tpu.ops.conv import conv_after_upsample2
        from dlwp_tpu.ops.pooling import upsample2d
        from dlwp_tpu.ops.conv import cyclic_conv2d

        rng = np.random.RandomState(7)
        for kh in (3, 5):
            x = jnp.asarray(rng.randn(2, 5, 6, 12), jnp.float32)
            k = jnp.asarray(rng.randn(4, 5, kh, kh) * 0.3, jnp.float32)
            lit = cyclic_conv2d(upsample2d(x, (2, 2)), k)
            par = conv_after_upsample2(x, k, impl="parity4")
            lhs = conv_after_upsample2(x, k, impl="lhsdil")
            np.testing.assert_allclose(par, lit, rtol=0, atol=2e-5)
            np.testing.assert_allclose(lhs, lit, rtol=0, atol=2e-5)

    def test_lhsdil_leading_dims(self):
        from dlwp_tpu.ops.conv import conv_after_upsample2

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 3, 5, 6, 12), jnp.float32)
        k = jnp.asarray(rng.randn(4, 5, 3, 3) * 0.3, jnp.float32)
        a = conv_after_upsample2(x, k, impl="parity4")
        b = conv_after_upsample2(x, k, impl="lhsdil")
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)

    def test_auto_impl_picks_and_matches(self):
        """UPSAMPLE2_IMPL='auto' picks lhsdil in the bad-lane-padding
        regime (2.5-degree-class widths) and parity4 when the output
        width packs lanes well (0.5-degree-class / 128-multiples), per
        the round-5 measured crossover; both give identical results."""
        from dlwp_tpu.ops.conv import (
            conv_after_upsample2, _upsample2_auto_impl)

        assert _upsample2_auto_impl(144) == "lhsdil"
        assert _upsample2_auto_impl(720) == "parity4"
        assert _upsample2_auto_impl(256) == "parity4"

        rng = np.random.RandomState(11)
        for w in (12, 64):  # -> w_out 24 (lhsdil), 128 (parity4)
            x = jnp.asarray(rng.randn(2, 5, 6, w), jnp.float32)
            k = jnp.asarray(rng.randn(4, 5, 3, 3) * 0.3, jnp.float32)
            auto = conv_after_upsample2(x, k)  # default 'auto'
            ref = conv_after_upsample2(x, k, impl="parity4")
            np.testing.assert_allclose(auto, ref, rtol=0, atol=2e-5)
