"""Tests for the spherical-harmonic transform engine.

Test strategy per SURVEY.md section 4: round-trip identities, analytic
spherical harmonics, operator eigenvalues, and pyspharm-compatible packing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from math import factorial
from scipy.special import lpmv

from dlwp_tpu.grid import LatLonGrid
from dlwp_tpu.spectral import SphericalHarmonics, legendre_tables


def random_spec(sh, key=0, wind=False):
    """Random valid coefficients of a real field (m=0 row real)."""
    T = sh.truncation
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    spec = jax.random.normal(k1, (T + 1, T + 1)) + 1j * jax.random.normal(
        k2, (T + 1, T + 1)
    )
    spec = spec * sh.mask
    spec = spec.at[0].set(spec[0].real * sh.mask[0])
    if wind:
        spec = spec.at[:, 0].set(0.0)  # n = 0 carries no wind
    return spec


def pbar_reference(n, m, mu):
    """Orthonormal associated Legendre via scipy (no Condon-Shortley)."""
    norm = np.sqrt((2 * n + 1) / 2 * factorial(n - m) / factorial(n + m))
    return norm * lpmv(m, n, mu) * (-1) ** m


class TestLegendreTables:
    def test_matches_scipy(self):
        g = LatLonGrid.gaussian(32)
        tab = legendre_tables(20, g.mu)
        for n, m in [(0, 0), (3, 0), (5, 2), (10, 7), (20, 20)]:
            np.testing.assert_allclose(
                tab.P[m, :, n], pbar_reference(n, m, g.mu), atol=1e-13
            )

    def test_orthonormal_under_gauss_quadrature(self):
        g = LatLonGrid.gaussian(48)
        tab = legendre_tables(30, g.mu)
        w = g.quad_weights
        for m in [0, 1, 7, 30]:
            S = tab.P[m][:, m:]
            gram = S.T @ (w[:, None] * S)
            np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-12)

    def test_H_is_cos_times_derivative(self):
        mu = np.linspace(-0.95, 0.95, 37)
        h = 1e-6
        tab = legendre_tables(15, mu)
        tp = legendre_tables(15, mu + h)
        tm = legendre_tables(15, mu - h)
        cos = np.sqrt(1 - mu**2)
        for n, m in [(3, 0), (5, 2), (10, 7), (15, 1)]:
            fd = cos * (tp.P[m, :, n] - tm.P[m, :, n]) / (2 * h)
            np.testing.assert_allclose(tab.H[m, :, n], fd, atol=1e-8)

    def test_pole_regularity(self):
        # G (m>=1) and H must be finite at the poles; P vanishes for m>=1.
        g = LatLonGrid.regular(19)
        tab = legendre_tables(10, g.mu)
        assert np.isfinite(tab.G).all() and np.isfinite(tab.H).all()
        assert np.abs(tab.P[1:, [0, -1], :]).max() == 0.0


class TestScalarTransforms:
    @pytest.mark.parametrize(
        "grid,T",
        [
            (LatLonGrid.gaussian(32, 64), 20),
            (LatLonGrid.regular(37, 72), 24),
            (LatLonGrid.regular(73, 144), 71),
        ],
    )
    def test_roundtrip_spec_grid_spec(self, grid, T):
        sh = SphericalHarmonics.build(grid, T, dtype=jnp.float64)
        spec = random_spec(sh)
        out = sh.analyze(sh.synthesize(spec))
        np.testing.assert_allclose(np.asarray(out), np.asarray(spec), atol=1e-11)

    def test_analysis_of_analytic_harmonic(self):
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 20, dtype=jnp.float64)
        n, m = 6, 3
        lat2 = np.radians(grid.lat)[:, None]
        lon2 = np.radians(grid.lon)[None, :]
        f = pbar_reference(n, m, np.sin(lat2)) * np.cos(m * lon2)
        spec = np.asarray(sh.analyze(jnp.asarray(f)))
        # One-sided Fourier convention: cos(m lon) -> coefficient 1/2 at m.
        expect = np.zeros_like(spec)
        expect[m, n] = 0.5
        np.testing.assert_allclose(spec, expect, atol=1e-12)

    def test_batched_leading_dims(self):
        grid = LatLonGrid.gaussian(24, 48)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        f = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 24, 48))
        spec = sh.analyze(f)
        assert spec.shape == (2, 3, 16, 16)
        f2 = sh.synthesize(spec)
        assert f2.shape == (2, 3, 24, 48)
        # Projection is idempotent.
        np.testing.assert_allclose(
            np.asarray(sh.synthesize(sh.analyze(f2))), np.asarray(f2), atol=1e-11
        )

    def test_f32_roundtrip_high_truncation(self):
        """Pin the fp32 precision contract at production truncation.

        With the default precision='highest' the T170 scalar round trip
        (spec -> grid -> spec) must hold to <= 1e-6 relative -- the
        "bit-faithful rollout" accuracy target (BASELINE.md records
        2.5e-7 on v5e hardware; under the DEFAULT matmul precision the
        same round trip degrades to ~3e-3 on TPU, which this tolerance
        would catch).
        """
        grid = LatLonGrid.gaussian(256, 512)
        sh = SphericalHarmonics.build(grid, 170, dtype=jnp.float32)
        spec = random_spec(sh, key=7)
        back = sh.analyze(sh.synthesize(spec))
        err = float(jnp.abs(back - spec).max())
        scale = float(jnp.abs(spec).max())
        assert err <= 1e-6 * scale, f"T170 f32 round trip {err / scale:.2e}"

    def test_laplacian_eigenfunction(self):
        grid = LatLonGrid.regular(37, 72)
        sh = SphericalHarmonics.build(grid, 24, dtype=jnp.float64)
        n, m = 9, 4
        spec = jnp.zeros((25, 25), dtype=jnp.complex128).at[m, n].set(1.0 + 0.5j)
        f = sh.synthesize(spec)
        lap = sh.laplacian(f)
        expect = -n * (n + 1) / grid.radius**2 * f
        scale = np.abs(np.asarray(expect)).max()
        np.testing.assert_allclose(
            np.asarray(lap), np.asarray(expect), atol=1e-10 * scale
        )

    def test_jit_compatible(self):
        grid = LatLonGrid.gaussian(24, 48)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        f = jax.random.normal(jax.random.PRNGKey(0), (24, 48))
        jitted = jax.jit(lambda x: sh.synthesize(sh.analyze(x)))
        np.testing.assert_allclose(
            np.asarray(jitted(f)), np.asarray(sh.synthesize(sh.analyze(f))), atol=1e-12
        )


class TestVectorTransforms:
    @pytest.mark.parametrize(
        "grid,T",
        [
            (LatLonGrid.gaussian(32, 64), 20),
            (LatLonGrid.regular(73, 144), 71),
            (LatLonGrid.regular(181, 360), 72),
        ],
    )
    def test_vrtdiv_uv_roundtrip(self, grid, T):
        sh = SphericalHarmonics.build(grid, T, dtype=jnp.float64)
        vrt = random_spec(sh, key=1, wind=True)
        div = random_spec(sh, key=2, wind=True)
        u, v = sh.uv_from_vrtdiv(vrt, div)
        vrt2, div2 = sh.vrtdiv_from_uv(u, v)
        scale = np.abs(np.asarray(vrt)).max()
        np.testing.assert_allclose(
            np.asarray(vrt2), np.asarray(vrt), atol=1e-9 * scale
        )
        np.testing.assert_allclose(
            np.asarray(div2), np.asarray(div), atol=1e-9 * scale
        )

    def test_solid_body_rotation(self):
        # u = U0 cos(lat) is vorticity 2 U0 sin(lat)/a, divergence 0.
        grid = LatLonGrid.gaussian(48, 96)
        sh = SphericalHarmonics.build(grid, 31, dtype=jnp.float64)
        U0 = 30.0
        u = jnp.asarray(np.broadcast_to(grid.coslat[:, None] * U0, grid.shape))
        v = jnp.zeros_like(u)
        vrt, div = sh.vrtdiv_from_uv(u, v)
        vrt_grid = sh.synthesize(vrt)
        expect = 2 * U0 * grid.mu[:, None] / grid.radius
        np.testing.assert_allclose(
            np.asarray(vrt_grid), np.broadcast_to(expect, grid.shape), atol=1e-12
        )
        assert np.abs(np.asarray(sh.synthesize(div))).max() < 1e-12

    def test_gradients_of_harmonic(self):
        # Zonal gradient of cos(m lon) harmonic: analytic in longitude.
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 20, dtype=jnp.float64)
        n, m = 6, 3
        spec = jnp.zeros((21, 21), dtype=jnp.complex128).at[m, n].set(0.5)
        fx, fy = sh.gradients(spec)
        lat2 = np.radians(grid.lat)[:, None]
        lon2 = np.radians(grid.lon)[None, :]
        P = pbar_reference(n, m, np.sin(lat2))
        expect_fx = -m * P * np.sin(m * lon2) / (grid.radius * np.cos(lat2))
        np.testing.assert_allclose(np.asarray(fx), expect_fx, atol=1e-14)
        # Meridional gradient via finite differences in latitude.
        h = 1e-5
        Pp = pbar_reference(n, m, np.sin(lat2 + h))
        Pm = pbar_reference(n, m, np.sin(lat2 - h))
        expect_fy = (Pp - Pm) / (2 * h) * np.cos(m * lon2) / grid.radius
        np.testing.assert_allclose(np.asarray(fy), expect_fy, atol=1e-8)

    def test_gradients_finite_at_poles(self):
        grid = LatLonGrid.regular(37, 72)
        sh = SphericalHarmonics.build(grid, 24, dtype=jnp.float64)
        spec = random_spec(sh, key=3)
        fx, fy = sh.gradients(spec)
        assert np.isfinite(np.asarray(fx)).all()
        assert np.isfinite(np.asarray(fy)).all()


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        grid = LatLonGrid.gaussian(24, 48)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        spec = random_spec(sh)
        packed = sh.pack(spec)
        assert packed.shape == (sh.nspec,)
        np.testing.assert_allclose(
            np.asarray(sh.unpack(packed)), np.asarray(spec), atol=0
        )

    def test_wavenumber_convention(self):
        # Reference computes total degree as m + wavenumbers[1]
        # (model.py:69-71); check our packing provides that.
        grid = LatLonGrid.gaussian(24, 48)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        m, nmm = sh.wavenumbers
        assert len(m) == sh.nspec
        assert (m + nmm <= 15).all()
        assert (nmm >= 0).all()


class TestMuMultiplier:
    def test_matches_grid_roundtrip(self):
        """The precomputed lat-multiplier operator must equal
        synthesize -> multiply -> analyze exactly (both are linear)."""
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 20, dtype=jnp.float64)
        v = np.where(grid.lat < 0, -1.0, 1.0)
        op = sh.mu_multiplier_operator(v)
        spec = random_spec(sh, key=11)
        via_grid = sh.analyze(sh.synthesize(spec) * v[:, None])
        via_op = sh.apply_mu_multiplier(op, spec)
        np.testing.assert_allclose(
            np.asarray(via_op), np.asarray(via_grid), atol=1e-12
        )

    def test_identity_multiplier(self):
        grid = LatLonGrid.regular(25, 48)
        sh = SphericalHarmonics.build(grid, 15, dtype=jnp.float64)
        op = sh.mu_multiplier_operator(np.ones(25))
        spec = random_spec(sh, key=12)
        np.testing.assert_allclose(
            np.asarray(sh.apply_mu_multiplier(op, spec)),
            np.asarray(spec), atol=1e-12,
        )


class TestMatmulFourier:
    """fourier='matmul' (precomputed DFT matmuls) vs the FFT path.

    The matmul path exists because at barotropic widths the TPU FFT
    lowers to many small kernels (BASELINE.md round-2 continuation);
    numerically the two must agree to round-off, including irfft's
    convention of dropping the imaginary parts of the m=0 and Nyquist
    modes.
    """

    @pytest.mark.parametrize(
        "J,L,T",
        [(73, 144, 72),  # M-1 == Nyquist (even nlon): multiplicity-1 row
         (37, 73, 24),   # odd nlon
         (24, 48, 15)],  # truncated well below Nyquist (zero-padded fft)
    )
    def test_matches_fft_path_f64(self, J, L, T):
        grid = LatLonGrid.regular(J, L)
        a = SphericalHarmonics.build(grid, T, dtype=jnp.float64)
        b = SphericalHarmonics.build(
            grid, T, dtype=jnp.float64, fourier="matmul"
        )
        x = jnp.asarray(np.random.RandomState(0).randn(J, L))
        np.testing.assert_allclose(
            np.asarray(a.analyze(x)), np.asarray(b.analyze(x)), atol=1e-13
        )
        spec = a.analyze(x)
        # Perturb m=0 imaginary part: both paths must drop it (irfft
        # Hermitian-input semantics).
        spec = spec.at[0, :].add(1j * 0.37)
        np.testing.assert_allclose(
            np.asarray(a.synthesize(spec)),
            np.asarray(b.synthesize(spec)),
            atol=1e-12,
        )

    def test_vector_transforms_match(self):
        grid = LatLonGrid.gaussian(32, 64)
        a = SphericalHarmonics.build(grid, 20, dtype=jnp.float64)
        b = SphericalHarmonics.build(
            grid, 20, dtype=jnp.float64, fourier="matmul"
        )
        spec = random_spec(a, key=3, wind=True)
        ua, va = a.uv_from_vrtdiv(spec, 0.5 * spec)
        ub, vb = b.uv_from_vrtdiv(spec, 0.5 * spec)
        np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=1e-12)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(jnp.stack(a.vrtdiv_from_uv(ua, va))),
            np.asarray(jnp.stack(b.vrtdiv_from_uv(ua, va))),
            atol=1e-12,
        )

    def test_barotropic_trajectory_agrees(self):
        from dlwp_tpu.barotropic import BarotropicModelPsi

        grid = LatLonGrid.regular(37, 72)
        z = 100.0 * np.random.RandomState(1).randn(37, 72).astype(np.float64)
        trajs = []
        for fourier in ("fft", "matmul"):
            m = BarotropicModelPsi(
                grid, truncation=24, dt=1800.0, dtype=jnp.float64,
                fourier=fourier,
            )
            trajs.append(np.asarray(m.z_grid(m.run(m.from_z(z), 20))))
        np.testing.assert_allclose(trajs[0], trajs[1], rtol=0, atol=1e-9)


def test_truncation_beyond_nyquist_rejected():
    """m > nlon/2 has no one-sided Fourier mode: both fourier paths must
    refuse at build time (the matmul tables would otherwise silently
    alias high m onto low modes)."""
    grid = LatLonGrid.regular(73, 64)
    for fourier in ("fft", "matmul"):
        with pytest.raises(ValueError):
            SphericalHarmonics.build(grid, 40, fourier=fourier)


class TestHemisphereFold:
    """fold=True packs the Legendre tables by hemisphere parity --
    half the contraction FLOPs/bytes -- and must be numerically
    equivalent to the dense path on symmetric grids."""

    @pytest.mark.parametrize(
        "maker,J,L,T",
        [("regular", 37, 72, 24),   # odd J (equator row), even N
         ("regular", 36, 72, 23),   # even J, even N
         ("gaussian", 32, 64, 20),  # gaussian, odd N
         ("regular", 73, 144, 72)],  # canonical barotropic grid
    )
    def test_matches_dense_path_f64(self, maker, J, L, T):
        grid = getattr(LatLonGrid, maker)(J, L)
        a = SphericalHarmonics.build(grid, T, dtype=jnp.float64)
        b = SphericalHarmonics.build(grid, T, dtype=jnp.float64, fold=True)
        x = jnp.asarray(np.random.RandomState(0).randn(3, J, L))
        np.testing.assert_allclose(
            np.asarray(a.analyze(x)), np.asarray(b.analyze(x)), atol=1e-13
        )
        spec = a.analyze(x[0])
        np.testing.assert_allclose(
            np.asarray(a.synthesize(spec)), np.asarray(b.synthesize(spec)),
            atol=1e-13,
        )

    def test_roundtrip_exact_f64(self):
        grid = LatLonGrid.regular(37, 72)
        sh = SphericalHarmonics.build(grid, 24, dtype=jnp.float64, fold=True)
        spec = random_spec(sh, key=5)
        back = sh.analyze(sh.synthesize(spec))
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(spec), atol=1e-12
        )

    def test_f32_roundtrip(self):
        grid = LatLonGrid.regular(37, 72)
        sh = SphericalHarmonics.build(grid, 24, fold=True)
        x = jnp.asarray(
            np.random.RandomState(1).randn(37, 72), jnp.float32
        )
        spec = sh.analyze(x)
        back = sh.analyze(sh.synthesize(spec))
        assert float(jnp.abs(back - spec).max()) < 1e-5

    def test_asymmetric_grid_rejected(self):
        lat = np.linspace(88.0, -90.0, 30)  # not equatorially symmetric
        lon = np.arange(0, 360, 6.0)
        grid = LatLonGrid.from_coords(lat, lon)
        with pytest.raises(ValueError):
            SphericalHarmonics.build(grid, 15, fold=True)

    def test_jit_and_fourier_compose(self):
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 20, fold=True, fourier="matmul")
        f = jax.jit(lambda x: sh.synthesize(sh.analyze(x)))
        x = jnp.asarray(np.random.RandomState(2).randn(32, 64), jnp.float32)
        out = f(x)
        assert out.shape == (32, 64) and bool(jnp.isfinite(out).all())

    @pytest.mark.parametrize(
        "maker,J,L,T",
        [("regular", 37, 72, 24), ("gaussian", 32, 64, 20),
         ("regular", 36, 72, 23)],
    )
    def test_vector_transforms_match_dense(self, maker, J, L, T):
        """Folded gradients / uv_from_vrtdiv / vrtdiv_from_uv vs dense
        (relative round-off; winds carry the a ~ 6.4e6 radius scale)."""
        grid = getattr(LatLonGrid, maker)(J, L)
        a = SphericalHarmonics.build(grid, T, dtype=jnp.float64)
        b = SphericalHarmonics.build(grid, T, dtype=jnp.float64, fold=True)
        spec = random_spec(a, key=7, wind=True)

        def rel(x, y):
            x, y = np.asarray(x), np.asarray(y)
            return np.abs(x - y).max() / max(np.abs(x).max(), 1e-300)

        gxa, gya = a.gradients(spec)
        gxb, gyb = b.gradients(spec)
        assert rel(gxa, gxb) < 1e-12 and rel(gya, gyb) < 1e-12
        ua, va = a.uv_from_vrtdiv(spec, 0.3 * spec)
        ub, vb = b.uv_from_vrtdiv(spec, 0.3 * spec)
        assert rel(ua, ub) < 1e-12 and rel(va, vb) < 1e-12
        vda = jnp.stack(a.vrtdiv_from_uv(ua, va))
        vdb = jnp.stack(b.vrtdiv_from_uv(ua, va))
        assert rel(vda, vdb) < 1e-11

    def test_folded_uv_roundtrip_identity(self):
        """uv_from_vrtdiv then vrtdiv_from_uv is the identity on
        band-limited winds through the folded paths too."""
        grid = LatLonGrid.gaussian(32, 64)
        sh = SphericalHarmonics.build(grid, 20, dtype=jnp.float64,
                                      fold=True)
        spec = random_spec(sh, key=8, wind=True)
        u, v = sh.uv_from_vrtdiv(spec, 0.5 * spec)
        vrt, div = sh.vrtdiv_from_uv(u, v)
        np.testing.assert_allclose(
            np.asarray(vrt), np.asarray(spec), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(div), np.asarray(0.5 * spec), atol=1e-10
        )


class TestDftTables:
    """dft_tables must reproduce numpy's rfft/irfft exactly (f64)."""

    @pytest.mark.parametrize("L,M", [(144, 73), (72, 25), (73, 25), (48, 25)])
    def test_forward_matches_rfft(self, L, M):
        from dlwp_tpu.spectral.transforms import dft_tables

        fwd, _ = dft_tables(L, M)
        x = np.random.RandomState(0).randn(5, L)
        both = x @ fwd  # (5, 2M)
        ref = np.fft.rfft(x, axis=-1)[:, :M] / L
        np.testing.assert_allclose(both[:, :M], ref.real, atol=1e-14)
        np.testing.assert_allclose(both[:, M:], ref.imag, atol=1e-14)

    @pytest.mark.parametrize("L,M", [(144, 73), (72, 25), (73, 25)])
    def test_inverse_matches_irfft(self, L, M):
        from dlwp_tpu.spectral.transforms import dft_tables

        _, inv = dft_tables(L, M)
        rng = np.random.RandomState(1)
        re = rng.randn(4, M)
        im = rng.randn(4, M)
        grid = np.concatenate([re, im], axis=-1) @ inv  # (4, L)
        nfreq = L // 2 + 1
        F = np.zeros((4, nfreq), complex)
        F[:, :M] = (re + 1j * im) * L
        ref = np.fft.irfft(F, n=L, axis=-1)
        np.testing.assert_allclose(grid, ref, atol=1e-12)

    def test_over_nyquist_rejected(self):
        from dlwp_tpu.spectral.transforms import dft_tables

        with pytest.raises(ValueError):
            dft_tables(64, 40)


def test_fold_differentiable_matches_dense_grad():
    """Gradients through folded transforms (strided packs, row folds,
    per-m selects) must match the dense path -- spectral losses backprop
    through analyze/synthesize."""
    grid = LatLonGrid.regular(37, 72)
    dense = SphericalHarmonics.build(grid, 24, dtype=jnp.float64)
    fold = SphericalHarmonics.build(grid, 24, dtype=jnp.float64, fold=True)
    x = jnp.asarray(np.random.RandomState(0).randn(37, 72))

    def loss(sh, v):
        s = sh.analyze(v)
        return jnp.sum(jnp.abs(s) ** 2) + jnp.sum(sh.synthesize(s) ** 2)

    g_dense = jax.grad(lambda v: loss(dense, v))(x)
    g_fold = jax.grad(lambda v: loss(fold, v))(x)
    np.testing.assert_allclose(
        np.asarray(g_fold), np.asarray(g_dense), atol=1e-11
    )
