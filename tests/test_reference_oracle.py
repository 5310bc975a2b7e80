"""Barotropic trajectory parity vs an independent reference transliteration.

The production models (``dlwp_tpu.barotropic``: dense [m, n] coefficients,
WLS-inverse analysis, fused operators, lax.scan stepping) are integrated
side by side with ``tests/oracles/reference_barotropic`` (packed pyspharm
ordering, quadrature analysis, in-place numpy stepping transliterated from
``/root/reference/DLWP/barotropic/model.py``). On quadrature-exact grids the
two formulations are mathematically identical, so 40-step float64 height
trajectories must agree to ~1e-9 relative -- catching correlated bugs that
self-golden regression fixtures cannot (the BASELINE.json "prognostic fields
allclose to reference" requirement, without needing pyspharm installed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dlwp_tpu.barotropic import BarotropicModel, BarotropicModelPsi
from dlwp_tpu.grid.latlon import LatLonGrid

from tests.oracles.reference_barotropic import (
    PackedQuadratureTransforms,
    RefBarotropicPsi,
    RefBarotropicVrt,
)

N_STEPS = 40
DT = 1800.0


def _grid(kind):
    if kind == "gaussian":
        # T <= nlat - 1 keeps Gauss-Legendre quadrature exact on coefficient
        # products -> oracle quadrature == production WLS, exactly.
        return LatLonGrid.gaussian(24, 48), 15
    # Regular pole-inclusive grid (the CFS data layout): Clenshaw-Curtis
    # weights are exact to degree nlat-1, so keep 2T <= nlat - 1.
    return LatLonGrid.regular(25, 48), 10


def _initial_z(grid, truncation):
    """Band-limited Z500-like field built through the oracle's synthesis."""
    eng = PackedQuadratureTransforms(
        grid.nlon, grid.nlat, truncation, grid.lat, grid.quad_weights,
        grid.radius,
    )
    rng = np.random.RandomState(7)
    coeff = rng.randn(eng.nspec) + 1j * rng.randn(eng.nspec)
    coeff *= np.exp(-0.15 * (eng.indxn + eng.indxm))
    coeff[eng.indxm == 0] = coeff[eng.indxm == 0].real  # real zonal modes
    coeff[0] = 0.0  # mean handled separately
    z = 5500.0 + 40.0 * eng.spec_to_grid(coeff)
    assert np.abs(z - 5500.0).max() > 10.0
    return z


@pytest.mark.parametrize("grid_kind", ["gaussian", "regular"])
@pytest.mark.parametrize("mode", ["reference", "standard"])
def test_vorticity_form_parity(grid_kind, mode):
    grid, T = _grid(grid_kind)
    z0 = _initial_z(grid, T)
    oracle = RefBarotropicVrt(
        z0, T, DT, grid.lat, grid.quad_weights, grid.radius,
        damping_coefficient=5e-6, mode=mode,
    )
    model = BarotropicModel(
        grid, T, dt=DT, damping_coefficient=5e-6, spectral_mode=mode,
        dtype=jnp.float64,
    )
    state = model.from_z(jnp.asarray(z0))
    for _ in range(N_STEPS):
        oracle.step_forward()
    state = model.run(state, N_STEPS)
    # Spectral vorticity parity (strictest check): compare packed.
    packed = np.asarray(model.sh.pack(state.vrt_spec))
    np.testing.assert_allclose(
        packed, oracle.vrt_spec, rtol=1e-8, atol=1e-16,
    )
    # Grid-space height parity.
    z_model = np.asarray(model.z_grid(state))
    z_oracle = oracle.z()
    np.testing.assert_allclose(z_model, z_oracle, rtol=0, atol=1e-5)
    # The integration actually moved the state.
    assert np.abs(z_oracle - z0).max() > 1.0


@pytest.mark.parametrize("grid_kind", ["gaussian", "regular"])
@pytest.mark.parametrize("mode", ["reference", "standard"])
@pytest.mark.parametrize("correct_sh", [True, False])
def test_psi_form_parity(grid_kind, mode, correct_sh):
    grid, T = _grid(grid_kind)
    z0 = _initial_z(grid, T)
    oracle = RefBarotropicPsi(
        z0, T, DT, grid.lat, grid.quad_weights, grid.radius,
        damping_coefficient=5e-6, mode=mode, correct_sh=correct_sh,
    )
    model = BarotropicModelPsi(
        grid, T, dt=DT, damping_coefficient=5e-6, spectral_mode=mode,
        correct_sh=correct_sh, dtype=jnp.float64,
    )
    state = model.from_z(jnp.asarray(z0))
    for _ in range(N_STEPS):
        oracle.step_forward()
    state = model.run(state, N_STEPS)
    packed = np.asarray(model.sh.pack(state.vrt_spec))
    np.testing.assert_allclose(
        packed, oracle.vrt_spec, rtol=1e-8, atol=1e-16,
    )
    z_model = np.asarray(model.z_grid(state))
    z_oracle = oracle.z()
    np.testing.assert_allclose(z_model, z_oracle, rtol=0, atol=1e-5)
    assert np.abs(z_oracle - z0).max() > 1.0


class TestOracleSelfConsistency:
    """The oracle's own transforms must round-trip -- otherwise parity
    agreement would be vacuous."""

    def test_scalar_round_trip(self):
        grid, T = _grid("gaussian")
        eng = PackedQuadratureTransforms(
            grid.nlon, grid.nlat, T, grid.lat, grid.quad_weights, grid.radius
        )
        rng = np.random.RandomState(0)
        spec = rng.randn(eng.nspec) + 1j * rng.randn(eng.nspec)
        spec[eng.indxm == 0] = spec[eng.indxm == 0].real
        back = eng.grid_to_spec(eng.spec_to_grid(spec))
        np.testing.assert_allclose(back, spec, rtol=1e-12, atol=1e-12)

    def test_vector_round_trip(self):
        grid, T = _grid("gaussian")
        eng = PackedQuadratureTransforms(
            grid.nlon, grid.nlat, T, grid.lat, grid.quad_weights, grid.radius
        )
        rng = np.random.RandomState(1)
        vrt = rng.randn(eng.nspec) + 1j * rng.randn(eng.nspec)
        vrt[eng.indxm == 0] = vrt[eng.indxm == 0].real
        vrt[eng.indxn == 0] = 0.0  # degree 0 carries no wind
        div = 0.5 * vrt
        u, v = eng.uv_grid_from_vrtdiv_spec(vrt, div)
        vrt2, div2 = eng.vrtdiv_spec_from_uv_grid(u, v)
        np.testing.assert_allclose(vrt2, vrt, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(div2, div, rtol=1e-10, atol=1e-12)
