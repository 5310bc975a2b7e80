"""Fused whole-step Pallas kernel (barotropic psi-form) vs the XLA scan.

Runs in interpret mode on CPU; the kernels' hardware numbers are in
BASELINE.md (psi form: 13.3k steps/s vs 9.3k for the XLA scan at T72).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlwp_tpu.grid import LatLonGrid
from dlwp_tpu.barotropic import BarotropicModel, BarotropicModelPsi


GRID = LatLonGrid.regular(37, 72)


def _z0(seed=1):
    return jnp.asarray(
        100.0 * np.random.RandomState(seed).randn(37, 72), jnp.float32
    )


class TestFusedPallasStep:
    @pytest.mark.parametrize("correct_sh", [True, False])
    @pytest.mark.parametrize("spectral_mode", ["reference", "standard"])
    def test_psi_trajectory_matches_xla(self, correct_sh, spectral_mode):
        kw = dict(truncation=24, dt=1800.0, correct_sh=correct_sh,
                  spectral_mode=spectral_mode)
        a = BarotropicModelPsi(GRID, **kw)
        b = BarotropicModelPsi(GRID, step_impl="pallas", **kw)
        za = np.asarray(a.z_grid(a.run(a.from_z(_z0()), 20)))
        zb = np.asarray(b.z_grid(b.run(b.from_z(_z0()), 20)))
        rel = np.abs(za - zb).max() / np.abs(za).max()
        assert rel < 1e-5, rel

    @pytest.mark.parametrize("spectral_mode", ["reference", "standard"])
    def test_vorticity_trajectory_matches_xla(self, spectral_mode):
        kw = dict(truncation=24, dt=1800.0, spectral_mode=spectral_mode)
        a = BarotropicModel(GRID, **kw)
        b = BarotropicModel(GRID, step_impl="pallas", **kw)
        za = np.asarray(a.z_grid(a.run(a.from_z(_z0()), 20)))
        zb = np.asarray(b.z_grid(b.run(b.from_z(_z0()), 20)))
        rel = np.abs(za - zb).max() / np.abs(za).max()
        assert rel < 1e-5, rel

    def test_resume_mid_trajectory(self):
        """7 + 13 steps == 20 steps exactly (the Euler first step must
        fire only at global step 0, threaded via the state counter)."""
        m = BarotropicModelPsi(GRID, truncation=24, dt=1800.0,
                               step_impl="pallas")
        s20 = m.run(m.from_z(_z0()), 20)
        s2 = m.run(m.run(m.from_z(_z0()), 7), 13)
        np.testing.assert_array_equal(
            np.asarray(s2.vrt_spec), np.asarray(s20.vrt_spec)
        )
        assert int(s2.step) == 20

    def test_run_with_snapshots(self):
        xla = BarotropicModelPsi(GRID, truncation=24, dt=1800.0)
        pal = BarotropicModelPsi(GRID, truncation=24, dt=1800.0,
                                 step_impl="pallas")
        _, ta, za = xla.run_with_snapshots(xla.from_z(_z0()), 3, 4)
        _, tb, zb = pal.run_with_snapshots(pal.from_z(_z0()), 3, 4)
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
        rel = np.abs(np.asarray(za) - np.asarray(zb)).max() / np.abs(
            np.asarray(za)).max()
        assert rel < 1e-5, rel

    def test_batched_state_falls_back_to_xla(self):
        """Leading batch dims use the XLA scan (documented fallback)."""
        m = BarotropicModelPsi(GRID, truncation=24, dt=1800.0,
                               step_impl="pallas")
        z = jnp.stack([_z0(1), _z0(2)])
        out = m.run(m.from_z(z), 5)
        assert out.vrt_spec.shape == (2, 25, 25)
        xla = BarotropicModelPsi(GRID, truncation=24, dt=1800.0)
        solo = xla.run(xla.from_z(_z0(2)), 5)
        ref = np.asarray(solo.vrt_spec)
        err = np.abs(np.asarray(out.vrt_spec[1]) - ref).max()
        assert err <= 1e-6 * np.abs(ref).max(), err

    def test_float64_rejects_pallas(self):
        with pytest.raises(ValueError):
            BarotropicModelPsi(GRID, truncation=24, dt=1800.0,
                               dtype=jnp.float64, step_impl="pallas")

    def test_bad_step_impl_rejected(self):
        with pytest.raises(ValueError):
            BarotropicModelPsi(GRID, truncation=24, dt=1800.0,
                               step_impl="fused")
