"""Golden-value regression tests (SURVEY.md section 4(b)).

Fixtures in ``tests/fixtures/golden.npz`` pin 40-step barotropic
trajectories (both forms, both spectral modes) and a 5-step CNN rollout
with stored parameters. Any numerical drift in the spectral engine, time
integration, stencil ops, or layer semantics fails these.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


class TestBarotropicGolden:
    @pytest.mark.parametrize(
        "key,cls_name,mode",
        [
            ("vrt_ref_z", "BarotropicModel", "reference"),
            ("vrt_std_z", "BarotropicModel", "standard"),
            ("psi_ref_z", "BarotropicModelPsi", "reference"),
        ],
    )
    def test_40_step_trajectory(self, golden, key, cls_name, mode):
        from dlwp_tpu import barotropic
        from dlwp_tpu.grid import LatLonGrid

        grid = LatLonGrid.regular(37, 72)
        cls = getattr(barotropic, cls_name)
        m = cls(grid, 24, dt=1800.0, damping_coefficient=5e-6,
                spectral_mode=mode, dtype=jnp.float64)
        st = m.from_z(jnp.asarray(golden["z0"]))
        st = m.run(st, 40)
        z = np.asarray(m.z_grid(st))
        np.testing.assert_allclose(z, golden[key], rtol=0, atol=1e-8)


class TestCNNGolden:
    def test_5_step_rollout(self, golden):
        from dlwp_tpu.models import build_sequential

        model = build_sequential([
            ("CyclicConv2D", (8, 3), {"activation": "tanh"}),
            ("CyclicConv2D", (2, 3), {"activation": "linear"}),
        ])
        params = {
            "params": {
                "layers_0": {
                    "kernel": jnp.asarray(golden["param__params_layers_0_kernel"]),
                    "bias": jnp.asarray(golden["param__params_layers_0_bias"]),
                },
                "layers_1": {
                    "kernel": jnp.asarray(golden["param__params_layers_1_kernel"]),
                    "bias": jnp.asarray(golden["param__params_layers_1_bias"]),
                },
            }
        }
        x = jnp.asarray(golden["cnn_x0"])
        for _ in range(5):
            x = model.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(x), golden["cnn_roll5"], atol=1e-10
        )
