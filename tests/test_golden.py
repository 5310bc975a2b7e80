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


class TestConvLSTMFlagshipGolden:
    def test_3_step_rollout(self, golden):
        """The canonical ConvLSTM-front-end flagship (reference
        train.py:142-221 configuration via __graft_entry__._flagship) rolled
        3 steps with insolation-persisting feedback, in float64."""
        from __graft_entry__ import _flagship

        model, params0, _ = _flagship(nlat=8, nlon=16, convlstm=True)
        # Rebuild the pinned f64 parameter tree: same structure as a fresh
        # init, leaves restored in tree-flatten order.
        treedef = jax.tree_util.tree_structure(params0)
        n = len(jax.tree_util.tree_leaves(params0))
        leaves = [jnp.asarray(golden[f"convlstm_param_{i}"]) for i in range(n)]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        x = jnp.asarray(golden["convlstm_x0"])
        for _ in range(3):
            pred = model.apply(params, x)
            x = jnp.concatenate([pred, x[:, :, 2:3]], axis=2)
        np.testing.assert_allclose(
            np.asarray(x), golden["convlstm_roll3"], atol=1e-10
        )
