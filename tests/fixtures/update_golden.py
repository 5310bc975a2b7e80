#!/usr/bin/env python
"""Recompute golden-fixture OUTPUT values from the stored inputs.

The fixtures in ``golden.npz`` pin trajectories/rollouts against numerical
drift. The *inputs* (initial states ``z0``/``cnn_x0``/``convlstm_x0`` and
parameter leaves) are never regenerated here -- only the derived outputs
are recomputed, for use after an INTENTIONAL semantics change (e.g. the
round-3 switch of ConvLSTM2D's default recurrent activation to the
reference-faithful Keras ``hard_sigmoid``). Any such regeneration must be
accompanied by an independent-oracle test of the new semantics
(tests/test_torch_oracle.py pins the ConvLSTM gate chain against a
straight-line PyTorch implementation).

Run on CPU: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tests/fixtures/update_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

# The golden values are float64 (tests/conftest.py enables x64); without
# this the recomputation silently downcasts and corrupts the fixtures.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden.npz")


def main():
    data = dict(np.load(FIXTURE))

    from dlwp_tpu import barotropic
    from dlwp_tpu.grid import LatLonGrid

    grid = LatLonGrid.regular(37, 72)
    for key, cls_name, mode in [
        ("vrt_ref_z", "BarotropicModel", "reference"),
        ("vrt_std_z", "BarotropicModel", "standard"),
        ("psi_ref_z", "BarotropicModelPsi", "reference"),
    ]:
        cls = getattr(barotropic, cls_name)
        m = cls(grid, 24, dt=1800.0, damping_coefficient=5e-6,
                spectral_mode=mode, dtype=jnp.float64)
        st = m.run(m.from_z(jnp.asarray(data["z0"])), 40)
        data[key] = np.asarray(m.z_grid(st))

    from dlwp_tpu.models import build_sequential

    model = build_sequential([
        ("CyclicConv2D", (8, 3), {"activation": "tanh"}),
        ("CyclicConv2D", (2, 3), {"activation": "linear"}),
    ])
    params = {
        "params": {
            "layers_0": {
                "kernel": jnp.asarray(data["param__params_layers_0_kernel"]),
                "bias": jnp.asarray(data["param__params_layers_0_bias"]),
            },
            "layers_1": {
                "kernel": jnp.asarray(data["param__params_layers_1_kernel"]),
                "bias": jnp.asarray(data["param__params_layers_1_bias"]),
            },
        }
    }
    x = jnp.asarray(data["cnn_x0"])
    for _ in range(5):
        x = model.apply(params, x)
    data["cnn_roll5"] = np.asarray(x)

    from __graft_entry__ import _flagship

    model, params0, _ = _flagship(nlat=8, nlon=16, convlstm=True)
    treedef = jax.tree_util.tree_structure(params0)
    n = len(jax.tree_util.tree_leaves(params0))
    leaves = [jnp.asarray(data[f"convlstm_param_{i}"]) for i in range(n)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    x = jnp.asarray(data["convlstm_x0"])
    for _ in range(3):
        pred = model.apply(params, x)
        x = jnp.concatenate([pred, x[:, :, 2:3]], axis=2)
    data["convlstm_roll3"] = np.asarray(x)

    np.savez_compressed(FIXTURE, **data)
    print(f"rewrote {FIXTURE}: {sorted(data)}")


if __name__ == "__main__":
    main()
