"""Spherical (s2cnn-equivalent) convolution layers.

Reference surface: ``DLWP/custom.py:22-25`` (optional s2cnn import) and
``examples/train_torch.py:100-114`` (the S2Convolution layer stack).  The
TPU-native design is spectral (``models/spherical.py``): gamma-averaged
S^2 correlation == per-degree learnable channel mix between harmonic
analysis and synthesis.  Tested properties are the ones s2cnn buys with
its SO(3) FFTs — rotation equivariance and per-degree action — plus the
reference spec-tuple build path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dlwp_tpu.grid import LatLonGrid
from dlwp_tpu.models.spherical import (
    S2Convolution,
    SO3Convolution,
    s2_near_identity_grid,
)
from dlwp_tpu.models.cnn import resolve_layer, build_sequential
from dlwp_tpu.spectral.transforms import SphericalHarmonics

RNG = jax.random.PRNGKey(7)


def _bandlimited(rng, shape, engine):
    """Random exactly-band-limited real field batch via synthesis."""
    M = engine.truncation + 1
    re = jax.random.normal(rng, shape + (M, M))
    im = jax.random.normal(jax.random.fold_in(rng, 1), shape + (M, M))
    spec = (re + 1j * im) * engine.mask
    # m = 0 modes must be real for a real field.
    spec = spec.at[..., 0, :].set(spec[..., 0, :].real.astype(spec.dtype))
    return engine.synthesize(spec)


class TestS2Convolution:
    def test_reference_spec_shapes(self):
        # The canonical train_torch.py:103-110 stack, spec-for-spec.
        g = s2_near_identity_grid(max_beta=0.2, n_alpha=12, n_beta=1)
        layer = S2Convolution(3, 16, 36, 12, g, mean_gamma=True, activation="tanh")
        x = jax.random.normal(RNG, (4, 3, 73, 144))
        params = layer.init(RNG, x)
        y = layer.apply(params, x)
        assert y.shape == (4, 16, 24, 24)  # (2*b_out, 2*b_out) grid
        assert jnp.all(jnp.abs(y) <= 1.0)  # tanh
        # b_in == b_out stays at (2b, 2b).
        layer2 = S2Convolution(16, 16, 12, 12, g, mean_gamma=True)
        p2 = layer2.init(RNG, y)
        y2 = layer2.apply(p2, y)
        assert y2.shape == (4, 16, 24, 24)

    def test_longitudinal_rotation_equivariance(self):
        """Rotating the input about the polar axis rotates the output.

        Exact for band-limited input (the per-degree multiply commutes with
        Wigner-D); a grid roll in longitude is an exact such rotation when
        the rotation angle is a multiple of the grid spacing AND input and
        output grids share nlon (keep_shape=True).
        """
        nlat, nlon, T = 19, 36, 8
        eng = SphericalHarmonics.build(LatLonGrid.regular(nlat, nlon), truncation=T)
        x = _bandlimited(RNG, (2, 3), eng)  # (2, 3, 19, 36)
        layer = S2Convolution(3, 5, T + 1, T + 1, None, keep_shape=True)
        params = layer.init(RNG, x)
        y = layer.apply(params, x)
        for shift in (1, 7):
            y_shifted = layer.apply(params, jnp.roll(x, shift, axis=-1))
            np.testing.assert_allclose(
                np.asarray(y_shifted),
                np.asarray(jnp.roll(y, shift, axis=-1)),
                atol=2e-5,  # fp32 engine round-off; measured ~2e-6 on O(10) values
            )

    def test_per_degree_eigenaction(self):
        """A pure harmonic Y_l^m input maps to W[l]-scaled Y_l^m output."""
        nlat, nlon, T = 19, 36, 8
        eng = SphericalHarmonics.build(LatLonGrid.regular(nlat, nlon), truncation=T)
        layer = S2Convolution(1, 1, T + 1, T + 1, None, use_bias=False, keep_shape=True)
        spec = jnp.zeros((T + 1, T + 1), dtype=eng.cdtype)
        spec = spec.at[3, 6].set(1.0 - 0.25j)
        f = eng.synthesize(spec)[None, None]
        params = layer.init(RNG, f)
        out_spec = np.asarray(eng.analyze(layer.apply(params, f)[0, 0]))
        w = np.asarray(params["params"]["spectral_kernel"])[:, 0, 0]
        expected = np.zeros_like(out_spec)
        expected[3, 6] = (1.0 - 0.25j) * w[6]
        np.testing.assert_allclose(out_spec, expected, atol=1e-5)

    def test_gradients_flow(self):
        layer = S2Convolution(2, 3, 10, 6, None)
        x = jax.random.normal(RNG, (2, 2, 19, 36))
        params = layer.init(RNG, x)

        def loss(p):
            return jnp.sum(layer.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_mean_gamma_false_rejected(self):
        layer = S2Convolution(1, 1, 6, 6, None, mean_gamma=False)
        x = jnp.zeros((1, 1, 12, 24))
        with pytest.raises(NotImplementedError):
            layer.init(RNG, x)

    def test_channel_count_validated(self):
        layer = S2Convolution(3, 4, 6, 6, None)
        with pytest.raises(ValueError):
            layer.init(RNG, jnp.zeros((1, 2, 12, 24)))

    def test_so3_alias(self):
        layer = SO3Convolution(2, 2, 8, 8, None, keep_shape=True)
        x = jax.random.normal(RNG, (1, 2, 17, 32))
        y = layer.apply(layer.init(RNG, x), x)
        assert y.shape == (1, 2, 17, 32)


class TestRegistrySpecs:
    def test_train_torch_stack_verbatim(self):
        """The full reference architecture (train_torch.py:100-114) builds
        through the declarative spec path and runs end to end."""
        s2_grid = s2_near_identity_grid(max_beta=0.2, n_alpha=12, n_beta=1)
        truncation = 6
        n_features = 3 * 19 * 36
        layers = (
            ("S2Convolution", (3, 8, 10, truncation, s2_grid),
             {"mean_gamma": True, "activation": "tanh"}),
            ("S2Convolution", (8, 8, truncation, truncation, s2_grid),
             {"mean_gamma": True, "activation": "tanh"}),
            ("TorchReshape", ((-1, 8 * (2 * truncation) ** 2),), None),
            ("Linear", (8 * (2 * truncation) ** 2, n_features), None),
            ("TorchReshape", ((-1, 3, 19, 36),), None),
        )
        model = build_sequential(layers)
        x = jax.random.normal(RNG, (2, 3, 19, 36))
        params = model.init(RNG, x)
        y = model.apply(params, x)
        assert y.shape == x.shape

    def test_linear_and_torch_reshape_aliases(self):
        lin = resolve_layer(("Linear", (64, 10), None))
        x = jax.random.normal(RNG, (5, 64))
        y = lin.apply(lin.init(RNG, x), x)
        assert y.shape == (5, 10)
        rs = resolve_layer(("TorchReshape", ((-1, 2, 5),), None))
        assert rs.apply({}, jnp.zeros((5, 10))).shape == (5, 2, 5)
