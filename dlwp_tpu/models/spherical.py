r"""Spherical (S2 / SO(3)) convolution layers, spectral-native.

The reference's spherical-CNN path is the optional s2cnn dependency
(``DLWP/custom.py:22-25``) exercised by ``examples/train_torch.py:20,100-114``:
``S2Convolution(nfeature_in, nfeature_out, b_in, b_out, grid)`` layers with
``mean_gamma=True`` — i.e. the SO(3) cross-correlation output is averaged
over the third Euler angle so features stay resident on the sphere.  s2cnn
computes that correlation with CUDA SO(3)-FFT kernels.

The TPU-native design here skips the SO(3) detour entirely.  For the
gamma-averaged correlation the math collapses: writing the input channel
f and filter h in spherical harmonics,

    (f \star h)(g) = \int_{S^2} f(x) \overline{h(g^{-1} x)} dx,  g in SO(3)
    => \widehat{avg_gamma(f \star h)}^l_m = \hat f^l_m \cdot \overline{\hat h^l_0}

so only the filter's *zonal* coefficients (one real number per degree l)
survive.  A bank of C_in x C_out learnable filters is therefore exactly a
real weight tensor ``W[l, c_in, c_out]`` applied per spectral degree — and
the whole layer is three MXU contractions: harmonic analysis (matmul
Legendre + DFT tables from :class:`~dlwp_tpu.spectral.transforms
.SphericalHarmonics`), a per-degree channel mix (one einsum), and harmonic
synthesis onto the output bandwidth's grid.  Exact rotation equivariance
(the property s2cnn buys with its SO(3) FFTs) holds by construction: the
per-degree multiply commutes with every rotation's Wigner-D action on the
coefficients.  Bandwidth change (b_in -> b_out) is spectral truncation /
zero-padding — the same thing s2cnn's FFT resampling does.

Grid convention: s2cnn uses 2b x 2b Driscoll-Healy grids; here layers accept
ANY (..., C, nlat, nlon) input on a pole-inclusive equiangular grid and emit
(..., C_out, 2*b_out, 2*b_out) by default (so reference layer stacks like
train_torch.py:100-114, including the trailing flatten/Linear sizing
``16 * (2*truncation)**2``, translate verbatim), or ``keep_shape=True`` to
stay on the input grid.  The ``grid`` argument (an s2cnn near-identity
kernel sampling grid, e.g. ``s2_near_identity_grid()``) parameterizes HOW
s2cnn discretizes its filters; spectrally-parameterized filters make it
moot, so it is accepted and ignored for spec compatibility.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dlwp_tpu.models.layers import get_activation


@functools.lru_cache(maxsize=16)
def _engine(nlat: int, nlon: int, truncation: int):
    """Cached spectral engine on the pole-inclusive equiangular grid.

    Small-grid layers re-trace often (every jit of a model apply); the
    float64 host-side table build is the expensive part, so share engines
    across layers and traces.  ``fourier='matmul'`` because spherical-CNN
    grids are small (2b ~ 24-72 points): one DFT matmul fuses into the
    surrounding contractions where the TPU FFT lowers to many tiny kernels
    (measured in BASELINE.md round-2 notes for nlon ~ 144).
    """
    from dlwp_tpu.grid import LatLonGrid
    from dlwp_tpu.spectral.transforms import SphericalHarmonics

    grid = LatLonGrid.regular(nlat, nlon)
    return SphericalHarmonics.build(
        grid, truncation=truncation, fourier="matmul", precision="highest"
    )


def _max_truncation(nlat: int, nlon: int) -> int:
    return min(nlat - 1, nlon // 2)


class S2Convolution(nn.Module):
    """Spherical convolution, gamma-averaged s2cnn semantics, spectral-native.

    Args mirror the reference spec tuples (``examples/train_torch.py:103-110``):
    positional ``(nfeature_in, nfeature_out, b_in, b_out, grid)``.

    - ``b_in``: input bandwidth; analysis keeps degrees l < b_in (clamped to
      what the input grid supports).
    - ``b_out``: output bandwidth; output carries degrees l < min(b_in, b_out)
      on a (2*b_out, 2*b_out) equiangular grid (``keep_shape=True`` keeps the
      input grid instead).
    - ``grid``: s2cnn kernel-sampling grid descriptor; ignored (see module
      docstring).
    - ``mean_gamma``: only ``True`` (the reference's setting) is supported —
      features stay on S^2.  SO(3)-resident feature fields (``False``) are
      out of scope; the reference never exercises them.

    ``nfeature_in`` is validated against the incoming channel axis (-3),
    matching the explicit in-channel argument of the torch-style spec.
    """

    nfeature_in: int
    nfeature_out: int
    b_in: int
    b_out: int
    grid: Any = None
    mean_gamma: bool = True
    activation: str | Callable | None = None
    use_bias: bool = True
    keep_shape: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.mean_gamma:
            raise NotImplementedError(
                "S2Convolution supports mean_gamma=True only (features "
                "resident on S^2, the reference configuration — "
                "train_torch.py:104). SO(3)-resident features are out of "
                "scope; see models/spherical.py docstring."
            )
        if x.shape[-3] != self.nfeature_in:
            raise ValueError(
                f"S2Convolution: input has {x.shape[-3]} channels, spec says "
                f"nfeature_in={self.nfeature_in}"
            )
        nlat, nlon = x.shape[-2], x.shape[-1]
        t_in = min(self.b_in - 1, _max_truncation(nlat, nlon))
        if t_in < self.b_in - 1:
            warnings.warn(
                f"S2Convolution: requested b_in={self.b_in} exceeds what the "
                f"{nlat}x{nlon} input grid supports; clamping to "
                f"truncation {t_in} (degrees l <= {t_in}). Model capacity "
                f"is reduced accordingly.",
                stacklevel=2,
            )
        # Degrees carried through to the output (band-limit of the product).
        n_deg = min(t_in, self.b_out - 1) + 1

        if self.keep_shape:
            out_nlat, out_nlon = nlat, nlon
        else:
            out_nlat = out_nlon = 2 * self.b_out
        t_out = min(n_deg - 1, _max_truncation(out_nlat, out_nlon))

        ana = _engine(nlat, nlon, t_in)
        syn = ana if (out_nlat, out_nlon, t_out) == (nlat, nlon, t_in) else _engine(
            out_nlat, out_nlon, t_out
        )

        # Per-degree filter bank: the zonal harmonic coefficients of
        # C_in x C_out learnable spherical filters (module docstring).
        # Init scale (ADVICE r4 re-derivation): for unit-variance
        # band-limited input, the analysis->per-degree-mix->synthesis chain
        # preserves total spectral power degree by degree, so
        # Var(out) = C_in * std^2 * Var(in) independent of bandwidth —
        # per-coefficient magnitudes fall as ~1/n_modes but the synthesis
        # sums the same n_modes back. std = 1/sqrt(C_in) therefore
        # preserves variance; the old 1/sqrt(C_in * n_deg) attenuated
        # ~sqrt(n_deg)-fold per layer (measured 0.04-0.06 out-std at
        # b=12..90; with this init, 1.00 +- 0.03 for band-limited input
        # at b=12/36/90, with only above-truncation input power lost).
        std = 1.0 / np.sqrt(self.nfeature_in)
        w = self.param(
            "spectral_kernel",
            nn.initializers.normal(stddev=std),
            (n_deg, self.nfeature_in, self.nfeature_out),
            jnp.float32,
        )

        dtype = x.dtype
        spec = ana.analyze(x)  # (..., C_in, t_in+1, t_in+1) complex, [m, l]
        spec = spec[..., : t_out + 1, : t_out + 1]
        wk = w[: t_out + 1].astype(spec.real.dtype)
        # Per-degree channel mix; degree l is the LAST spectral axis.
        out_spec = jnp.einsum(
            "...imn,nio->...omn", spec, wk, precision=jax.lax.Precision.HIGHEST
        )
        y = syn.synthesize(out_spec).astype(dtype)

        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.nfeature_out,), jnp.float32
            )
            y = y + b.astype(dtype)[..., :, None, None]
        return get_activation(self.activation)(y)


class SO3Convolution(S2Convolution):
    """SO(3) correlation layer, gamma-averaged, spectral-native.

    The reference imports this alongside ``S2Convolution``
    (``DLWP/custom.py:23``) but no reference workflow instantiates it.  With
    features kept resident on S^2 (the gamma-averaged representation this
    module family uses throughout), the SO(3) correlation's surviving part
    is the same per-degree channel mix as :class:`S2Convolution` — Wigner
    coefficients ``\\hat h^l_{m,n}`` enter only through ``n = 0`` after the
    gamma average, exactly as in the S^2 case.  Full SO(3)-resident feature
    fields are out of scope (never exercised by the reference).
    """


def s2_near_identity_grid(
    max_beta: float = np.pi / 16, n_alpha: int = 8, n_beta: int = 3
) -> tuple:
    """Compatibility shim for s2cnn's kernel-sampling grid constructor.

    ``examples/train_torch.py:20,100`` builds one of these and passes it to
    every ``S2Convolution``.  Spectrally-parameterized filters don't sample a
    kernel grid, so this returns the (beta, alpha) tuple purely so reference
    scripts translate verbatim; the layers ignore it.
    """
    beta = np.arange(1, n_beta + 1) * max_beta / n_beta
    alpha = np.linspace(0, 2 * np.pi, n_alpha, endpoint=False)
    b, a = np.meshgrid(beta, alpha, indexing="ij")
    return tuple(zip(b.flatten().tolist(), a.flatten().tolist()))
