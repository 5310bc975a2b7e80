"""Independent float64 oracle for barotropic trajectory parity.

A numpy transliteration of the *reference's* barotropic scheme
(``/root/reference/DLWP/barotropic/model.py``: tendency + implicit damping +
forward-Euler/leapfrog/Robert interleave at :126-159, damping constants at
:69-71, z<->vrt inversion at :189-199, psi form at :292-331) written
deliberately WITHOUT importing ``dlwp_tpu.barotropic`` or
``dlwp_tpu.spectral.transforms``:

- coefficients live in packed pyspharm ordering (m-major: m = 0..T, n = m..T,
  matching spharm's ``getspecindx``), as the reference manipulates them;
- transforms are classical Gauss-Legendre *quadrature* analysis in plain
  numpy (valid on Gaussian grids), NOT the production engine's WLS inverse;
- time stepping mutates state arrays in place, step by step, as the
  reference does (no scan, no jit).

Only the float64 associated-Legendre recurrences are shared with production
(``dlwp_tpu.spectral.legendre.legendre_tables``) -- the tables are pure math
checked by their own analytic tests. Everything downstream (analysis
weights, vector analysis, packing, operators, sequencing) is derived here
independently, so a correlated bug in the production step/operator code
cannot cancel in the comparison.
"""

from __future__ import annotations

import numpy as np

from dlwp_tpu.spectral.legendre import legendre_tables


class PackedQuadratureTransforms:
    """pyspharm-style packed transforms via Gaussian quadrature (float64).

    API mirrors the reference's ``TransformsEngine``
    (``DLWP/barotropic/pyspharm_transforms.py:25-127``): packed complex
    coefficient vectors of length (T+1)(T+2)/2, m-major ordering.
    """

    def __init__(self, nlon, nlat, truncation, lats_deg, weights, radius):
        T = int(truncation)
        self.nlon = int(nlon)
        self.nlat = int(nlat)
        self.truncation = T
        self.radius = float(radius)
        self.lats = np.asarray(lats_deg, dtype=np.float64)
        mu = np.sin(np.radians(self.lats))
        tab = legendre_tables(T, mu)
        self.P = tab.P  # (M, J, N) float64
        self.G = tab.G
        self.H = tab.H
        self.w = np.asarray(weights, dtype=np.float64)
        # Packed (m-major) index vectors, as spharm's getspecindx returns:
        # zonal wavenumber m and total degree n per packed element.
        ms, ns = [], []
        for m in range(T + 1):
            for n in range(m, T + 1):
                ms.append(m)
                ns.append(n)
        self.indxm = np.array(ms)
        self.indxn = np.array(ns)
        self.nspec = len(ms)

    # ------------------------------------------------------------- packing
    def _unpack(self, packed):
        dense = np.zeros((self.truncation + 1,) * 2, dtype=np.complex128)
        dense[self.indxm, self.indxn] = packed
        return dense

    def _pack(self, dense):
        return dense[self.indxm, self.indxn]

    # ----------------------------------------------------------- transforms
    def _fourier(self, field):
        """(J, nlon) real -> (M, J) one-sided Fourier modes."""
        F = np.fft.rfft(field, axis=-1) / self.nlon
        return F[:, : self.truncation + 1].T.copy()

    def _inv_fourier(self, Fm):
        """(M, J) modes -> (J, nlon) real grid."""
        nfreq = self.nlon // 2 + 1
        full = np.zeros((self.nlat, nfreq), dtype=np.complex128)
        full[:, : Fm.shape[0]] = Fm.T
        return np.fft.irfft(full * self.nlon, n=self.nlon, axis=-1)

    def grid_to_spec(self, field):
        """Scalar analysis by quadrature: s_n^m = sum_j w_j Pbar F_m(j)."""
        Fm = self._fourier(np.asarray(field, dtype=np.float64))
        dense = np.einsum("mjn,j,mj->mn", self.P, self.w, Fm)
        return self._pack(dense)

    def spec_to_grid(self, packed):
        dense = self._unpack(packed)
        Fm = np.einsum("mjn,mn->mj", self.P, dense)
        return self._inv_fourier(Fm)

    def vrtdiv_spec_from_uv_grid(self, u, v):
        """Vector analysis by quadrature.

        Derivation: with synthesis u_m = (-H psi + i m G chi)/a,
        v_m = (i m G psi + H chi)/a and the orthogonality
        int [H_n H_k + m^2 G_n G_k] dmu = n(n+1) delta_nk (cross terms
        integrate to d(P_n P_k)/dmu -> 0), quadrature gives
        vrt_n^m = (1/a) sum_j w_j [u H + i m v G],
        div_n^m = (1/a) sum_j w_j [i m u G - v H].
        """
        um = self._fourier(np.asarray(u, dtype=np.float64))
        vm = self._fourier(np.asarray(v, dtype=np.float64))
        mvals = np.arange(self.truncation + 1, dtype=np.float64)[:, None]
        uH = np.einsum("mjn,j,mj->mn", self.H, self.w, um)
        vG = np.einsum("mjn,j,mj->mn", self.G, self.w, vm)
        uG = np.einsum("mjn,j,mj->mn", self.G, self.w, um)
        vH = np.einsum("mjn,j,mj->mn", self.H, self.w, vm)
        vrt = (uH + 1j * mvals * vG) / self.radius
        div = (1j * mvals * uG - vH) / self.radius
        return self._pack(vrt), self._pack(div)

    def uv_grid_from_vrtdiv_spec(self, vrt_packed, div_packed):
        """Helmholtz synthesis of winds from packed vorticity/divergence."""
        n = np.arange(self.truncation + 1, dtype=np.float64)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_lap = np.where(n > 0, -self.radius**2 / (n * (n + 1.0)), 0.0)
        psi = self._unpack(vrt_packed) * inv_lap
        chi = self._unpack(div_packed) * inv_lap
        mvals = np.arange(self.truncation + 1, dtype=np.float64)[:, None]
        psi_H = np.einsum("mjn,mn->mj", self.H, psi)
        psi_G = np.einsum("mjn,mn->mj", self.G, psi)
        chi_H = np.einsum("mjn,mn->mj", self.H, chi)
        chi_G = np.einsum("mjn,mn->mj", self.G, chi)
        um = (-psi_H + 1j * mvals * chi_G) / self.radius
        vm = (1j * mvals * psi_G + chi_H) / self.radius
        return self._inv_fourier(um), self._inv_fourier(vm)

    def grad_of_spec(self, packed):
        """(df/dx, df/dy) grids of a packed spectral field."""
        dense = self._unpack(packed)
        mvals = np.arange(self.truncation + 1, dtype=np.float64)[:, None]
        Gm = np.einsum("mjn,mn->mj", self.G, dense)
        Hm = np.einsum("mjn,mn->mj", self.H, dense)
        dx = self._inv_fourier(1j * mvals * Gm / self.radius)
        dy = self._inv_fourier(Hm / self.radius)
        return dx, dy

    @property
    def wavenumbers(self):
        """(m, n) packed index vectors, spharm getspecindx semantics."""
        return self.indxm, self.indxn


def _damping(engine, coefficient, order, truncation, mode):
    """Packed damping vector (reference model.py:69-71 semantics)."""
    m, n = engine.wavenumbers
    if mode == "reference":
        # The reference plugs getspecindx's total degree n into (m+n)(m+n+1).
        el = (m + n) * (m + n + 1.0) / engine.radius**2
    elif mode == "standard":
        el = n * (n + 1.0) / engine.radius**2
    else:
        raise ValueError(mode)
    return coefficient * (el / el[truncation]) ** order


def _z_vrt_factor(engine, mode):
    """Packed factor with vrt = factor * z (reference model.py:189-199)."""
    _, n = engine.wavenumbers
    if mode == "reference":
        nn = n + 1.0
        return -nn * (nn + 1.0) / engine.radius**2
    return -n * (n + 1.0) / engine.radius**2


def _safe_divide(packed, factor):
    out = np.zeros_like(packed)
    nz = factor != 0
    out[nz] = packed[nz] / factor[nz]
    return out


class RefBarotropicVrt:
    """Vorticity-form transliteration (reference BarotropicModel,
    model.py:26-199), stepping in place like the reference."""

    def __init__(self, z, truncation, dt, lats_deg, weights,
                 radius, robert_coefficient=0.04,
                 damping_coefficient=1e-4, damping_order=4,
                 mode="reference"):
        nlat, nlon = z.shape
        self.engine = PackedQuadratureTransforms(
            nlon, nlat, truncation, lats_deg, weights, radius
        )
        self.dt = float(dt)
        self.robert = float(robert_coefficient)
        self.damping = _damping(
            self.engine, damping_coefficient, damping_order, truncation, mode
        )
        self.factor = _z_vrt_factor(self.engine, mode)
        self.f = 2 * 7.29e-5 * np.sin(np.radians(self.engine.lats))[:, None]
        # set_state (model.py:99-124): z -> spectral vrt via the inversion
        # factor, round-tripped through grid space at truncation.
        vrt_grid = self.engine.spec_to_grid(
            self.factor * self.engine.grid_to_spec(z)
        )
        self.vrt_spec = self.engine.grid_to_spec(vrt_grid)
        self.vrt_grid = self.engine.spec_to_grid(self.vrt_spec)
        self.u_grid, self.v_grid = self.engine.uv_grid_from_vrtdiv_spec(
            self.vrt_spec, np.zeros_like(self.vrt_spec)
        )
        self.vrt_spec_prev = self.vrt_spec.copy()
        self.first_step = True

    def step_forward(self):
        dt = self.dt if self.first_step else 2 * self.dt
        dudt = -(self.f + self.vrt_grid) * self.v_grid
        dvdt = (self.f + self.vrt_grid) * self.u_grid
        dzetadt, _ = self.engine.vrtdiv_spec_from_uv_grid(dudt, dvdt)
        coeffs = 1.0 / (1.0 + self.damping * self.dt)
        dzetadt = coeffs * (dzetadt - self.damping * self.vrt_spec_prev)
        if self.first_step:
            new = self.vrt_spec + dt * dzetadt
            self.vrt_spec = self.vrt_spec + self.robert * (new - self.vrt_spec)
            self.first_step = False
        else:
            self.vrt_spec = self.vrt_spec + self.robert * (
                self.vrt_spec_prev - 2.0 * self.vrt_spec
            )
            new = self.vrt_spec_prev + dt * dzetadt
            self.vrt_spec = self.vrt_spec + self.robert * new
        self.vrt_spec_prev = self.vrt_spec.copy()
        self.vrt_spec = new
        self.vrt_grid = self.engine.spec_to_grid(new)
        self.u_grid, self.v_grid = self.engine.uv_grid_from_vrtdiv_spec(
            new, np.zeros_like(new)
        )

    def z(self):
        """Diagnose height (reference get_z, model.py:189-193)."""
        z_spec = _safe_divide(
            self.engine.grid_to_spec(self.vrt_grid), self.factor
        )
        return self.engine.spec_to_grid(z_spec)


class RefBarotropicPsi:
    """Streamfunction-form transliteration (reference BarotropicModelPsi,
    model.py:202-346)."""

    def __init__(self, z, truncation, dt, lats_deg, weights,
                 radius, robert_coefficient=0.04,
                 damping_coefficient=1e-4, damping_order=4,
                 mode="reference", correct_sh=True):
        nlat, nlon = z.shape
        self.engine = PackedQuadratureTransforms(
            nlon, nlat, truncation, lats_deg, weights, radius
        )
        self.dt = float(dt)
        self.robert = float(robert_coefficient)
        self.correct_sh = bool(correct_sh)
        self.damping = _damping(
            self.engine, damping_coefficient, damping_order, truncation, mode
        )
        self.factor = _z_vrt_factor(self.engine, mode)
        self.f0 = 2 * 7.29e-5
        self.g = 9.81
        # _set_state (model.py:275-290)
        self.psi_grid = self.g * np.asarray(z, dtype=np.float64) / self.f0
        self.vrt_spec = self.factor * self.engine.grid_to_spec(self.psi_grid)
        self.vrt_grid = self.engine.spec_to_grid(self.vrt_spec)
        self.vrt_spec_prev = self.vrt_spec.copy()
        self.first_step = True

    def _jacobian(self, psi_packed, vrt_packed):
        dpdx, dpdy = self.engine.grad_of_spec(psi_packed)
        dvdx, dvdy = self.engine.grad_of_spec(vrt_packed)
        return self.engine.grid_to_spec(dpdx * dvdy - dpdy * dvdx)

    def step_forward(self):
        psi_spec = self.engine.grid_to_spec(self.psi_grid)
        dzetadt = -1.0 * self._jacobian(psi_spec, self.vrt_spec)
        if self.correct_sh:
            # Hemisphere sign flip via an explicit grid round trip
            # (model.py:298-301) -- production fuses this into a spectral
            # operator, so this path cross-checks that fusion.
            g = self.engine.spec_to_grid(dzetadt)
            g[self.engine.lats < 0] *= -1.0
            dzetadt = self.engine.grid_to_spec(g)
        coeffs = 1.0 / (1.0 + self.damping * self.dt)
        dzetadt = coeffs * (dzetadt - self.damping * self.vrt_spec_prev)
        if self.first_step:
            dt = self.dt
            new = self.vrt_spec + dt * dzetadt
            self.vrt_spec = self.vrt_spec + self.robert * (new - self.vrt_spec)
            self.first_step = False
        else:
            dt = 2 * self.dt
            self.vrt_spec = self.vrt_spec + self.robert * (
                self.vrt_spec_prev - 2.0 * self.vrt_spec
            )
            new = self.vrt_spec_prev + dt * dzetadt
            self.vrt_spec = self.vrt_spec + self.robert * new
        self.vrt_spec_prev = self.vrt_spec.copy()
        self.vrt_spec = new
        self.vrt_grid = self.engine.spec_to_grid(new)
        self.psi_grid = self.engine.spec_to_grid(
            _safe_divide(new, self.factor)
        )

    def z(self):
        return self.f0 * self.psi_grid / self.g
