"""Barotropic vorticity equation dynamical cores, TPU-native.

Functional re-design of the reference's barotropic models
(``DLWP/barotropic/model.py:26-199`` vorticity form, ``:202-346``
streamfunction form): state is an immutable pytree, a step is a pure
function, and integration is a single jitted ``lax.scan`` -- per step the
reference crosses the Python<->Fortran boundary ~6 times
(``SURVEY.md`` section 3.3); here the whole trajectory compiles to one XLA
program of batched matmuls (Legendre) + FFTs + elementwise updates.

Numerical scheme (identical to the reference):
  - forward-Euler first step, then leapfrog, with Robert-Asselin filter
    applied in the reference's exact interleave (model.py:137-153);
  - implicit del^(2*damping_order) hyperdiffusion
    (``coeffs = 1/(1 + damping*dt)``, model.py:135-136).

Reference-compat quirks, controlled by ``spectral_mode``:
  The reference computes the hyperdiffusion wavenumber as ``(m + n)(m + n + 1)``
  where ``n`` is already the *total degree* returned by pyspharm's
  ``getspecindx`` (model.py:69-71), and inverts vorticity <-> height with the
  factor ``-(n+1)(n+2)/a^2`` (model.py:189-199) rather than the Laplacian
  eigenvalue ``-n(n+1)/a^2``. ``spectral_mode='reference'`` (default)
  reproduces exactly those operators for trajectory parity;
  ``spectral_mode='standard'`` uses the textbook n(n+1) forms.

Everything supports leading batch dimensions (vmap-free batching over
ensemble members / init times, as in ``examples/run_barotropic.py:37``).

Performance options (measured on TPU v5e, BASELINE.md):
  - ``fourier='matmul'``: longitude transforms as precomputed real DFT
    matmuls instead of rfft/irfft -- +19% at T72 (the TPU FFT lowers to
    many small kernels at these widths); round-off-identical.
  - ``step_impl='pallas'``: the whole ``run(state, n)`` integration as
    ONE fused Pallas kernel with VMEM-resident tables (+44% over the XLA
    scan at T72 single-member). Single-member f32 states only; batched
    states transparently fall back to the XLA scan, which is the right
    engine for ensembles (batched contractions saturate the MXU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from dlwp_tpu.grid.latlon import GRAVITY, LatLonGrid, OMEGA
from dlwp_tpu.spectral.transforms import SphericalHarmonics


@struct.dataclass
class BarotropicState:
    """Prognostic state: spectral vorticity at current and previous step.

    ``vrt_spec``/``vrt_spec_prev`` have shape (..., T+1, T+1) complex;
    ``step`` is the integer step counter (0 before the first step -- the
    first step uses forward Euler, reference model.py:126-131);
    ``t`` is model time in seconds.
    """

    vrt_spec: jax.Array
    vrt_spec_prev: jax.Array
    step: jax.Array  # int32 scalar
    t: jax.Array  # float seconds


def _hyperdiffusion(
    sh: SphericalHarmonics,
    damping_coefficient: float,
    damping_order: int,
    truncation: int,
    mode: str,
) -> np.ndarray:
    """Per-mode damping coefficients (dense [m, n] layout)."""
    n = np.asarray(sh.n_total)
    m = np.arange(truncation + 1, dtype=np.float64)[:, None]
    a2 = sh.grid.radius**2
    if mode == "reference":
        # Reference model.py:69-71: el = (m + n)(m + n + 1)/a^2 with n the
        # total degree; normalized by the packed-index-T element = (m=0, n=T).
        el = (m + n) * (m + n + 1.0) / a2
        el_t = truncation * (truncation + 1.0) / a2
    elif mode == "standard":
        el = n * (n + 1.0) / a2
        el_t = truncation * (truncation + 1.0) / a2
    else:
        raise ValueError("spectral_mode must be 'reference' or 'standard'")
    damp = damping_coefficient * (el / el_t) ** damping_order
    return damp * np.asarray(sh.mask)


def _z_vrt_factor(sh: SphericalHarmonics, mode: str) -> np.ndarray:
    """Spectral factor F with vrt = F * z (dense [m, n]).

    'reference': F = -(n+1)(n+2)/a^2 (reference model.py:189-199 uses
    degree+1 in the n(n+1) formula). 'standard': the true Laplacian
    eigenvalue -n(n+1)/a^2 (zero mode annihilated on inversion).
    """
    n = np.asarray(sh.n_total)
    a2 = sh.grid.radius**2
    if mode == "reference":
        f = -(n + 1.0) * (n + 2.0) / a2
    else:
        f = -n * (n + 1.0) / a2
    return f * np.asarray(sh.mask)


class _BarotropicBase:
    """Shared scheme: Robert-filtered leapfrog + implicit hyperdiffusion."""

    def __init__(
        self,
        grid: LatLonGrid,
        truncation: int,
        dt: float,
        robert_coefficient: float = 0.04,
        damping_coefficient: float = 1e-4,
        damping_order: int = 4,
        spectral_mode: str = "reference",
        dtype=jnp.float32,
        fourier: str = "fft",
        fold: bool = False,
        step_impl: str = "xla",
    ):
        if step_impl not in ("xla", "pallas"):
            raise ValueError("step_impl must be 'xla' or 'pallas'")
        if step_impl == "pallas" and jnp.dtype(dtype) != jnp.float32:
            raise ValueError("step_impl='pallas' supports float32 only")
        self.step_impl = step_impl
        self.grid = grid
        self.truncation = int(truncation)
        self.dt = float(dt)
        self.robert_coefficient = float(robert_coefficient)
        self.spectral_mode = spectral_mode
        self.sh = SphericalHarmonics.build(
            grid, truncation, dtype=dtype, fourier=fourier, fold=fold
        )
        self.damping = jnp.asarray(
            _hyperdiffusion(
                self.sh, damping_coefficient, damping_order, self.truncation,
                spectral_mode,
            ),
            dtype=dtype,
        )
        self.z_vrt_factor = jnp.asarray(
            _z_vrt_factor(self.sh, spectral_mode), dtype=dtype
        )
        with np.errstate(divide="ignore"):
            inv = 1.0 / np.asarray(self.z_vrt_factor)
        inv = np.where(np.isfinite(inv) & np.asarray(self.sh.mask, bool), inv, 0.0)
        self.inv_z_vrt_factor = jnp.asarray(inv, dtype=dtype)
        # Coriolis parameter on the grid, (nlat, 1) for broadcasting.
        self.f_grid = jnp.asarray(
            grid.coriolis[:, None], dtype=dtype
        )

    # ---- tendency is supplied by subclasses -------------------------------
    def _tendency(self, vrt_spec: jax.Array) -> jax.Array:
        raise NotImplementedError

    def from_vorticity_spec(self, vrt_spec: jax.Array) -> BarotropicState:
        """Initialize directly from spectral vorticity (e.g. analytic tests)."""
        vrt_spec = jnp.asarray(vrt_spec, dtype=self.sh.cdtype)
        return BarotropicState(
            vrt_spec=vrt_spec,
            vrt_spec_prev=vrt_spec,
            step=jnp.int32(0),
            t=jnp.asarray(0.0, dtype=self.sh.dtype),
        )

    # ---- time stepping ----------------------------------------------------
    def step_forward(self, state: BarotropicState) -> BarotropicState:
        """One Robert-filtered (leapfrog | first-step Euler) step.

        Exact functional transliteration of the reference's in-place
        interleave (model.py:126-159): after the step, ``vrt_spec`` holds the
        *unfiltered* new value and ``vrt_spec_prev`` the *filtered* old
        current value.
        """
        r = self.robert_coefficient
        dzdt = self._tendency(state.vrt_spec)
        # Implicit hyperdiffusion against the lagged state (model.py:135-136).
        dzdt = (dzdt - self.damping * state.vrt_spec_prev) / (
            1.0 + self.damping * self.dt
        )

        def first(_):
            new = state.vrt_spec + self.dt * dzdt
            filtered = state.vrt_spec + r * (new - state.vrt_spec)
            return new, filtered

        def leapfrog(_):
            cur = state.vrt_spec + r * (
                state.vrt_spec_prev - 2.0 * state.vrt_spec
            )
            new = state.vrt_spec_prev + 2.0 * self.dt * dzdt
            filtered = cur + r * new
            return new, filtered

        new, filtered = jax.lax.cond(state.step == 0, first, leapfrog, None)
        return BarotropicState(
            vrt_spec=new,
            vrt_spec_prev=filtered,
            step=state.step + 1,
            t=state.t + self.dt,
        )

    def _use_pallas(self, state: BarotropicState) -> bool:
        """Fused-kernel eligibility: opted in, single member, TPU or CPU.

        Batched states fall back to the XLA scan (ensemble GEMMs already
        saturate the MXU there; the kernel targets single-member
        latency), as do non-TPU accelerator backends (Mosaic kernels do
        not lower there; CPU runs the kernel in interpret mode, which is
        what the tests exercise).
        """
        backend = jax.default_backend()
        return (
            self.step_impl == "pallas"
            and state.vrt_spec.ndim == 2
            and backend not in ("gpu", "cuda", "rocm")
        )

    def _advance(self, state: BarotropicState, k: int) -> BarotropicState:
        """Advance ``k`` steps with the configured engine."""
        if self._use_pallas(state):
            from dlwp_tpu.barotropic.pallas_step import run_pallas

            return run_pallas(self, state, k)

        def body(s, _):
            return self.step_forward(s), None

        state, _ = jax.lax.scan(body, state, None, length=k)
        return state

    @partial(jax.jit, static_argnums=(0, 2))
    def run(self, state: BarotropicState, n_steps: int) -> BarotropicState:
        """Integrate ``n_steps`` under a single lax.scan (or, with
        ``step_impl='pallas'``, one fused whole-trajectory kernel)."""
        return self._advance(state, n_steps)

    @partial(jax.jit, static_argnums=(0, 2, 3))
    def run_with_snapshots(
        self, state: BarotropicState, n_snapshots: int, snapshot_every: int
    ):
        """Integrate, returning height-field snapshots.

        Equivalent of the reference generator ``run_with_snapshots``
        (model.py:161-187), but as one compiled nested scan producing
        ``(state, times (n_snapshots,), z (n_snapshots, ..., nlat, nlon))``.
        """

        def outer(s, _):
            s = self._advance(s, snapshot_every)
            return s, (s.t, self.z_grid(s))

        state, (times, zs) = jax.lax.scan(
            outer, state, None, length=n_snapshots
        )
        return state, times, zs

    # ---- diagnostics ------------------------------------------------------
    def vrt_grid(self, state: BarotropicState) -> jax.Array:
        return self.sh.synthesize(state.vrt_spec)

    def uv_grid(self, state: BarotropicState) -> tuple[jax.Array, jax.Array]:
        return self.sh.uv_from_vrtdiv(
            state.vrt_spec, jnp.zeros_like(state.vrt_spec)
        )

    def z_grid(self, state: BarotropicState) -> jax.Array:
        raise NotImplementedError


class BarotropicModel(_BarotropicBase):
    """Vorticity-form core (reference ``BarotropicModel``, model.py:26-199).

    Advects absolute vorticity with the nondivergent wind:
    d(zeta)/dt from curl of (-(f+zeta)v, (f+zeta)u), computed via the vector
    spherical-harmonic analysis -- one fused spectral step per time step.
    Height is diagnosed from vorticity via the (mode-dependent) spectral
    inversion factor.
    """

    def from_z(self, z: jax.Array) -> BarotropicState:
        """Initialize from a height field (reference set_state, model.py:99).

        vrt = synth/analysis round trip of F * analyze(z); prev = current so
        the implicit damping sees a consistent lagged state.
        """
        z = jnp.asarray(z, dtype=self.sh.dtype)
        vrt_spec = self.z_vrt_factor * self.sh.analyze(z)
        return BarotropicState(
            vrt_spec=vrt_spec,
            vrt_spec_prev=vrt_spec,
            step=jnp.int32(0),
            t=jnp.asarray(0.0, dtype=self.sh.dtype),
        )

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.step_impl == "pallas":
            from dlwp_tpu.barotropic.pallas_step import build_vrt_step_tables

            self._pallas_form = "vrt"
            self._pallas_tables = build_vrt_step_tables(self)
        # Stacked synthesis table for the fused tendency (built eagerly --
        # never inside a trace): vrt, u and v are all linear in
        # psi = inv_lap(vrt), so one (m, 3J, n) contraction produces all
        # three Fourier-mode sets:
        #   rows [0, J):   P * lap_eig   -> vrt
        #   rows [J, 2J):  -H / a        -> u  (chi = 0)
        #   rows [2J, 3J): G / a         -> v  (times i*m afterwards)
        sh = self.sh
        a = self.grid.radius
        P_lap = sh.P * sh.laplacian_eig[:, None, :]
        self._syn_table = jnp.concatenate(
            [P_lap, -sh.H / a, sh.G / a], axis=1
        )

    def _tendency(self, vrt_spec: jax.Array) -> jax.Array:
        sh = self.sh
        J = self.grid.nlat
        psi = (vrt_spec * sh.inv_laplacian_eig).astype(sh.cdtype)
        # vrt loses its n=0 mode through inv_lap/lap; restore it exactly.
        n0 = vrt_spec[..., :, 0:1]
        modes = sh._legendre_syn(self._syn_table, psi)  # (..., m, 3J)
        im = (1j * sh.m_vals).astype(sh.cdtype)[:, None]
        stacked = jnp.stack(
            [
                modes[..., :J]
                + sh._legendre_syn(sh.P[:, :, 0:1], n0),  # vrt
                modes[..., J : 2 * J],  # u
                im * modes[..., 2 * J :],  # v
            ]
        )
        grids = sh._inv_fourier(stacked)  # one batched irfft
        vrt, u, v = grids[0], grids[1], grids[2]
        abs_vrt = self.f_grid + vrt
        dudt = -abs_vrt * v
        dvdt = abs_vrt * u
        dzdt, _ = self.sh.vrtdiv_from_uv(dudt, dvdt)
        return dzdt

    def z_grid(self, state: BarotropicState) -> jax.Array:
        """Diagnose height from vorticity (reference get_z, model.py:189)."""
        vrt = self.sh.synthesize(state.vrt_spec)
        z_spec = self.sh.analyze(vrt) * self.inv_z_vrt_factor
        return self.sh.synthesize(z_spec)


class BarotropicModelPsi(_BarotropicBase):
    """Streamfunction-form core (reference ``BarotropicModelPsi``,
    model.py:202-346): psi = g z / f0, advection via the spectral Jacobian
    J(psi, zeta), optional southern-hemisphere sign correction."""

    def __init__(self, *args, f0: float = 2 * OMEGA, correct_sh: bool = True,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.f0 = float(f0)
        self.correct_sh = bool(correct_sh)
        if self.correct_sh:
            # The reference flips the tendency sign in the southern
            # hemisphere via a grid round trip (model.py:298-301). The
            # multiplier is latitude-only, so the round trip collapses to a
            # precomputed spectral operator: one contraction, no FFTs,
            # bit-identical result.
            sign = np.where(self.grid.lat < 0, -1.0, 1.0)
            self._sign_op = self.sh.mu_multiplier_operator(sign)
        if self.step_impl == "pallas":
            from dlwp_tpu.barotropic.pallas_step import build_psi_step_tables

            self._pallas_form = "psi"
            self._pallas_tables = build_psi_step_tables(self)

    def from_z(self, z: jax.Array) -> BarotropicState:
        z = jnp.asarray(z, dtype=self.sh.dtype)
        psi = GRAVITY * z / self.f0
        vrt_spec = self.z_vrt_factor * self.sh.analyze(psi)
        return BarotropicState(
            vrt_spec=vrt_spec,
            vrt_spec_prev=vrt_spec,
            step=jnp.int32(0),
            t=jnp.asarray(0.0, dtype=self.sh.dtype),
        )

    def _tendency(self, vrt_spec: jax.Array) -> jax.Array:
        psi_spec = vrt_spec * self.inv_z_vrt_factor
        # One stacked gradients call for (psi, vrt): halves the transform
        # count per step (gradients batches over leading dims).
        dx, dy = self.sh.gradients(jnp.stack([psi_spec, vrt_spec]))
        dpdx, dvdx = dx[0], dx[1]
        dpdy, dvdy = dy[0], dy[1]
        jac = dpdx * dvdy - dpdy * dvdx
        dzdt = -self.sh.analyze(jac)
        if self.correct_sh:
            dzdt = self.sh.apply_mu_multiplier(self._sign_op, dzdt)
        return dzdt

    def psi_grid(self, state: BarotropicState) -> jax.Array:
        return self.sh.synthesize(state.vrt_spec * self.inv_z_vrt_factor)

    def z_grid(self, state: BarotropicState) -> jax.Array:
        return self.f0 * self.psi_grid(state) / GRAVITY
