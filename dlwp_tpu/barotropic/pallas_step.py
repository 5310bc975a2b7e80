"""Fused whole-step Pallas kernel for the barotropic psi-form core.

Why: at barotropic sizes (T72, 73x144) the XLA step compiles to ~20
small kernels whose fixed launch/relayout overheads dominate -- the step
does only ~30 MFLOP but measures ~100 us (benchmarks/probes/
perf_barotropic.py). This kernel runs ``n_steps`` of the reference's
Robert-filtered leapfrog (``/root/reference/DLWP/barotropic/model.py:
126-159`` scheme, psi-form tendency ``:292-331``) inside ONE
``pallas_call`` with every spectral table resident in VMEM across steps,
so per-step cost is pure compute.

Design (all layouts chosen so NO in-kernel transpose is needed):

- State is real-pair spectral vorticity ``(M, N)`` x4 (re/im x cur/prev).
- Legendre synthesis/analysis run on the VPU as broadcast-multiply +
  lane-axis reductions against ``[m, q, n]`` / ``[m, n, j]`` tables
  (the per-m batched matmuls are too small to shape onto the MXU for a
  single member; the whole step is ~4M MACs).
- Longitude transforms are real DFT matmuls on the MXU
  (:func:`dlwp_tpu.spectral.transforms.dft_tables` semantics), applied
  with grids kept TRANSPOSED ``(lon, lat)``: synthesis modes come out as
  ``(m, j)`` rows, which is exactly the stacked-row layout both DFT
  matmuls consume.
- The hemisphere sign correction and the leading minus of
  ``dzdt = -analyze(jac)`` are composed into the analysis table on the
  host (same collapse as ``SphericalHarmonics.mu_multiplier_operator``).
- The reference's forward-Euler first step is handled by a per-iteration
  select on ``step0 + i == 0`` -- both one-liner updates are computed and
  ``jnp.where``-selected (cheaper than a branch at these sizes).

Single-member (unbatched) states only: batched integrations are ensemble
GEMMs where the plain XLA path already saturates the MXU
(BASELINE.md: B=64 -> 68k member-steps/s); the model falls back to it.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_tpu.spectral.transforms import dft_tables


def build_psi_step_tables(model) -> dict:
    """Host-side f64 table composition for :func:`psi_run_pallas`.

    ``model`` is a ``BarotropicModelPsi``; tables are returned as f32
    device arrays keyed by kernel operand name.
    """
    sh = model.sh
    a = float(model.grid.radius)
    M = N = sh.truncation + 1
    J = model.grid.nlat
    L = model.grid.nlon

    # Tables are kept SPLIT (G/H, DFT re/im halves) rather than stacked:
    # Mosaic cannot concatenate/slice at lane offsets that are not tile
    # multiples (73 % 128 != 0), so the kernel operates on whole arrays
    # only (padded to 128 lanes where blocks must be packed).
    # G feeds only d/dx, whose i*m/a factor is a per-m scale: fold it in.
    m_over_a = np.arange(M, dtype=np.float64)[:, None, None] / a
    Gm = np.asarray(sh.G, np.float64) * m_over_a  # (M, J, N)
    Ha = np.asarray(sh.H, np.float64) / a  # feeds d/dy, 1/a folded

    # Analysis composed with (-1) x optional hemisphere sign operator:
    # dzdt = sign_op(-analyze(jac)).
    A = -np.asarray(sh.A, np.float64)  # (M, N, J)
    if getattr(model, "correct_sh", False):
        op = np.asarray(model._sign_op, np.float64)  # (M, N, K)
        A = np.einsum("mnk,mkj->mnj", op, A)

    dft_fwd, dft_inv = dft_tables(L, M)
    damp = np.asarray(model.damping, np.float64)  # (M, N)
    dden = 1.0 / (1.0 + damp * model.dt)

    f = lambda x: jnp.asarray(x, jnp.float32)
    return {
        "Gm": f(Gm),  # (M, J, N): contract n on the lane axis
        "Ha": f(Ha),
        "A": f(A),    # (M, N, J): contract j on the lane axis
        "dinv": f(dft_inv.T),  # (L, 2M): [re | im] columns
        "dfwd_re": f(dft_fwd[:, :M].T),  # (M, L)
        "dfwd_im": f(dft_fwd[:, M:].T),  # (M, L)
        "invF": f(np.asarray(model.inv_z_vrt_factor, np.float64)),
        "damp": f(damp),
        "dden": f(dden),
    }


def _psi_kernel(n_steps: int, dt: float, r: float, J: int, M: int,
                step0_ref, vr_ref, vi_ref, pr_ref, pi_ref,
                Gm_ref, Ha_ref, A_ref, dinv_ref,
                dfwd_re_ref, dfwd_im_ref,
                invF_ref, damp_ref, dden_ref,
                ovr, ovi, opr, opi):
    dinv = dinv_ref[:]        # (L, 2M): [re | im] columns
    dfwd_re = dfwd_re_ref[:]  # (M, L)
    dfwd_im = dfwd_im_ref[:]  # (M, L)
    invF = invF_ref[:]      # (M, N)
    damp = damp_ref[:]
    dden = dden_ref[:]
    step0 = step0_ref[0]

    # The (M, *, *) broadcast products pad to (., 8k, 128) tiles; chunking
    # the m axis keeps each temporary under ~1.5 MB so the whole kernel
    # stays inside the 16 MB scoped-vmem stack (tables alone are ~9 MB).
    half = (M + 1) // 2

    def _red(tab_ref, x, lo, hi):
        # Broadcast-multiply + lane-axis reduce. Measured against the
        # sublane-reduce alternative (transposed tables, x lane-splat):
        # 83 vs 108 us/step -- the cross-lane cost moves into the x
        # broadcast and loses; this layout wins on hardware.
        return jnp.sum(tab_ref[lo:hi] * x[lo:hi][:, None, :], axis=-1)

    def syn(tab_ref, x):
        # (M, N) spec component -> (M, J) mode rows (VPU mul + reduce).
        return jnp.concatenate(
            [_red(tab_ref, x, 0, half), _red(tab_ref, x, half, M)], axis=0
        )

    def ana(x):
        # (M, J) Fourier-mode component -> (M, N) spectral component.
        return jnp.concatenate(
            [_red(A_ref, x, 0, half), _red(A_ref, x, half, M)], axis=0
        )

    # Full-precision MXU dots: at DEFAULT precision TPU fp32 matmuls run
    # as reduced-precision bf16 passes, which the leapfrog amplifies into
    # O(1) trajectory error within 40 steps (same effect as the
    # transforms' precision='highest' default, BASELINE.md round 2).
    dot32 = partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def igrid(f_re, f_im):
        # (M, J) mode component rows -> transposed grid (L, J): ONE MXU
        # matmul against the [re | im]-stacked inverse-DFT matrix (the
        # re/im stack is a dim-0 concat -- sublane-axis concats are the
        # ones Mosaic accepts at non-tile offsets). Packing the four
        # FIELDS into one 512-lane matmul was also tried: the 128-lane
        # pads + lane concats blow the 16 MB scoped-vmem stack.
        return dot32(dinv, jnp.concatenate([f_re, f_im], axis=0))

    def step(i, carry):
        vr, vi, pr, pi = carry
        psr = vr * invF
        psi = vi * invF
        # d/dx modes = i * Gm-syn (m/a folded into Gm);
        # d/dy modes = (H/a)-syn.
        dpdx = igrid(-syn(Gm_ref, psi), syn(Gm_ref, psr))  # (L, J) grids
        dvdx = igrid(-syn(Gm_ref, vi), syn(Gm_ref, vr))
        dpdy = igrid(syn(Ha_ref, psr), syn(Ha_ref, psi))
        dvdy = igrid(syn(Ha_ref, vr), syn(Ha_ref, vi))
        jac = dpdx * dvdy - dpdy * dvdx  # (L, J)
        Fre = dot32(dfwd_re, jac)
        Fim = dot32(dfwd_im, jac)
        tr = ana(Fre)   # (M, N); minus + sign correction pre-composed
        ti = ana(Fim)
        # Implicit hyperdiffusion against the lagged state
        # (reference model.py:135-136).
        dzr = (tr - damp * pr) * dden
        dzi = (ti - damp * pi) * dden
        # Leapfrog + Robert filter in the reference's exact interleave
        # (model.py:137-153); Euler on the global first step.
        lf_new_r = pr + (2.0 * dt) * dzr
        lf_new_i = pi + (2.0 * dt) * dzi
        lf_fil_r = vr + r * (pr - 2.0 * vr) + r * lf_new_r
        lf_fil_i = vi + r * (pi - 2.0 * vi) + r * lf_new_i
        eu_new_r = vr + dt * dzr
        eu_new_i = vi + dt * dzi
        eu_fil_r = vr + r * (eu_new_r - vr)
        eu_fil_i = vi + r * (eu_new_i - vi)
        first = (step0 + i) == 0
        return (
            jnp.where(first, eu_new_r, lf_new_r),
            jnp.where(first, eu_new_i, lf_new_i),
            jnp.where(first, eu_fil_r, lf_fil_r),
            jnp.where(first, eu_fil_i, lf_fil_i),
        )

    vr, vi, pr, pi = jax.lax.fori_loop(
        0, n_steps, step, (vr_ref[:], vi_ref[:], pr_ref[:], pi_ref[:])
    )
    ovr[:] = vr
    ovi[:] = vi
    opr[:] = pr
    opi[:] = pi


@partial(jax.jit, static_argnums=(0, 3, 4))
def _psi_call(model, state_parts, step0, n_steps: int, interpret: bool):
    vr, vi, pr, pi = state_parts
    tabs = model._pallas_tables
    M = model.truncation + 1
    J = model.grid.nlat
    kern = partial(
        _psi_kernel, n_steps, float(model.dt),
        float(model.robert_coefficient), J, M,
    )
    shape = jax.ShapeDtypeStruct((M, M), jnp.float32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(shape,) * 4,
        in_specs=[smem] + [vmem] * 13,
        out_specs=(vmem,) * 4,
        interpret=interpret,
    )(
        step0.reshape(1), vr, vi, pr, pi,
        tabs["Gm"], tabs["Ha"], tabs["A"],
        tabs["dinv"], tabs["dfwd_re"], tabs["dfwd_im"],
        tabs["invF"], tabs["damp"], tabs["dden"],
    )


def psi_run_pallas(model, state, n_steps: int):
    """Integrate ``n_steps`` with the fused kernel; returns the new state.

    Drop-in for the scan over ``step_forward`` (single-member f32 states).
    """
    from dlwp_tpu.barotropic.model import BarotropicState

    interpret = jax.default_backend() == "cpu"
    parts = (
        state.vrt_spec.real.astype(jnp.float32),
        state.vrt_spec.imag.astype(jnp.float32),
        state.vrt_spec_prev.real.astype(jnp.float32),
        state.vrt_spec_prev.imag.astype(jnp.float32),
    )
    vr, vi, pr, pi = _psi_call(model, parts, state.step, n_steps, interpret)
    return BarotropicState(
        vrt_spec=jax.lax.complex(vr, vi),
        vrt_spec_prev=jax.lax.complex(pr, pi),
        step=state.step + n_steps,
        t=state.t + n_steps * model.dt,
    )
