"""Fused whole-trajectory Pallas kernels for the barotropic cores.

Why: at barotropic sizes (T72, 73x144) the XLA step compiles to ~20
small kernels whose fixed launch/relayout overheads dominate -- the step
does only ~30 MFLOP but measures ~105 us (benchmarks/probes/
perf_barotropic.py). These kernels run ``n_steps`` of the reference's
Robert-filtered leapfrog (``/root/reference/DLWP/barotropic/model.py:
126-159`` scheme; psi-form tendency ``:292-331``, vorticity-form
``:126-159``/``:99-124``) inside ONE ``pallas_call`` with every spectral
table resident in VMEM across steps, so per-step cost is pure compute.

Design (all layouts chosen so NO in-kernel transpose is needed):

- State is real-pair spectral vorticity ``(M, N)`` x4 (re/im x cur/prev).
- Legendre synthesis/analysis run on the VPU as broadcast-multiply +
  lane-axis reductions (measured faster than sublane reduces -- the
  cross-lane cost otherwise moves into the x broadcast -- and 90x faster
  than Mosaic's batched ``dot_general``, which also ignores
  ``precision``). The per-m matmuls are too small to shape onto the MXU
  for a single member.
- Longitude transforms are real DFT matmuls on the MXU at
  ``Precision.HIGHEST`` (DEFAULT MXU precision runs fp32 as bf16 passes,
  which the leapfrog amplified to 0.23 relative trajectory error within
  40 steps). Grids are kept TRANSPOSED ``(lon, lat)``: synthesis modes
  come out as ``(m, j)`` rows, exactly the stacked-row layout both DFT
  matmuls consume.
- Per-(m, n) linear factors (i*m/a, inverse Laplacian, the hemisphere
  sign correction, the tendency's leading minus, the Laplacian in the
  vector analysis) are composed into the f64 host-built tables.
- The reference's forward-Euler first step is selected per-iteration on
  ``step0 + i == 0`` (both one-line updates computed, ``jnp.where``).

Single-member (unbatched) f32 states only: batched integrations are
ensemble GEMMs where the plain XLA path already saturates the MXU
(BASELINE.md: B=64 -> 68k member-steps/s); the models fall back to it.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_tpu.spectral.transforms import dft_tables


_PSI_TABLES = ("Gm", "Ha", "A", "dinv", "dfwd_re", "dfwd_im",
               "invF", "damp", "dden")
_VRT_TABLES = ("P", "Hv", "Gv", "Au", "Av", "dinv", "dfwd_re", "dfwd_im",
               "f_row", "damp", "dden")


def _common_tables(model) -> dict:
    M = model.sh.truncation + 1
    dft_fwd, dft_inv = dft_tables(model.grid.nlon, M)
    damp = np.asarray(model.damping, np.float64)  # (M, N)
    return {
        "dinv": dft_inv.T,  # (L, 2M): [re | im] columns
        "dfwd_re": dft_fwd[:, :M].T,  # (M, L)
        "dfwd_im": dft_fwd[:, M:].T,  # (M, L)
        "damp": damp,
        "dden": 1.0 / (1.0 + damp * model.dt),
    }


def build_psi_step_tables(model) -> dict:
    """Host-side f64 table composition for the psi-form kernel."""
    sh = model.sh
    a = float(model.grid.radius)
    M = sh.truncation + 1

    # Tables are kept SPLIT (G/H, DFT re/im halves) rather than stacked:
    # Mosaic cannot concatenate/slice at lane offsets that are not tile
    # multiples (73 % 128 != 0). G feeds only d/dx, whose i*m/a factor
    # is a per-m scale: fold it in.
    m_over_a = np.arange(M, dtype=np.float64)[:, None, None] / a
    tabs = _common_tables(model)
    tabs["Gm"] = np.asarray(sh.G, np.float64) * m_over_a  # (M, J, N)
    tabs["Ha"] = np.asarray(sh.H, np.float64) / a

    # Analysis composed with (-1) x optional hemisphere sign operator:
    # dzdt = sign_op(-analyze(jac)).
    A = -np.asarray(sh.A, np.float64)  # (M, N, J)
    if getattr(model, "correct_sh", False):
        op = np.asarray(model._sign_op, np.float64)  # (M, N, K)
        A = np.einsum("mnk,mkj->mnj", op, A)
    tabs["A"] = A
    tabs["invF"] = np.asarray(model.inv_z_vrt_factor, np.float64)
    return {k: jnp.asarray(v, jnp.float32) for k, v in tabs.items()}


def build_vrt_step_tables(model) -> dict:
    """Host-side f64 table composition for the vorticity-form kernel.

    The XLA tendency's psi round trip (``model._tendency``) is folded
    away: vorticity synthesizes directly through P (lap * inv_lap = 1 on
    n > 0 and the n = 0 mode is restored explicitly there -- together
    exactly P), winds through H/a and G*m/a with the inverse Laplacian
    folded, and the curl analysis through lap * AuPsi / lap * AvPsi.
    """
    sh = model.sh
    a = float(model.grid.radius)
    M = sh.truncation + 1

    m_over_a = np.arange(M, dtype=np.float64)[:, None, None] / a
    inv_lap = np.asarray(sh.inv_laplacian_eig, np.float64)[:, None, :]
    lap = np.asarray(sh.laplacian_eig, np.float64)

    tabs = _common_tables(model)
    tabs["P"] = np.asarray(sh.P, np.float64)  # (M, J, N)
    tabs["Hv"] = np.asarray(sh.H, np.float64) / a * inv_lap
    tabs["Gv"] = np.asarray(sh.G, np.float64) * m_over_a * inv_lap
    tabs["Au"] = lap[:, :, None] * np.asarray(sh.AuPsi, np.float64)
    tabs["Av"] = lap[:, :, None] * np.asarray(sh.AvPsi, np.float64)
    tabs["f_row"] = np.asarray(model.grid.coriolis, np.float64)[None, :]
    return {k: jnp.asarray(v, jnp.float32) for k, v in tabs.items()}


def _make_kernel(form: str, n_steps: int, dt: float, r: float, M: int):
    """Build the fused kernel body for ``form`` in {'psi', 'vrt'}."""
    names = _PSI_TABLES if form == "psi" else _VRT_TABLES

    def kernel(step0_ref, vr_ref, vi_ref, pr_ref, pi_ref, *refs):
        tab = dict(zip(names, refs[: len(names)]))
        ovr, ovi, opr, opi = refs[len(names):]
        dinv = tab["dinv"][:]        # (L, 2M)
        dfwd_re = tab["dfwd_re"][:]  # (M, L)
        dfwd_im = tab["dfwd_im"][:]
        damp = tab["damp"][:]        # (M, N)
        dden = tab["dden"][:]
        step0 = step0_ref[0]

        # The (M, *, *) broadcast products pad to (., 8k, 128) tiles;
        # chunking the m axis keeps each temporary small -- measured
        # faster than whole-table products even with the vmem limit
        # raised (77.5 vs 91.8 us/step).
        half = (M + 1) // 2

        def _red(tab_ref, x, lo, hi):
            # Broadcast-multiply + lane-axis reduce.
            return jnp.sum(tab_ref[lo:hi] * x[lo:hi][:, None, :], axis=-1)

        def con(tab_ref, x):
            # (M, N) spec -> (M, J) modes, or (M, J) modes -> (M, N)
            # spec, depending on the table's layout.
            return jnp.concatenate(
                [_red(tab_ref, x, 0, half), _red(tab_ref, x, half, M)],
                axis=0,
            )

        dot32 = partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        def igrid(f_re, f_im):
            # (M, J) mode rows -> transposed grid (L, J): one MXU matmul
            # against the [re | im]-stacked inverse-DFT matrix (dim-0
            # concats are the ones Mosaic accepts at non-tile offsets).
            return dot32(dinv, jnp.concatenate([f_re, f_im], axis=0))

        if form == "psi":
            invF = tab["invF"][:]

            def tendency(vr, vi):
                psr = vr * invF
                psi = vi * invF
                # d/dx modes = i * Gm-syn; d/dy modes = (H/a)-syn.
                dpdx = igrid(-con(tab["Gm"], psi), con(tab["Gm"], psr))
                dvdx = igrid(-con(tab["Gm"], vi), con(tab["Gm"], vr))
                dpdy = igrid(con(tab["Ha"], psr), con(tab["Ha"], psi))
                dvdy = igrid(con(tab["Ha"], vr), con(tab["Ha"], vi))
                jac = dpdx * dvdy - dpdy * dvdx  # (L, J)
                # Minus + sign correction are composed into A.
                return (con(tab["A"], dot32(dfwd_re, jac)),
                        con(tab["A"], dot32(dfwd_im, jac)))
        else:
            f_row = tab["f_row"][:]  # (1, J)

            def tendency(vr, vi):
                vrt = igrid(con(tab["P"], vr), con(tab["P"], vi))
                u = igrid(-con(tab["Hv"], vr), -con(tab["Hv"], vi))
                # v modes = i * Gv-syn.
                v = igrid(-con(tab["Gv"], vi), con(tab["Gv"], vr))
                abs_vrt = f_row + vrt  # (L, J)
                dudt = -abs_vrt * v
                dvdt = abs_vrt * u
                fur = dot32(dfwd_re, dudt)
                fui = dot32(dfwd_im, dudt)
                fvr = dot32(dfwd_re, dvdt)
                fvi = dot32(dfwd_im, dvdt)
                # vrt tendency = lap * (AuPsi . u_m + i AvPsi . v_m);
                # lap is composed into Au/Av.
                return (con(tab["Au"], fur) - con(tab["Av"], fvi),
                        con(tab["Au"], fui) + con(tab["Av"], fvr))

        def step(i, carry):
            vr, vi, pr, pi = carry
            tr, ti = tendency(vr, vi)
            # Implicit hyperdiffusion against the lagged state
            # (reference model.py:135-136).
            dzr = (tr - damp * pr) * dden
            dzi = (ti - damp * pi) * dden
            # Leapfrog + Robert filter in the reference's exact
            # interleave (model.py:137-153); Euler on the global first
            # step.
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

    return kernel


@partial(jax.jit, static_argnums=(0, 3, 4))
def _fused_call(model, state_parts, step0, n_steps: int, interpret: bool):
    form = model._pallas_form
    names = _PSI_TABLES if form == "psi" else _VRT_TABLES
    tabs = model._pallas_tables
    M = model.truncation + 1
    kern = _make_kernel(
        form, n_steps, float(model.dt), float(model.robert_coefficient), M
    )
    shape = jax.ShapeDtypeStruct((M, M), jnp.float32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(shape,) * 4,
        in_specs=[smem] + [vmem] * (4 + len(names)),
        out_specs=(vmem,) * 4,
        # The default 16 MB scoped-vmem cap is a compiler soft limit
        # inside the 128 MB physical VMEM; the vorticity form's five
        # (M, 73, 73) tables need ~15 MB before temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(step0.reshape(1), *state_parts, *(tabs[k] for k in names))


def run_pallas(model, state, n_steps: int):
    """Integrate ``n_steps`` with the fused kernel; returns the new state.

    Drop-in for the scan over ``step_forward`` (single-member f32 states).
    """
    import warnings

    from dlwp_tpu.barotropic.model import BarotropicState

    interpret = jax.default_backend() == "cpu"
    if interpret:
        warnings.warn(
            "step_impl='pallas' runs in Pallas interpret mode on CPU "
            "(correct but slow; used by the tests). For CPU speed use "
            "step_impl='xla'.",
            stacklevel=2,
        )
    parts = (
        state.vrt_spec.real.astype(jnp.float32),
        state.vrt_spec.imag.astype(jnp.float32),
        state.vrt_spec_prev.real.astype(jnp.float32),
        state.vrt_spec_prev.imag.astype(jnp.float32),
    )
    vr, vi, pr, pi = _fused_call(model, parts, state.step, n_steps, interpret)
    # Accumulate t with the same n sequential f32 additions as the XLA
    # scan so snapshot timestamps are engine-independent bit-for-bit
    # (a single n*dt multiply rounds differently for dt not exactly
    # representable); this is a trivial scalar loop.
    dt = jnp.asarray(model.dt, dtype=state.t.dtype)
    t = jax.lax.fori_loop(0, n_steps, lambda i, t: t + dt, state.t)
    return BarotropicState(
        vrt_spec=jax.lax.complex(vr, vi),
        vrt_spec_prev=jax.lax.complex(pr, pi),
        step=state.step + n_steps,
        t=t,
    )
