"""Spherical-harmonic transforms as batched MXU matmuls.

The TPU-native replacement for the reference's ``TransformsEngine``
(``DLWP/barotropic/pyspharm_transforms.py:25-127``, a facade over Fortran
SPHEREPACK). Same capability surface -- scalar analysis/synthesis, u/v <->
vorticity/divergence, spectral gradients, wavenumbers, grid coordinates --
but re-designed for XLA:

- Longitude direction: batched real FFT (``jnp.fft.rfft``/``irfft``).
- Latitude direction: dense associated-Legendre contractions ``[m, j, n]``
  expressed as einsums -> batched matmuls on the MXU. No ragged per-m loops.
- Analysis operators are *weighted-least-squares left inverses* of the
  synthesis operators, precomputed on host in float64. This guarantees exact
  spec -> grid -> spec round trips on ANY latitude grid (Gaussian, regular
  pole-inclusive, even custom), where classical quadrature is only exact on
  Gaussian grids. On Gaussian grids the WLS inverse reduces to the classical
  weighted transform (orthonormality makes the Gram matrix the identity).
- Vector transforms use the pole-regular tables G = P/cos(lat) and
  H = cos(lat) * dP/dmu, so winds are evaluated directly at pole rows.

Coefficient layout: dense complex ``[..., m, n]`` with shape (T+1, T+1) and
zeros for n < m. ``m`` is the zonal wavenumber of the *one-sided* Fourier
series (rfft convention); ``n`` is the total degree. This dense layout (vs.
pyspharm's packed (nspec,) vector) is deliberate: static rectangular shapes
keep XLA tiling the contractions onto the 128x128 systolic array.
"""

from __future__ import annotations

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.grid.latlon import LatLonGrid
from dlwp_tpu.spectral.legendre import legendre_tables


def dft_tables(nlon: int, n_modes: int) -> tuple[np.ndarray, np.ndarray]:
    """Real DFT matrices implementing rfft/irfft for one-sided modes.

    Returns ``(dft_fwd, dft_inv)`` float64:

    - ``dft_fwd`` (nlon, 2M) with columns ``[cos/L | -sin/L]``:
      ``field @ dft_fwd`` gives the stacked (Re, Im) one-sided modes of
      ``rfft(field)/L`` truncated to M modes.
    - ``dft_inv`` (2M, nlon) with multiplicity-weighted rows under
      irfft's Hermitian-input convention (imaginary parts of the m = 0
      and Nyquist modes are dropped, as irfft does):
      ``stack([re, im]) . dft_inv`` reconstructs the grid.
    """
    L, M = int(nlon), int(n_modes)
    if M > L // 2 + 1:
        # The FFT path fails loudly here (shape mismatch); the matmul
        # tables would silently alias m >= nlon//2+1 onto lower modes.
        raise ValueError(
            f"n_modes={M} exceeds the one-sided spectrum of nlon={L} "
            f"({L // 2 + 1} modes)"
        )
    m_vals = np.arange(M, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(np.arange(L), m_vals) / L  # (L, M)
    dft_fwd = np.concatenate([np.cos(ang) / L, -np.sin(ang) / L], axis=1)
    c_re = np.full(M, 2.0)
    c_re[0] = 1.0
    c_im = np.full(M, -2.0)
    c_im[0] = 0.0
    if M - 1 == L // 2 and L % 2 == 0:
        c_re[M - 1] = 1.0
        c_im[M - 1] = 0.0
    dft_inv = np.concatenate(
        [c_re[:, None] * np.cos(ang).T, c_im[:, None] * np.sin(ang).T],
        axis=0,
    )
    return dft_fwd, dft_inv


def _wls_inverse(S: np.ndarray, w: np.ndarray, mask_cols: np.ndarray) -> np.ndarray:
    """Weighted-least-squares left inverse of synthesis matrix S (J x N).

    Returns A (N x J) with A @ S = I on the masked (valid) columns wherever
    the sampled basis has full rank; rank-deficient directions (e.g. m = 1 at
    truncation nlat-1 on pole-inclusive grids, where pole rows vanish) fall
    back to the minimum-norm solution via SVD pseudo-inverse. Invalid columns
    (n < m) produce zero rows.
    """
    Sm = S[:, mask_cols]
    sw = np.sqrt(w)[:, None]
    # A_valid = pinv(W^1/2 S) W^1/2: the minimum-norm WLS left inverse.
    A_valid = np.linalg.pinv(sw * Sm, rcond=1e-12) * np.sqrt(w)[None, :]
    A = np.zeros((S.shape[1], S.shape[0]))
    A[mask_cols, :] = A_valid
    return A


@dataclasses.dataclass(frozen=True)
class SphericalHarmonics:
    """Spectral transform engine for a fixed grid + triangular truncation.

    Create with :meth:`build`; all heavy precomputation happens there in
    float64 numpy, after which every method is pure jax and jit-safe.
    """

    grid: LatLonGrid
    truncation: int
    dtype: jnp.dtype
    # Matmul precision for the Legendre contractions. TPU lowers fp32
    # matmuls to reduced-precision bf16 MXU passes under the DEFAULT
    # precision, which costs 4 digits here: T170 fp32 round trips measure
    # 3.1e-3 relative (vs 2.5e-7 at 'highest') while 'highest' is not
    # measurably slower (3.30 vs 3.42 ms/round-trip on v5e -- the
    # transforms are memory-bound). 'highest' is therefore the default;
    # pass precision=None to trade accuracy for nothing.
    precision: object
    # Longitude-direction implementation: 'fft' (jnp.fft.rfft/irfft) or
    # 'matmul' (precomputed real DFT matrices). At barotropic scales
    # (nlon ~ 144) the TPU FFT lowers to a soup of small kernels that
    # costs more than the whole Legendre contraction; one (nlon, 2M)
    # matmul replaces it and fuses with neighboring ops. Numerics match
    # the FFT path to fp32 round-off (the tables are built in float64).
    fourier: str
    # DFT tables (None when fourier='fft'): forward (nlon, 2M) packs
    # [cos | -sin] columns; inverse (2M, nlon) packs the multiplicity-
    # weighted rows with irfft's Hermitian-input convention (imag parts
    # of the m=0 and Nyquist modes are dropped, as irfft does).
    dft_fwd: jax.Array | None
    dft_inv: jax.Array | None
    # Hemisphere-parity fold (fold=True): associated Legendre functions
    # satisfy P(m, n, -mu) = (-1)^(n+m) P(m, n, mu), so on an
    # equatorially symmetric grid the scalar transforms decompose into
    # symmetric/antisymmetric halves over HALF the latitude rows and
    # HALF the degrees each -- 2x fewer contraction FLOPs and table
    # bytes. Tables are packed per m over the n's of matching parity
    # (n = 2k + m%2 for the symmetric class); ``None`` unless enabled.
    # Measured guidance (v5e, BASELINE.md): +66% on T170 single-field
    # round trips; a wash at T72 (the packed degree count no longer
    # clears the 128-lane tile) and under field/ensemble batching (the
    # MXU is already full). Opt in for T >= ~150 single-field pipelines.
    fold: bool
    # {name: (sym, anti, p)}: parity-packed north-half tables for each
    # base table (synthesis "P"/"G"/"H" as (M, h, K); analysis "A"/
    # "AuPsi"/"AvPsi"/"AuChi"/"AvChi" as (M, K, h)). ``p`` is the parity
    # offset: entries with (n + m + p) even are latitude-symmetric
    # (p = 0 for P/G-type tables, 1 for H-type, whose mu-derivative
    # flips parity).
    fold_tabs: dict | None
    even_m: jax.Array | None  # (M, 1) bool: class <-> n-parity selector
    # Device-resident constant tables (all shaped [m, j, n] or [m, n]):
    P: jax.Array  # synthesis table
    A: jax.Array  # scalar analysis (WLS left inverse), [m, n, j]
    G: jax.Array  # P / cos(lat)
    H: jax.Array  # cos(lat) * dP/dmu
    AuPsi: jax.Array  # vector analysis tables [m, n, j] (real parts; see below)
    AvPsi: jax.Array
    AuChi: jax.Array
    AvChi: jax.Array
    n_total: jax.Array  # [m, n] float degree
    mask: jax.Array  # [m, n] {0,1}
    m_vals: jax.Array  # [m] float zonal wavenumber
    laplacian_eig: jax.Array  # [m, n] = -n(n+1)/a^2 (0 where invalid)
    inv_laplacian_eig: jax.Array  # [m, n] = -a^2/(n(n+1)), 0 at n=0/invalid

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        grid: LatLonGrid,
        truncation: int | None = None,
        dtype=jnp.float32,
        precision="highest",
        fourier: str = "fft",
        fold: bool = False,
    ) -> "SphericalHarmonics":
        if fourier not in ("fft", "matmul"):
            raise ValueError("fourier must be 'fft' or 'matmul'")
        if truncation is None:
            truncation = grid.nlon // 3  # reference model.py:46 suggestion
        T = int(truncation)
        if T + 1 > grid.nlat:
            raise ValueError(
                f"truncation {T} needs at least {T + 1} latitudes, grid has {grid.nlat}"
            )
        if T > grid.nlon // 2:
            raise ValueError(
                f"truncation {T} exceeds the one-sided zonal spectrum of "
                f"nlon={grid.nlon} (max m = {grid.nlon // 2})"
            )
        tab = legendre_tables(T, grid.mu)
        J = grid.nlat
        N = M = T + 1
        w = grid.quad_weights.astype(np.float64)
        if grid.grid_type == "custom" or not np.any(w):
            # No quadrature rule: fall back to uniform weights for the WLS
            # projection (still an exact left inverse).
            w = np.full(J, 2.0 / J)

        a = grid.radius
        mask = tab.mask
        # Scalar analysis: per-m WLS inverse of P[m].
        A = np.zeros((M, N, J))
        for m in range(M):
            A[m] = _wls_inverse(tab.P[m], w, mask[m])

        # Vector analysis: per-m WLS inverse of the joint (u, v) synthesis.
        # Synthesis (unknowns psi_n, chi_n; n >= max(m, 1)):
        #   u_m(j) = (1/a) [ -sum_n psi_n H[m,j,n] + i m sum_n chi_n G[m,j,n] ]
        #   v_m(j) = (1/a) [ i m sum_n psi_n G[m,j,n] + sum_n chi_n H[m,j,n] ]
        # The WLS inverse has the block structure
        #   psi_n = sum_j Re(AuPsi)[n,j] u_j + i * Re(AvPsi/i)[n,j] v_j,  etc.
        # so we store four real tables and apply the i factors at runtime.
        AuPsi = np.zeros((M, N, J))
        AvPsi = np.zeros((M, N, J))
        AuChi = np.zeros((M, N, J))
        AvChi = np.zeros((M, N, J))
        for m in range(M):
            valid = mask[m].copy()
            valid[0] = False  # n = 0 carries no wind
            nv = int(valid.sum())
            if nv == 0:
                continue
            Hm = tab.H[m][:, valid]
            Gm = tab.G[m][:, valid]
            # Complex synthesis matrix [u; v] = Mm @ [psi; chi]
            Mm = np.zeros((2 * J, 2 * nv), dtype=np.complex128)
            Mm[:J, :nv] = -Hm / a
            Mm[:J, nv:] = 1j * m * Gm / a
            Mm[J:, :nv] = 1j * m * Gm / a
            Mm[J:, nv:] = Hm / a
            W2 = np.concatenate([w, w])
            sw2 = np.sqrt(W2)
            # Minimum-norm WLS inverse (rank-deficiency possible at pole-
            # inclusive grids near full truncation, as for scalars).
            Ainv = np.linalg.pinv(sw2[:, None] * Mm, rcond=1e-12) * sw2[None, :]
            # Block extraction; verify the expected real/imaginary structure.
            blk_pu = Ainv[:nv, :J]
            blk_pv = Ainv[:nv, J:]
            blk_cu = Ainv[nv:, :J]
            blk_cv = Ainv[nv:, J:]
            tol = 1e-8 * max(np.abs(Ainv).max(), 1e-300)
            assert np.abs(blk_pu.imag).max() < tol
            assert np.abs(blk_cv.imag).max() < tol
            assert np.abs(blk_pv.real).max() < tol
            assert np.abs(blk_cu.real).max() < tol
            AuPsi[m][valid, :] = blk_pu.real
            AvPsi[m][valid, :] = blk_pv.imag  # stored as x where block = i*x
            AuChi[m][valid, :] = blk_cu.imag
            AvChi[m][valid, :] = blk_cv.real

        n_tot = tab.n_total.astype(np.float64)
        lap = np.where(mask, -n_tot * (n_tot + 1.0) / a**2, 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_lap = np.where(
                mask & (n_tot > 0), -(a**2) / (n_tot * (n_tot + 1.0)), 0.0
            )
        m_vals = np.arange(M, dtype=np.float64)

        dft_fwd = dft_inv = None
        if fourier == "matmul":
            dft_fwd, dft_inv = dft_tables(grid.nlon, M)

        fold_tabs = even_m = None
        if fold:
            mu = np.asarray(grid.mu, np.float64)
            if not np.allclose(mu, -mu[::-1], atol=1e-12):
                raise ValueError(
                    "fold=True requires an equatorially symmetric grid"
                )
            h = (J + 1) // 2
            K = (N + 1) // 2

            def check_parity(t, p, j_axis, name):
                # Exactness guard: every base table must carry the
                # declared hemisphere-parity structure (the WLS inverses
                # inherit it on symmetric grids/weights -- the LS problem
                # decouples by parity), else the fold is invalid.
                scale = np.abs(t).max() or 1.0
                flipped = np.flip(t, axis=j_axis)
                for m in range(0, M, max(1, M // 4)):
                    for n in range(m, N):
                        idx = (m, slice(None), n) if j_axis == 1 else (m, n)
                        sgn = 1.0 if (n + m + p) % 2 == 0 else -1.0
                        if not np.allclose(
                            flipped[idx], sgn * t[idx], atol=1e-10 * scale
                        ):
                            raise ValueError(
                                f"{name} lacks hemisphere parity (p={p}); "
                                "fold=True is not valid on this grid"
                            )

            def pack_syn(t, p):
                # (M, J, N) -> north-half (M, h, K) sym/anti class pair.
                sym = np.zeros((M, h, K))
                anti = np.zeros((M, h, K))
                for m in range(M):
                    off = (m + p) % 2
                    for k in range(K):
                        if 2 * k + off < N:
                            sym[m, :, k] = t[m, :h, 2 * k + off]
                        if 2 * k + 1 - off < N:
                            anti[m, :, k] = t[m, :h, 2 * k + 1 - off]
                return sym, anti

            def pack_ana(t, p):
                # (M, N, J) -> north-half (M, K, h) sym/anti class pair.
                sym = np.zeros((M, K, h))
                anti = np.zeros((M, K, h))
                for m in range(M):
                    off = (m + p) % 2
                    for k in range(K):
                        if 2 * k + off < N:
                            sym[m, k, :] = t[m, 2 * k + off, :h]
                        if 2 * k + 1 - off < N:
                            anti[m, k, :] = t[m, 2 * k + 1 - off, :h]
                return sym, anti

            fold_tabs = {}
            # Synthesis-side: P and G are mu-even under (n+m) parity
            # (p=0); H = cos * dP/dmu flips (p=1).
            for name, t, p in (("P", tab.P, 0), ("G", tab.G, 0),
                               ("H", tab.H, 1)):
                check_parity(t, p, 1, name)
                fold_tabs[name] = (*pack_syn(t, p), p)
            # Analysis-side: A and the psi/chi wind inverses inherit the
            # parity of the synthesis block they invert.
            for name, t, p in (("A", A, 0), ("AuPsi", AuPsi, 1),
                               ("AvPsi", AvPsi, 0), ("AuChi", AuChi, 0),
                               ("AvChi", AvChi, 1)):
                check_parity(t, p, 2, name)
                fold_tabs[name] = (*pack_ana(t, p), p)

        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            grid=grid,
            truncation=T,
            dtype=jnp.dtype(dtype),
            precision=precision,
            fourier=fourier,
            dft_fwd=None if dft_fwd is None else f(dft_fwd),
            dft_inv=None if dft_inv is None else f(dft_inv),
            fold=bool(fold),
            fold_tabs=None if fold_tabs is None else {
                k: (f(s), f(a), p) for k, (s, a, p) in fold_tabs.items()
            },
            even_m=None if not fold else jnp.asarray(
                (np.arange(M) % 2 == 0)[:, None]
            ),
            P=f(tab.P),
            A=f(A),
            G=f(tab.G),
            H=f(tab.H),
            AuPsi=f(AuPsi),
            AvPsi=f(AvPsi),
            AuChi=f(AuChi),
            AvChi=f(AvChi),
            n_total=f(n_tot),
            mask=f(mask.astype(np.float64)),
            m_vals=f(m_vals),
            laplacian_eig=f(lap),
            inv_laplacian_eig=f(inv_lap),
        )

    # -------------------------------------------------------------- internals
    @property
    def cdtype(self):
        return jnp.complex128 if self.dtype == jnp.float64 else jnp.complex64

    @property
    def nspec(self) -> int:
        """Packed coefficient count, pyspharm-compatible: (T+1)(T+2)/2."""
        T = self.truncation
        return (T + 1) * (T + 2) // 2

    def _fourier(self, field: jax.Array) -> jax.Array:
        """Real grid (..., J, nlon) -> one-sided Fourier modes (..., m, J)."""
        if self.fourier == "matmul":
            M = self.truncation + 1
            both = jnp.einsum(
                "...jl,lk->...kj", field, self.dft_fwd,
                preferred_element_type=self.dtype, precision=self.precision,
            )  # (..., 2M, J)
            return jax.lax.complex(both[..., :M, :], both[..., M:, :])
        F = jnp.fft.rfft(field, axis=-1) / self.grid.nlon
        F = F[..., : self.truncation + 1]  # (..., J, M)
        return jnp.swapaxes(F, -1, -2)  # (..., M, J)

    def _inv_fourier(self, Fm: jax.Array) -> jax.Array:
        """One-sided Fourier modes (..., m, J) -> real grid (..., J, nlon)."""
        if self.fourier == "matmul":
            stacked = jnp.concatenate(
                [Fm.real, Fm.imag], axis=-2
            ).astype(self.dtype)  # (..., 2M, J)
            return jnp.einsum(
                "...kj,kl->...jl", stacked, self.dft_inv,
                preferred_element_type=self.dtype, precision=self.precision,
            )
        F = jnp.swapaxes(Fm, -1, -2)  # (..., J, M)
        nfreq = self.grid.nlon // 2 + 1
        pad = [(0, 0)] * (F.ndim - 1) + [(0, nfreq - F.shape[-1])]
        F = jnp.pad(F, pad)
        return jnp.fft.irfft(F * self.grid.nlon, n=self.grid.nlon, axis=-1)

    def _legendre_syn(self, table: jax.Array, spec: jax.Array) -> jax.Array:
        """(..., m, n) coeffs -> (..., m, j) Fourier modes via real table.

        The table is real, so the complex contraction decomposes exactly
        into independent real contractions on Re/Im -- stacked into one
        batched matmul (2x fewer real matmuls than XLA's generic complex
        product, and better MXU utilization from the doubled batch).
        """
        if not jnp.iscomplexobj(spec):
            return jnp.einsum(
                "mjn,...mn->...mj", table, spec,
                preferred_element_type=self.dtype, precision=self.precision,
            )
        ri = jnp.stack([spec.real, spec.imag])  # (2, ..., m, n)
        out = jnp.einsum(
            "mjn,k...mn->k...mj", table, ri.astype(self.dtype),
            preferred_element_type=self.dtype, precision=self.precision,
        )
        return jax.lax.complex(out[0], out[1])

    def _legendre_ana(self, table: jax.Array, Fm: jax.Array) -> jax.Array:
        """(..., m, j) Fourier modes -> (..., m, n) coeffs via real table."""
        if not jnp.iscomplexobj(Fm):
            return jnp.einsum(
                "mnj,...mj->...mn", table, Fm,
                preferred_element_type=self.dtype, precision=self.precision,
            )
        ri = jnp.stack([Fm.real, Fm.imag])
        out = jnp.einsum(
            "mnj,k...mj->k...mn", table, ri.astype(self.dtype),
            preferred_element_type=self.dtype, precision=self.precision,
        )
        return jax.lax.complex(out[0], out[1])

    # ----------------------------------------------- hemisphere-parity fold
    def _fold_rows(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """(..., J) latitude rows -> (sym, anti) half-row combinations.

        The equator row (odd J) enters the symmetric part once and the
        antisymmetric part as zero.
        """
        J = self.grid.nlat
        h = (J + 1) // 2
        north = x[..., :h]
        tail = jnp.flip(x[..., h:], axis=-1)
        if J % 2 == 1:
            pad = [(0, 0)] * (tail.ndim - 1) + [(0, 1)]
            tail = jnp.pad(tail, pad)
        return north + tail, north - tail

    def _unfold_rows(self, e: jax.Array, o: jax.Array) -> jax.Array:
        """(sym, anti) half rows -> full (..., J) latitude rows."""
        J = self.grid.nlat
        h = (J + 1) // 2
        south = jnp.flip((e - o)[..., : J - h], axis=-1)
        return jnp.concatenate([e + o, south], axis=-1)

    def _sym_selector(self, p: int) -> jax.Array:
        """(M, 1) bool: does the SYMMETRIC class occupy even-n slots?"""
        return self.even_m if p == 0 else ~self.even_m

    def _legendre_syn_folded(self, name: str, spec: jax.Array,
                             tabs=None, even_m=None) -> jax.Array:
        """Folded synthesis through packed table ``name``:
        (..., m, n) complex -> (..., m, J) complex modes.

        ``tabs``/``even_m`` override the full-m table entry with an m-band
        slice (the sharded engine's per-device Legendre stage sees all J
        but only its local wavenumbers).
        """
        N = self.truncation + 1
        K = (N + 1) // 2
        Tsym, Tanti, p = self.fold_tabs[name] if tabs is None else tabs
        em = self.even_m if even_m is None else even_m
        ri = jnp.stack([spec.real, spec.imag]).astype(self.dtype)
        xe = ri[..., 0::2]  # n even, width K
        xo = ri[..., 1::2]  # n odd, width N - K
        if xo.shape[-1] < K:
            pad = [(0, 0)] * (xo.ndim - 1) + [(0, K - xo.shape[-1])]
            xo = jnp.pad(xo, pad)
        sel = em if p == 0 else ~em
        xs = jnp.where(sel, xe, xo)
        xa = jnp.where(sel, xo, xe)
        e = jnp.einsum(
            "mjk,z...mk->z...mj", Tsym, xs,
            preferred_element_type=self.dtype, precision=self.precision,
        )
        o = jnp.einsum(
            "mjk,z...mk->z...mj", Tanti, xa,
            preferred_element_type=self.dtype, precision=self.precision,
        )
        out = self._unfold_rows(e, o)
        return jax.lax.complex(out[0], out[1])

    def _legendre_ana_folded(self, name: str, Fm: jax.Array,
                             tabs=None, even_m=None) -> jax.Array:
        """Folded analysis through packed table ``name``:
        (..., m, J) modes -> (..., m, n) complex. ``tabs``/``even_m`` as in
        :meth:`_legendre_syn_folded`."""
        N = self.truncation + 1
        K = (N + 1) // 2
        Tsym, Tanti, p = self.fold_tabs[name] if tabs is None else tabs
        em = self.even_m if even_m is None else even_m
        ri = jnp.stack([Fm.real, Fm.imag]).astype(self.dtype)
        Fs, Fa = self._fold_rows(ri)
        xs = jnp.einsum(
            "mkj,z...mj->z...mk", Tsym, Fs,
            preferred_element_type=self.dtype, precision=self.precision,
        )
        xa = jnp.einsum(
            "mkj,z...mj->z...mk", Tanti, Fa,
            preferred_element_type=self.dtype, precision=self.precision,
        )
        # Interleave the parity classes back into dense n.
        sel = em if p == 0 else ~em
        evens = jnp.where(sel, xs, xa)            # n = 0, 2, ...
        odds = jnp.where(sel, xa, xs)[..., : N - K]  # n = 1, 3, ...
        out = jnp.zeros(xs.shape[:-1] + (N,), dtype=self.dtype)
        out = out.at[..., 0::2].set(evens).at[..., 1::2].set(odds)
        return jax.lax.complex(out[0], out[1])

    # ------------------------------------------------------------- public API
    def analyze(self, field: jax.Array) -> jax.Array:
        """Grid (..., nlat, nlon) -> spectral (..., T+1, T+1) complex.

        Mirrors ``TransformsEngine.grid_to_spec`` (pyspharm_transforms.py:85).
        """
        Fm = self._fourier(field.astype(self.dtype))
        if self.fold:
            return self._legendre_ana_folded("A", Fm)
        return self._legendre_ana(self.A, Fm)

    def synthesize(self, spec: jax.Array) -> jax.Array:
        """Spectral (..., T+1, T+1) -> grid (..., nlat, nlon) real.

        Mirrors ``TransformsEngine.spec_to_grid`` (pyspharm_transforms.py:72).
        """
        if self.fold:
            return self._inv_fourier(
                self._legendre_syn_folded("P", spec.astype(self.cdtype))
            )
        Fm = self._legendre_syn(self.P, spec.astype(self.cdtype))
        return self._inv_fourier(Fm)

    def laplacian_spec(self, spec: jax.Array) -> jax.Array:
        """Spectral Laplacian: multiply by -n(n+1)/a^2."""
        return spec * self.laplacian_eig

    def inverse_laplacian_spec(self, spec: jax.Array) -> jax.Array:
        """Spectral inverse Laplacian (n = 0 mode annihilated)."""
        return spec * self.inv_laplacian_eig

    def laplacian(self, field: jax.Array) -> jax.Array:
        """Grid-space spherical Laplacian diagnostic.

        The standalone batched Laplacian the reference examples build from the
        spharm engine (``examples/plot_movie.py:128-135``).
        """
        return self.synthesize(self.laplacian_spec(self.analyze(field)))

    def gradients(self, spec: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Zonal and meridional gradient grids of a spectral field.

        Mirrors ``TransformsEngine.grad_of_spec`` (pyspharm_transforms.py:99):
        returns (df/dx, df/dy) = ((1/(a cos lat)) df/dlon, (1/a) df/dlat),
        evaluated pole-regularly via the G and H tables.
        """
        spec = spec.astype(self.cdtype)
        a = self.grid.radius
        im = (1j * self.m_vals / a).astype(self.cdtype)  # [m]
        if self.fold:
            dx_m = im[:, None] * self._legendre_syn_folded("G", spec)
            dy_m = self._legendre_syn_folded("H", spec) / a
            return self._inv_fourier(dx_m), self._inv_fourier(dy_m)
        # One contraction against the [G; H] stacked table (j-axis concat)
        # instead of two -- a single larger MXU matmul.
        J = self.grid.nlat
        GH = jnp.concatenate([self.G, self.H], axis=1)  # (m, 2J, n)
        both = self._legendre_syn(GH, spec)
        dx_m = im[:, None] * both[..., :J]
        dy_m = both[..., J:] / a
        return self._inv_fourier(dx_m), self._inv_fourier(dy_m)

    def uv_from_vrtdiv(
        self, vrt_spec: jax.Array, div_spec: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Grid winds (u, v) from spectral vorticity and divergence.

        Mirrors ``TransformsEngine.uv_grid_from_vrtdiv_spec``
        (pyspharm_transforms.py:59): Helmholtz synthesis u = k x grad(psi) +
        grad(chi) with psi = inv_lap(vrt), chi = inv_lap(div).
        """
        psi = (vrt_spec * self.inv_laplacian_eig).astype(self.cdtype)
        chi = (div_spec * self.inv_laplacian_eig).astype(self.cdtype)
        a = self.grid.radius
        im = (1j * self.m_vals / a).astype(self.cdtype)
        if self.fold:
            both_H = self._legendre_syn_folded("H", jnp.stack([psi, chi]))
            both_G = self._legendre_syn_folded("G", jnp.stack([psi, chi]))
            u_m = -both_H[0] / a + im[:, None] * both_G[1]
            v_m = im[:, None] * both_G[0] + both_H[1] / a
            return self._inv_fourier(u_m), self._inv_fourier(v_m)
        # Single contraction: stack (psi, chi) into a leading batch and [H; G]
        # along the j axis -- 1 einsum replaces 4 (4x larger MXU matmul).
        J = self.grid.nlat
        HG = jnp.concatenate([self.H, self.G], axis=1)  # (m, 2J, n)
        both = self._legendre_syn(HG, jnp.stack([psi, chi]))
        psi_H, psi_G = both[0][..., :J], both[0][..., J:]
        chi_H, chi_G = both[1][..., :J], both[1][..., J:]
        u_m = -psi_H / a + im[:, None] * chi_G
        v_m = im[:, None] * psi_G + chi_H / a
        return self._inv_fourier(u_m), self._inv_fourier(v_m)

    def vrtdiv_from_uv(
        self, u: jax.Array, v: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Spectral vorticity and divergence from grid winds.

        Mirrors ``TransformsEngine.vrtdiv_spec_from_uv_grid``
        (pyspharm_transforms.py:47). Uses the precomputed WLS inverse of the
        joint (u, v) synthesis, so uv_from_vrtdiv ∘ vrtdiv_from_uv == identity
        on band-limited winds for any latitude grid.
        """
        u_m = self._fourier(u.astype(self.dtype))
        v_m = self._fourier(v.astype(self.dtype))
        if self.fold:
            psi = (self._legendre_ana_folded("AuPsi", u_m)
                   + 1j * self._legendre_ana_folded("AvPsi", v_m))
            chi = (1j * self._legendre_ana_folded("AuChi", u_m)
                   + self._legendre_ana_folded("AvChi", v_m))
            return psi * self.laplacian_eig, chi * self.laplacian_eig
        # Single contraction: stack (u, v) into a leading batch with the four
        # analysis tables concatenated pairwise along the n axis.
        N = self.truncation + 1
        Au = jnp.concatenate([self.AuPsi, self.AuChi], axis=1)  # (m, 2N, j)
        Av = jnp.concatenate([self.AvPsi, self.AvChi], axis=1)
        both_u = self._legendre_ana(Au, u_m)
        both_v = self._legendre_ana(Av, v_m)
        psi = both_u[..., :N] + 1j * both_v[..., :N]
        chi = 1j * both_u[..., N:] + both_v[..., N:]
        vrt = psi * self.laplacian_eig
        div = chi * self.laplacian_eig
        return vrt, div

    def mu_multiplier_operator(self, values_on_lat: np.ndarray) -> jax.Array:
        """Spectral operator equivalent to synthesize -> multiply by a
        latitude-only field -> analyze.

        Because the engine's transforms are linear and a lat-only multiplier
        is diagonal in both longitude and latitude samples, the grid-space
        round trip collapses per m to the dense matrix
        ``M[m] = A[m] @ diag(v) @ P[m]`` -- bit-identical semantics with no
        FFTs and a single m-batched contraction. Used e.g. to fuse the
        barotropic psi-model's hemisphere sign correction
        (reference model.py:298-301) into the spectral update.

        Returns: (M, N, N) real table; apply with
        ``apply_mu_multiplier(op, spec)``.
        """
        v = np.asarray(values_on_lat, dtype=np.float64)
        P = np.asarray(self.P, dtype=np.float64)
        A = np.asarray(self.A, dtype=np.float64)
        M = np.einsum("mnj,j,mjk->mnk", A, v, P)
        return jnp.asarray(M, dtype=self.dtype)

    def apply_mu_multiplier(self, op: jax.Array, spec: jax.Array) -> jax.Array:
        """Apply a mu_multiplier_operator table: (..., m, n) -> (..., m, n)."""
        spec = spec.astype(self.cdtype)
        ri = jnp.stack([spec.real, spec.imag])
        out = jnp.einsum(
            "mnk,h...mk->h...mn", op, ri.astype(self.dtype),
            preferred_element_type=self.dtype, precision=self.precision,
        )
        return jax.lax.complex(out[0], out[1])

    # ------------------------------------------------- pyspharm-compat extras
    @property
    def wavenumbers(self) -> tuple[np.ndarray, np.ndarray]:
        """Packed (m, n-m) index arrays, ordering-compatible with pyspharm's
        ``getspecindx`` as used by the reference (``model.py:69-71``):
        reference code computes total degree as m + (second array)."""
        T = self.truncation
        ms, nmm = [], []
        for m in range(T + 1):
            for n in range(m, T + 1):
                ms.append(m)
                nmm.append(n - m)
        return np.array(ms), np.array(nmm)

    def pack(self, spec: jax.Array) -> jax.Array:
        """Dense (..., m, n) -> packed (..., nspec) pyspharm ordering."""
        T = self.truncation
        idx_m, idx_nmm = self.wavenumbers
        return spec[..., idx_m, idx_m + idx_nmm]

    def unpack(self, packed: jax.Array) -> jax.Array:
        """Packed (..., nspec) -> dense (..., m, n)."""
        T = self.truncation
        idx_m, idx_nmm = self.wavenumbers
        dense = jnp.zeros(packed.shape[:-1] + (T + 1, T + 1), dtype=packed.dtype)
        return dense.at[..., idx_m, idx_m + idx_nmm].set(packed)
