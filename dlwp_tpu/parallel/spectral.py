"""Sharded spherical-harmonic transforms (spectral parallelism).

Scaling story for the spectral core (SURVEY.md sections 2.5, 5.7): grid
fields are sharded in latitude bands over the ``lat`` mesh axis; spectral
coefficients are sharded in zonal-wavenumber (m) bands over the same axis.
Between the two lives an **all-to-all transpose** (``lax.all_to_all``) --
each device trades its (all m, local lat) Fourier modes for (local m, all
lat), contracts its m-band against its slice of the Legendre tables (full
MXU locality, no ragged work), and the inverse path mirrors it. This is the
same collective shape as Ulysses-style sequence-parallel head scatter.

Layout requirements: nlat and T+1 must both divide by the ``lat`` axis size
(pad the truncation up if needed -- extra m rows have zero tables and are
inert). Longitude is never sharded: the FFT stays local.

Each public method is a standalone jit-able sharded op; the ``local_*``
functions are composable inside a single enclosing ``shard_map`` (used by
the sharded barotropic step to fuse a whole model step into one region).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dlwp_tpu.spectral.transforms import SphericalHarmonics


def _mslice(table: jax.Array, axis_name: str, m_per: int) -> jax.Array:
    """This shard's m-band slice of a replicated [m, ...] table."""
    i = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(table, i * m_per, m_per, axis=0)


class ShardedSphericalHarmonics:
    """Spectral engine over a (data, lat) mesh.

    Grid arrays: (..., nlat, nlon) with nlat sharded over 'lat'.
    Spectral arrays: (..., T+1, T+1) [m, n] with m sharded over 'lat'.
    Results are numerically identical to the single-device engine.
    """

    def __init__(self, sh: SphericalHarmonics, mesh: Mesh,
                 lat_axis_name: str = "lat"):
        self.sh = sh
        self.mesh = mesh
        self.axis = lat_axis_name
        n_shards = mesh.shape[lat_axis_name]
        M = sh.truncation + 1
        J = sh.grid.nlat
        if M % n_shards or J % n_shards:
            raise ValueError(
                f"T+1 ({M}) and nlat ({J}) must divide the '{lat_axis_name}'"
                f" axis size ({n_shards})"
            )
        self.n_shards = n_shards
        self.m_per = M // n_shards
        self.j_per = J // n_shards

    # ------------------------------------------------------- local building
    def local_fourier(self, x_local: jax.Array) -> jax.Array:
        """Local grid block -> (.., m_all, j_local) one-sided Fourier.

        Delegates to the engine's longitude stage: the FFT (and the
        ``fourier='matmul'`` DFT-matrix alternative) contract over the
        unsharded longitude axis, so they apply to any latitude-band
        block unchanged."""
        return self.sh._fourier(x_local.astype(self.sh.dtype))

    def local_inv_fourier(self, Fm_local: jax.Array) -> jax.Array:
        return self.sh._inv_fourier(Fm_local)

    def _fold_args(self, name: str):
        """This shard's m-band slice of a packed hemisphere-parity table."""
        Tsym, Tanti, p = self.sh.fold_tabs[name]
        tabs = (
            _mslice(Tsym, self.axis, self.m_per),
            _mslice(Tanti, self.axis, self.m_per),
            p,
        )
        return tabs, _mslice(self.sh.even_m, self.axis, self.m_per)

    def _transpose_to_spec(self, F: jax.Array) -> jax.Array:
        """(.., m_all, j_local) -> (.., m_local, j_all) all-to-all."""
        return lax.all_to_all(
            F, self.axis, split_axis=F.ndim - 2, concat_axis=F.ndim - 1,
            tiled=True,
        )

    def _transpose_to_grid(self, F: jax.Array) -> jax.Array:
        """(.., m_local, j_all) -> (.., m_all, j_local) all-to-all."""
        return lax.all_to_all(
            F, self.axis, split_axis=F.ndim - 1, concat_axis=F.ndim - 2,
            tiled=True,
        )

    def local_analyze(self, x_local: jax.Array) -> jax.Array:
        F = self.local_fourier(x_local)
        F = self._transpose_to_spec(F)  # (.., m_local, j_all)
        # The Legendre stage sees all J rows but only this shard's m band,
        # so the engine's folded (hemisphere-parity) contraction applies
        # with m-sliced packed tables.
        if self.sh.fold:
            tabs, em = self._fold_args("A")
            return self.sh._legendre_ana_folded("A", F, tabs=tabs, even_m=em)
        A = _mslice(self.sh.A, self.axis, self.m_per)
        # precision must match the single-device engine: TPU lowers fp32
        # matmuls to bf16 MXU passes at DEFAULT precision (costs ~4 digits;
        # see SphericalHarmonics.precision) and the CPU-mesh tests that
        # validate this path structurally cannot detect the difference.
        return jnp.einsum(
            "mnj,...mj->...mn", A, F,
            preferred_element_type=self.sh.cdtype,
            precision=self.sh.precision,
        )

    def local_synthesize(self, spec_local: jax.Array) -> jax.Array:
        if self.sh.fold:
            tabs, em = self._fold_args("P")
            F = self.sh._legendre_syn_folded(
                "P", spec_local.astype(self.sh.cdtype), tabs=tabs, even_m=em
            )
        else:
            Ptab = _mslice(self.sh.P, self.axis, self.m_per)
            F = jnp.einsum(
                "mjn,...mn->...mj", Ptab, spec_local.astype(self.sh.cdtype),
                preferred_element_type=self.sh.cdtype,
                precision=self.sh.precision,
            )
        F = self._transpose_to_grid(F)  # (.., m_all, j_local)
        return self.local_inv_fourier(F)

    def _syn(self, name: str, spec: jax.Array) -> jax.Array:
        """m-band Legendre synthesis through table ``name`` (dense or
        folded, matching the engine's configuration)."""
        if self.sh.fold:
            tabs, em = self._fold_args(name)
            return self.sh._legendre_syn_folded(
                name, spec, tabs=tabs, even_m=em
            )
        tab = _mslice(getattr(self.sh, name), self.axis, self.m_per)
        return jnp.einsum(
            "mjn,...mn->...mj", tab, spec,
            preferred_element_type=self.sh.cdtype,
            precision=self.sh.precision,
        )

    def _ana(self, name: str, Fm: jax.Array) -> jax.Array:
        if self.sh.fold:
            tabs, em = self._fold_args(name)
            return self.sh._legendre_ana_folded(
                name, Fm, tabs=tabs, even_m=em
            )
        tab = _mslice(getattr(self.sh, name), self.axis, self.m_per)
        return jnp.einsum(
            "mnj,...mj->...mn", tab, Fm,
            preferred_element_type=self.sh.cdtype,
            precision=self.sh.precision,
        )

    def local_uv_from_vrtdiv(self, vrt_local, div_local):
        inv = _mslice(self.sh.inv_laplacian_eig, self.axis, self.m_per)
        psi = (vrt_local * inv).astype(self.sh.cdtype)
        chi = (div_local * inv).astype(self.sh.cdtype)
        a = self.sh.grid.radius
        i0 = lax.axis_index(self.axis) * self.m_per
        m_vals = i0 + jnp.arange(self.m_per, dtype=self.sh.dtype)
        im = (1j * m_vals / a).astype(self.sh.cdtype)
        u_m = -self._syn("H", psi) / a + im[:, None] * self._syn("G", chi)
        v_m = im[:, None] * self._syn("G", psi) + self._syn("H", chi) / a
        u = self.local_inv_fourier(self._transpose_to_grid(u_m))
        v = self.local_inv_fourier(self._transpose_to_grid(v_m))
        return u, v

    def local_vrtdiv_from_uv(self, u_local, v_local):
        u_m = self._transpose_to_spec(self.local_fourier(u_local))
        v_m = self._transpose_to_spec(self.local_fourier(v_local))
        psi = self._ana("AuPsi", u_m) + 1j * self._ana("AvPsi", v_m)
        chi = 1j * self._ana("AuChi", u_m) + self._ana("AvChi", v_m)
        lap = _mslice(self.sh.laplacian_eig, self.axis, self.m_per)
        return psi * lap, chi * lap

    # ----------------------------------------------------------- public API
    def analyze(self, field: jax.Array) -> jax.Array:
        ndim = field.ndim
        gspec = P(*([None] * (ndim - 2)), self.axis, None)
        sspec = P(*([None] * (ndim - 2)), self.axis, None)
        return jax.jit(
            jax.shard_map(
                self.local_analyze, mesh=self.mesh,
                in_specs=(gspec,), out_specs=sspec,
            )
        )(field)

    def synthesize(self, spec: jax.Array) -> jax.Array:
        ndim = spec.ndim
        sspec = P(*([None] * (ndim - 2)), self.axis, None)
        return jax.jit(
            jax.shard_map(
                self.local_synthesize, mesh=self.mesh,
                in_specs=(sspec,), out_specs=sspec,
            )
        )(spec)

    def uv_from_vrtdiv(self, vrt, div):
        ndim = vrt.ndim
        sspec = P(*([None] * (ndim - 2)), self.axis, None)
        return jax.jit(
            jax.shard_map(
                self.local_uv_from_vrtdiv, mesh=self.mesh,
                in_specs=(sspec, sspec), out_specs=(sspec, sspec),
            )
        )(vrt, div)

    def vrtdiv_from_uv(self, u, v):
        ndim = u.ndim
        gspec = P(*([None] * (ndim - 2)), self.axis, None)
        return jax.jit(
            jax.shard_map(
                self.local_vrtdiv_from_uv, mesh=self.mesh,
                in_specs=(gspec, gspec), out_specs=(gspec, gspec),
            )
        )(u, v)
