"""Domain-decomposed barotropic dynamical core.

Runs the barotropic vorticity step under latitude-band (grid) / m-band
(spectral) sharding: the entire step -- spectral synthesis of winds and
vorticity, grid-space tendency products, vector analysis, implicit damping,
Robert-filtered leapfrog -- composes the ``local_*`` ops of
:class:`~dlwp_tpu.parallel.spectral.ShardedSphericalHarmonics` inside a
single ``shard_map`` region, so XLA schedules the two all-to-all transposes
per transform against local compute without materializing replicated
intermediates.

This is the scaling story for the physics core (SURVEY.md section 2.5
"spectral parallelism"): state lives m-sharded in HBM across the ``lat``
mesh axis; each device owns T+1 / n_shards zonal wavenumbers and
nlat / n_shards grid rows.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlwp_tpu.barotropic.model import BarotropicModel, BarotropicState
from dlwp_tpu.parallel.spectral import ShardedSphericalHarmonics, _mslice


class ShardedBarotropicModel(BarotropicModel):
    """Vorticity-form core with the step sharded over the 'lat' mesh axis.

    Same constructor and state/trajectory semantics as
    :class:`BarotropicModel` (bitwise-equal tendencies up to float
    reassociation); adds ``run_sharded`` / ``step_sharded`` operating on
    m-sharded spectral state.
    """

    def __init__(self, *args, mesh: Mesh, lat_axis_name: str = "lat",
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self.axis = lat_axis_name
        self.ssh = ShardedSphericalHarmonics(self.sh, mesh, lat_axis_name)

    # ---------------------------------------------------------------- local
    def _local_tendency(self, vrt_spec_local: jax.Array) -> jax.Array:
        """Tendency on m-sharded state (inside shard_map), using the fused
        stacked synthesis table (same algebra as the single-device
        BarotropicModel._tendency, sliced to this shard's m band)."""
        ssh = self.ssh
        sh = self.sh
        J = self.grid.nlat
        inv = _mslice(sh.inv_laplacian_eig, self.axis, ssh.m_per)
        psi = (vrt_spec_local * inv).astype(sh.cdtype)
        n0 = vrt_spec_local[..., :, 0:1].astype(sh.cdtype)
        table = _mslice(self._syn_table, self.axis, ssh.m_per)
        ri = jnp.stack([psi.real, psi.imag])
        modes_ri = jnp.einsum(
            "mjn,k...mn->k...mj", table, ri.astype(sh.dtype),
            preferred_element_type=sh.dtype,
            precision=sh.precision,
        )
        modes = jax.lax.complex(modes_ri[0], modes_ri[1])
        P0 = _mslice(sh.P[:, :, 0:1], self.axis, ssh.m_per)
        n0_ri = jnp.stack([n0.real, n0.imag])
        n0_modes_ri = jnp.einsum(
            "mjn,k...mn->k...mj", P0, n0_ri.astype(sh.dtype),
            preferred_element_type=sh.dtype,
            precision=sh.precision,
        )
        n0_modes = jax.lax.complex(n0_modes_ri[0], n0_modes_ri[1])
        i0 = jax.lax.axis_index(self.axis) * ssh.m_per
        m_vals = i0 + jnp.arange(ssh.m_per, dtype=sh.dtype)
        im = (1j * m_vals).astype(sh.cdtype)[:, None]
        stacked = jnp.stack([
            modes[..., :J] + n0_modes,  # vrt
            modes[..., J : 2 * J],  # u
            im * modes[..., 2 * J :],  # v
        ])
        grids = ssh.local_inv_fourier(ssh._transpose_to_grid(stacked))
        vrt, u, v = grids[0], grids[1], grids[2]
        # Local latitude rows of the Coriolis parameter.
        i = jax.lax.axis_index(self.axis)
        f_loc = jax.lax.dynamic_slice_in_dim(
            self.f_grid, i * ssh.j_per, ssh.j_per, axis=0
        )
        abs_vrt = f_loc + vrt
        dudt = -abs_vrt * v
        dvdt = abs_vrt * u
        dzdt, _ = ssh.local_vrtdiv_from_uv(dudt, dvdt)
        return dzdt

    def _local_step(self, vrt_local, prev_local, step):
        """Full Robert/leapfrog step on m-sharded state."""
        r = self.robert_coefficient
        damping = _mslice(self.damping, self.axis, self.ssh.m_per)
        dzdt = self._local_tendency(vrt_local)
        dzdt = (dzdt - damping * prev_local) / (1.0 + damping * self.dt)

        def first(_):
            new = vrt_local + self.dt * dzdt
            return new, vrt_local + r * (new - vrt_local)

        def leapfrog(_):
            cur = vrt_local + r * (prev_local - 2.0 * vrt_local)
            new = prev_local + 2.0 * self.dt * dzdt
            return new, cur + r * new

        return jax.lax.cond(step == 0, first, leapfrog, None)

    # ----------------------------------------------------------------- API
    def spec_sharding(self, ndim: int = 2) -> NamedSharding:
        """NamedSharding for (..., m, n) spectral state (m over 'lat')."""
        return NamedSharding(
            self.mesh, P(*([None] * (ndim - 2)), self.axis, None)
        )

    @partial(jax.jit, static_argnums=(0, 2))
    def run_sharded(self, state: BarotropicState, n_steps: int) -> BarotropicState:
        """Integrate with the step body inside one shard_map region."""
        ndim = state.vrt_spec.ndim
        sspec = P(*([None] * (ndim - 2)), self.axis, None)

        def local_scan(vrt_local, prev_local, step0):
            def body(carry, _):
                vrt, prev, step = carry
                new, filt = self._local_step(vrt, prev, step)
                return (new, filt, step + 1), None

            (vrt, prev, step), _ = jax.lax.scan(
                body, (vrt_local, prev_local, step0), None, length=n_steps
            )
            return vrt, prev, step

        vrt, prev, step = jax.shard_map(
            local_scan,
            mesh=self.mesh,
            in_specs=(sspec, sspec, P()),
            out_specs=(sspec, sspec, P()),
            check_vma=False,
        )(state.vrt_spec, state.vrt_spec_prev, state.step)
        return BarotropicState(
            vrt_spec=vrt,
            vrt_spec_prev=prev,
            step=step,
            t=state.t + n_steps * self.dt,
        )
