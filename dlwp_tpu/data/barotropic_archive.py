"""Barotropic-generated training archives: chaotic dynamics as a DataSource.

The reference's correctness criterion for a trained model is *forecast
skill* on real atmospheric dynamics -- its validation workflow scores
rollout RMSE against persistence/climatology baselines on reanalysis
archives (reference ``examples/validate.py:306-325``). This environment
cannot download ERA5/CFS, but the repo owns the reference's own physics
baseline (the spectral barotropic core, ``examples/run_barotropic.py``):
this module turns it into a data *source* -- a multi-segment,
perturbed-restart Z500 (+relative vorticity) series of genuinely chaotic
dynamics that a CNN cannot memorize, exposed through the same
``DataSource`` protocol the :class:`~dlwp_tpu.data.preprocessing.
Preprocessor` consumes.

Design notes:

- **Perturbed restarts.** Unforced barotropic flow slowly condenses into
  large-scale/zonal patterns (2-D inverse cascade), so one multi-year run
  drifts away from weather-like variability. The archive is therefore K
  independent ``segment_days``-long trajectories from perturbed initial
  states (a climatological zonal jet + random planetary-wave noise with an
  n^-1.5 spectral slope), integrated as ONE batched ensemble scan (the
  TPU-native formulation: members fill the MXU, ~25x single-member
  throughput, BASELINE.md).
- **Boundary markers.** Consecutive segments are different trajectories;
  a sample window spanning a restart would pair inputs and targets from
  unrelated states. One all-NaN marker row is inserted between segments:
  the existing NaN-window machinery (``SeriesSampler.generate``'s joint
  input/target NaN removal, reference generators.py:563-565, and the
  NaN-aware streaming scaler statistics) then drops exactly the
  contaminated windows and nothing else.
- **Two channels.** ``HGT/500`` (the prognostic height) and ``VRT/500``
  (relative vorticity) stand in for the reference's HGT+THICK pair
  (reference train.py:49-52) so the canonical two-variable architecture
  shapes carry over; both are physically consistent diagnostics of the
  same trajectory.
"""

from __future__ import annotations

import numpy as np

from dlwp_tpu.grid.latlon import GRAVITY, LatLonGrid, OMEGA


class BarotropicArchiveSource:
    """DataSource serving a perturbed-restart barotropic Z500/VRT archive.

    Args:
        n_samples: total rows served (including the NaN marker rows).
        nlat, nlon: regular grid size (reference 2.5-degree: 73 x 144).
        truncation: spectral truncation (reference T72 at this grid).
        dt: model time step [s] (reference run_barotropic.py: 1800).
        snapshot_hours: archive cadence (reference predictor files: 6 h).
        segment_days: trajectory length per restart segment.
        spinup_days: integration discarded after each restart so the
            archived flow is dynamically adjusted.
        damping_coefficient: del-8 hyperdiffusion (reference: 5e-6... read
            run_barotropic.py:23-25; 2e-4 spins noise down harder for the
            smaller CI grids).
        wave_rms: target rms height of the random wave perturbation [m].
        seed: base seed; segment k uses seed + k.
        step_impl: 'xla' | 'pallas' (forwarded to the psi-form core).
    """

    def __init__(
        self,
        n_samples: int = 5888,
        nlat: int = 73,
        nlon: int = 144,
        truncation: int = 72,
        dt: float = 1800.0,
        snapshot_hours: int = 6,
        segment_days: int = 92,
        spinup_days: float = 2.0,
        damping_coefficient: float = 5e-6,
        wave_rms: float = 120.0,
        wave_n_max: int | None = None,
        superrotation_ms: float = 15.0,
        jet_amp: float = 120.0,
        form: str = "vrt",
        seed: int = 0,
        start: str = "2000-01-01",
        step_impl: str = "xla",
        dtype=np.float32,
        truth_truncation: int | None = None,
        truth_nlat: int | None = None,
        truth_nlon: int | None = None,
        zonal_relaxation_days: float = 0.0,
        relax_n: int = 20,
        wave_drag_days: float = 0.0,
        wave_drag_n_min: int = 15,
    ):
        self.nlat, self.nlon = int(nlat), int(nlon)
        self.truncation = int(truncation)
        self.dt = float(dt)
        self.snapshot_hours = int(snapshot_hours)
        self.segment_days = int(segment_days)
        self.spinup_days = float(spinup_days)
        self.damping_coefficient = float(damping_coefficient)
        self.wave_rms = float(wave_rms)
        self.superrotation_ms = float(superrotation_ms)
        self.jet_amp = float(jet_amp)
        # Cap the wave band: with a -1.5 slope, modes near a high truncation
        # carry enough vorticity (winds ~ n z_n) to destabilize the
        # integration; n <= ~20 keeps planetary/synoptic scales only.
        self.wave_n_max = (
            int(wave_n_max)
            if wave_n_max is not None
            else min(20, max(8, self.truncation // 2))
        )
        if form not in ("vrt", "psi"):
            raise ValueError("form must be 'vrt' or 'psi'")
        # 'vrt' (default): the vorticity-form core -- pure barotropic
        # dynamics with no geostrophic f0 sign convention, so the
        # antisymmetric solid-body component behaves as true rigid
        # rotation in both hemispheres (the psi form's southern-hemisphere
        # sign correction assumes real-atmosphere symmetric Z500).
        self.form = form
        self.seed = int(seed)
        self.step_impl = step_impl
        self.dtype = dtype
        self._n = int(n_samples)
        self.times = (
            np.datetime64(start)
            + np.arange(self._n) * np.timedelta64(self.snapshot_hours, "h")
        ).astype("datetime64[ns]")
        self.grid = LatLonGrid.regular(self.nlat, self.nlon)
        self.lat = np.asarray(self.grid.lat)
        self.lon = np.asarray(self.grid.lon)
        # Two-truth mode (round-4 verdict item 6): integrate the GENERATING
        # dynamics at a higher truncation on a finer grid, then band-limit
        # each snapshot to ``truncation`` and synthesize it onto the archive
        # grid. A baseline core run at ``truncation`` on the archive grid
        # then carries genuine model error (the truth's nonlinear tendencies
        # involve above-truncation interactions it cannot represent), so
        # model-vs-barotropic skill comparisons are meaningful — without
        # this, the archive's own generator is the baseline and is exact by
        # construction (BASELINE.md round-4 ordering caveat).
        self.truth_truncation = (
            int(truth_truncation) if truth_truncation is not None else None
        )
        if self.truth_truncation is not None:
            if self.truth_truncation <= self.truncation:
                raise ValueError(
                    "truth_truncation must exceed the archive truncation"
                )
            # Default truth grid: the next standard halving of the grid
            # spacing that supports the truth truncation (T106 -> 145x288,
            # i.e. 1.25 deg for the 2.5-deg T72 archive).
            t_nlat = truth_nlat or (2 * (self.nlat - 1) + 1)
            t_nlon = truth_nlon or (2 * self.nlon)
            if t_nlat - 1 < self.truth_truncation or (
                t_nlon // 2 < self.truth_truncation
            ):
                raise ValueError(
                    f"truth grid {t_nlat}x{t_nlon} cannot support "
                    f"T{self.truth_truncation}"
                )
            self._run_grid = LatLonGrid.regular(t_nlat, t_nlon)
            self._run_truncation = self.truth_truncation
        else:
            self._run_grid = self.grid
            self._run_truncation = self.truncation
        # Unmodeled-physics term (round-4 verdict item 6, second option):
        # the GENERATING dynamics relax the zonal-mean vorticity (m = 0,
        # n <= relax_n) toward a fixed mid-amplitude jet profile on a
        # ``zonal_relaxation_days`` timescale (Held-Suarez-style). The
        # plain barotropic core scored as a baseline does not know this
        # term, so it carries a genuine, persistent physics deficiency —
        # while the term is zonally symmetric and linear in the visible
        # state, i.e. learnable by the (translation-equivariant) CNN via
        # the latitude information in its insolation channel. Preferred
        # over the truth_truncation route on THIS configuration: the
        # measured del-8 hyperdiffusion kills above-truncation modes, so a
        # T106 truth reintegrates at T72 to fp32 noise (BASELINE.md r5).
        # Relaxation is stabilizing (bounded response), unlike an additive
        # forcing, which the low-n damping could never balance.
        self.zonal_relaxation_days = float(zonal_relaxation_days)
        self.relax_n = int(relax_n)
        # Scale-selective Rayleigh drag on the cascade band (all m,
        # n >= wave_drag_n_min): the band is continuously re-energized by
        # the nonlinear enstrophy cascade from the forced scales, so the
        # truth's statistics stay stationary over long segments (unlike a
        # broadband wave drag, which would empty the waves), while a plain
        # core scored as a baseline equilibrates the band differently —
        # persistent model error. Measured instrument choice in
        # BASELINE.md round 5: the zonal relaxation equilibrates to the
        # (weak) wave-driven zonal tendency, and truth_truncation error is
        # bounded by what the hyperdiffusion leaves alive; the band drag is
        # the term with production-scale magnitude. As a fixed linear
        # scale-selective filter it is exactly representable by a
        # convolution — learnable by the CNN with no symmetry breaking.
        self.wave_drag_days = float(wave_drag_days)
        self.wave_drag_n_min = int(wave_drag_n_min)
        self._fields: dict[str, np.ndarray] | None = None

    # ------------------------------------------------------------ generation
    @property
    def per_segment(self) -> int:
        return self.segment_days * 24 // self.snapshot_hours

    @property
    def n_segments(self) -> int:
        # Each segment contributes per_segment rows + 1 NaN marker row
        # (no marker after the last).
        per = self.per_segment + 1
        return max(1, -(-(self._n + 1) // per))

    def _initial_z(self) -> np.ndarray:
        """(K, H, W) perturbed initial height fields.

        Base state = solid-body superrotation (``superrotation_ms`` is the
        equatorial zonal wind; solid rotation is barotropically STABLE, so
        the flow advects without feeding instability growth -- the lever
        that keeps multi-week segments statistically bounded) + a mild
        ``sin^2`` jet (amplitude jittered per segment to span regimes) + a
        random superposition of spherical harmonics with total wavenumber
        4..T/2 and an n^-1.5 amplitude slope, normalized to ``wave_rms``.
        The advection makes persistence decay fast (waves sweep zonally at
        ~``superrotation_ms``) while the dynamics stay deterministic and
        learnable -- exactly the regime a forecast-skill test needs.
        """
        import jax
        import jax.numpy as jnp

        from dlwp_tpu.spectral import SphericalHarmonics

        K = self.n_segments
        T = self._run_truncation
        sh = SphericalHarmonics.build(self._run_grid, T, dtype=jnp.float32)

        # Complex arrays must never cross the host<->device boundary: the
        # TPU tunnel runtime implements only real-dtype transfers (measured:
        # complex64 device_put raises UNIMPLEMENTED). The random spectral
        # coefficients therefore travel as real/imag float32 pairs and are
        # combined on device inside the jitted synthesis.
        @jax.jit
        def synth_ri(re, im):
            return sh.synthesize(jax.lax.complex(re, im))
        mask = np.asarray(sh.mask, dtype=np.float64)  # (m, n) triangular
        m_idx = np.arange(T + 1)[:, None]
        n_idx = np.arange(T + 1)[None, :]
        band = (n_idx >= 4) & (n_idx <= self.wave_n_max) & (m_idx >= 1)
        amp = np.where(band, (1.0 + n_idx) ** -1.5, 0.0) * mask
        lat = np.radians(np.asarray(self._run_grid.lat))[:, None]
        # z amplitude giving an equatorial solid-body wind u0 under the
        # psi-form convention psi = g z / f0 (u = (g A / (f0 a)) cos(lat)).
        a_sb = (
            self.superrotation_ms * 2 * OMEGA * self.grid.radius / GRAVITY
        )
        zs = []
        for k in range(K):
            rng = np.random.RandomState(self.seed + k)
            jet = (
                5500.0
                - a_sb * np.sin(lat)
                - self.jet_amp * (0.8 + 0.4 * rng.rand()) * np.sin(lat) ** 2
            )
            coef = amp * (rng.randn(T + 1, T + 1) + 1j * rng.randn(T + 1, T + 1))
            wave = np.asarray(synth_ri(
                jnp.asarray(coef.real, jnp.float32),
                jnp.asarray(coef.imag, jnp.float32),
            ))
            rms = float(np.sqrt(np.mean(wave**2))) or 1.0
            zs.append(jet + wave * (self.wave_rms / rms))
        return np.stack(zs).astype(np.float32)

    def _generate(self) -> dict[str, np.ndarray]:
        import jax
        import jax.numpy as jnp

        from dlwp_tpu.barotropic import BarotropicModel, BarotropicModelPsi

        cls = BarotropicModel if self.form == "vrt" else BarotropicModelPsi
        model = cls(
            self._run_grid,
            self._run_truncation,
            dt=self.dt,
            damping_coefficient=self.damping_coefficient,
            dtype=jnp.float32,
            step_impl=self.step_impl,
        )
        if self.zonal_relaxation_days > 0 or self.wave_drag_days > 0:
            if self.step_impl == "pallas":
                raise ValueError(
                    "unmodeled-physics terms require step_impl='xla' (the "
                    "fused kernel bakes the unforced tendency)"
                )
        if self.wave_drag_days > 0:
            tau_d = self.wave_drag_days * 86400.0
            T = self._run_truncation
            n_idx = np.arange(T + 1)[None, :]
            band = (n_idx >= self.wave_drag_n_min) * np.ones((T + 1, 1))
            drag_mask = jnp.asarray(
                band.astype(np.float32) * np.asarray(model.sh.mask) / tau_d
            )
            base_tendency_d = model._tendency

            def dragged_tendency(vrt_spec):
                return base_tendency_d(vrt_spec) - (
                    vrt_spec * drag_mask
                ).astype(vrt_spec.dtype)

            model._tendency = dragged_tendency
        if self.zonal_relaxation_days > 0:
            tau = self.zonal_relaxation_days * 86400.0
            T = self._run_truncation
            m_idx = np.arange(T + 1)[:, None]
            n_idx = np.arange(T + 1)[None, :]
            mask = ((m_idx == 0) & (n_idx >= 1) & (n_idx <= self.relax_n))
            relax_mask = jnp.asarray(
                mask.astype(np.float32) * np.asarray(model.sh.mask)
            )
            lat = np.radians(np.asarray(self._run_grid.lat))[:, None]
            a_sb = (
                self.superrotation_ms * 2 * OMEGA * self.grid.radius / GRAVITY
            )
            target_z = (
                5500.0 - a_sb * np.sin(lat) - self.jet_amp * np.sin(lat) ** 2
            ) * np.ones((1, self._run_grid.nlon))
            target_spec = (
                model.from_z(jnp.asarray(target_z, jnp.float32)).vrt_spec
                * relax_mask
            )
            base_tendency = model._tendency

            def forced_tendency(vrt_spec):
                relax = (target_spec - vrt_spec * relax_mask) / tau
                return base_tendency(vrt_spec) + relax.astype(vrt_spec.dtype)

            model._tendency = forced_tendency

        state = model.from_z(jnp.asarray(self._initial_z()))
        spinup = int(round(self.spinup_days * 86400.0 / self.dt))
        if spinup:
            state = model.run(state, spinup)
        every = int(round(self.snapshot_hours * 3600.0 / self.dt))
        n_snap = self.per_segment

        if self.truth_truncation is not None:
            # In-scan coarse-graining: analyze each truth-grid snapshot at
            # the ARCHIVE truncation and synthesize onto the archive grid —
            # only band-limited coarse fields are ever materialized
            # ((n_snap, K, H, W), not the 4x-larger truth fields).
            from dlwp_tpu.spectral import SphericalHarmonics

            sh_a = SphericalHarmonics.build(
                self._run_grid, self.truncation, dtype=jnp.float32
            )
            sh_s = SphericalHarmonics.build(
                self.grid, self.truncation, dtype=jnp.float32
            )

            def coarsen(f):
                return sh_s.synthesize(sh_a.analyze(f))
        else:
            def coarsen(f):
                return f

        @jax.jit
        def snapshots(s):
            def outer(st, _):
                st = model._advance(st, every)
                return st, (
                    coarsen(model.z_grid(st)),
                    coarsen(model.vrt_grid(st)),
                )

            _, (zs, vs) = jax.lax.scan(outer, s, None, length=n_snap)
            return zs, vs

        zs, vs = snapshots(state)  # (n_snap, K, H, W) each
        zs = np.asarray(zs, dtype=self.dtype)
        vs = np.asarray(vs, dtype=self.dtype)
        out = {}
        H, W = self.nlat, self.nlon
        for name, arr in (("HGT", zs), ("VRT", vs)):
            rows = np.full((self._n, H, W), np.nan, dtype=self.dtype)
            pos = 0
            for k in range(self.n_segments):
                if pos >= self._n:
                    break
                take = min(n_snap, self._n - pos)
                rows[pos : pos + take] = arr[:take, k]
                pos += take + 1  # skip one row: the NaN boundary marker
            out[name] = rows
        return out

    # -------------------------------------------------------------- protocol
    def field(self, variable: str, level) -> np.ndarray:
        if self._fields is None:
            self._fields = self._generate()
        try:
            return self._fields[variable]
        except KeyError:
            raise KeyError(
                f"BarotropicArchiveSource serves HGT/VRT, not {variable!r}"
            ) from None
