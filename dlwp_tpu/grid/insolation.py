"""Top-of-atmosphere solar insolation, computed in-graph.

Re-implements the analytic insolation model of the reference
(``DLWP/util.py:300-352``): a first-order orbital approximation with fixed
1995 orbital elements. Unlike the reference (host-side numpy, recomputed each
rollout step at ``extensions.py:236-240``), this version is pure ``jnp`` so the
autoregressive rollout can compute the forcing channel *inside* the jitted
``lax.scan`` from a scalar time coordinate -- no host round trip per step.

Time is represented as fractional days since year start (leap days ignored,
matching the reference), so dates enter the graph as plain float arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Orbital constants for epoch 1995 (same physical model as the reference).
_OBLIQUITY = 23.4441 * np.pi / 180.0
_ECCENTRICITY = 0.016715
_PERIHELION_LON = 282.7 * np.pi / 180.0


def day_of_year(dates) -> np.ndarray:
    """Fractional day-of-year for datetime64-like inputs (host-side helper)."""
    dates = np.asarray(dates, dtype="datetime64[s]")
    years = dates.astype("datetime64[Y]")
    return (dates - years).astype("timedelta64[s]").astype(np.float64) / 86400.0


def insolation(days, lat, lon, solar_constant: float = 1.0):
    """Approximate TOA solar insolation.

    Args:
        days: scalar or (t,) array of fractional days-of-year (UTC).
        lat: (nlat,) or (nlat, nlon) latitudes in degrees.
        lon: (nlon,) or (nlat, nlon) longitudes in degrees [0, 360).
        solar_constant: scaling factor S.

    Returns:
        (t, nlat, nlon) array (or (nlat, nlon) for scalar ``days``) of
        insolation, clipped at zero. Matches reference ``util.py:305-352``.
    """
    days = jnp.asarray(days)
    scalar_time = days.ndim == 0
    days = jnp.atleast_1d(days)
    lat = jnp.asarray(lat)
    lon = jnp.asarray(lon)
    if lat.ndim == 1:
        lon2, lat2 = jnp.meshgrid(lon, lat)
    else:
        lat2, lon2 = lat, lon

    beta = jnp.sqrt(1.0 - _ECCENTRICITY**2)
    # Mean orbital longitude relative to perihelion, 1st-order approximation.
    lambda_m0 = _ECCENTRICITY * (1.0 + beta) * jnp.sin(_PERIHELION_LON)
    lambda_m = lambda_m0 + 2.0 * jnp.pi * (days - 80.5) / 365.0
    lam = lambda_m + 2.0 * _ECCENTRICITY * jnp.sin(lambda_m - _PERIHELION_LON)
    declination = jnp.arcsin(jnp.sin(_OBLIQUITY) * jnp.sin(lam))
    # Hour angle: local solar time from UTC day fraction + longitude offset.
    hour_angle = 2.0 * jnp.pi * (days[:, None, None] + lon2 / 360.0)
    # Sun-Earth distance factor rho = r / a.
    rho = (1.0 - _ECCENTRICITY**2) / (
        1.0 + _ECCENTRICITY * jnp.cos(lam - _PERIHELION_LON)
    )

    lat_rad = jnp.radians(lat2)
    sol = (
        solar_constant
        * (
            jnp.sin(lat_rad)[None] * jnp.sin(declination)[:, None, None]
            - jnp.cos(lat_rad)[None]
            * jnp.cos(declination)[:, None, None]
            * jnp.cos(hour_angle)
        )
        * rho[:, None, None] ** -2
    )
    sol = jnp.maximum(sol, 0.0)
    return sol[0] if scalar_time else sol


def insolation_tables(lat, lon, dtype=np.float32):
    """Static (3, nlat, nlon) basis tables for :func:`insolation_from_tables`.

    The insolation field factors into per-*time* scalars times three
    time-independent grid fields: with ``h = 2*pi*(days + lon/360)``,

        cos(h) = cos(2*pi*days) * cos(2*pi*lon/360)
               - sin(2*pi*days) * sin(2*pi*lon/360)

    so ``sol = relu(a*sin(lat) + b1*cos(lat)cos(2*pi*lon/360)
    + b2*cos(lat)sin(2*pi*lon/360))`` with (a, b1, b2) scalar functions of
    the day. Inside an autoregressive rollout this replaces an
    O(B*nlat*nlon) transcendental field per step (the direct formula, and
    the reference's host-side recompute at extensions.py:236-240) with O(B)
    scalars and one (B, 3) x (3, nlat*nlon) contraction.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if lat.ndim == 1:
        lon2, lat2 = np.meshgrid(lon, lat)
    else:
        lat2, lon2 = lat, lon
    lat_rad = np.radians(lat2)
    lon_phase = 2.0 * np.pi * lon2 / 360.0
    return np.stack(
        [
            np.sin(lat_rad),
            np.cos(lat_rad) * np.cos(lon_phase),
            np.cos(lat_rad) * np.sin(lon_phase),
        ]
    ).astype(dtype)


def insolation_from_tables(days, tables, solar_constant: float = 1.0):
    """Insolation from precomputed basis tables (same model as
    :func:`insolation`, factored form).

    Args:
        days: array of fractional days-of-year, any shape ``(...,)``.
        tables: (3, nlat, nlon) array from :func:`insolation_tables`.
        solar_constant: scaling factor S.

    Returns:
        ``(..., nlat, nlon)`` insolation, clipped at zero. Matches
        :func:`insolation` to float rounding (the only algebraic
        differences are the cosine addition identity and
        ``cos(declination) = sqrt(1 - sin^2)``, exact for |decl| < pi/2).
    """
    days = jnp.asarray(days)
    shape = days.shape
    d = days.reshape(-1)
    beta = jnp.sqrt(1.0 - _ECCENTRICITY**2)
    lambda_m0 = _ECCENTRICITY * (1.0 + beta) * jnp.sin(_PERIHELION_LON)
    lambda_m = lambda_m0 + 2.0 * jnp.pi * (d - 80.5) / 365.0
    lam = lambda_m + 2.0 * _ECCENTRICITY * jnp.sin(lambda_m - _PERIHELION_LON)
    sin_decl = jnp.sin(_OBLIQUITY) * jnp.sin(lam)
    cos_decl = jnp.sqrt(1.0 - sin_decl**2)
    rho = (1.0 - _ECCENTRICITY**2) / (
        1.0 + _ECCENTRICITY * jnp.cos(lam - _PERIHELION_LON)
    )
    r2 = solar_constant * rho**-2
    # Only the fractional day enters the diurnal phase; reduce before the
    # 2*pi multiply so float32 argument reduction stays exact (at d ~ 365
    # the unreduced phase costs ~1.4e-4 radians of rounding).
    phase = 2.0 * jnp.pi * (d - jnp.floor(d))
    # sol = r2 * (sin_decl*T0 - cos_decl*cos(phase)*T1 + cos_decl*sin(phase)*T2)
    coeff = jnp.stack(
        [
            r2 * sin_decl,
            -r2 * cos_decl * jnp.cos(phase),
            r2 * cos_decl * jnp.sin(phase),
        ],
        axis=1,
    )  # (D, 3)
    tables = jnp.asarray(tables, dtype=coeff.dtype)
    H, W = tables.shape[-2:]
    sol = coeff @ tables.reshape(3, H * W)
    return jnp.maximum(sol, 0.0).reshape(shape + (H, W))
