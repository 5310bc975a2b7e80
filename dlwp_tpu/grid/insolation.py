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
