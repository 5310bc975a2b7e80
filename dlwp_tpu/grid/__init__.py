"""Spherical grid definitions, quadrature, and astronomical forcing."""

from dlwp_tpu.grid.latlon import (
    LatLonGrid,
    clenshaw_curtis_weights,
    gaussian_latitudes,
)
from dlwp_tpu.grid.insolation import insolation, day_of_year

__all__ = [
    "LatLonGrid",
    "clenshaw_curtis_weights",
    "gaussian_latitudes",
    "insolation",
    "day_of_year",
]
