"""Spherical-harmonic spectral transform engine (TPU-native).

Replaces the Fortran SPHEREPACK/pyspharm dependency of the reference
(``DLWP/barotropic/pyspharm_transforms.py``) with a pure JAX engine: real FFT
in longitude + associated-Legendre contractions in latitude expressed as
batched matmuls (MXU-shaped), with all tables precomputed on the host in
float64.
"""

from dlwp_tpu.spectral.legendre import LegendreTables, legendre_tables
from dlwp_tpu.spectral.transforms import SphericalHarmonics

__all__ = ["LegendreTables", "legendre_tables", "SphericalHarmonics"]
