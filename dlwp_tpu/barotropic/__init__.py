"""Spectral barotropic vorticity dynamical core (functional, scan-based)."""

from dlwp_tpu.barotropic.model import (
    BarotropicModel,
    BarotropicModelPsi,
    BarotropicState,
)

__all__ = ["BarotropicModel", "BarotropicModelPsi", "BarotropicState"]
