"""DLWP-TPU: a TPU-native deep-learning weather prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of jweyn/DLWP
(reference surveyed in SURVEY.md): CNN-based global weather prediction with
autoregressive rollout, a spectral barotropic vorticity dynamical core, the
full data pipeline (acquisition -> predictor files -> device-ready batches),
forecast verification, and plotting -- all built TPU-first:

- compute path: jit-compiled JAX with static shapes, ``lax.scan`` for time
  integration and autoregressive rollout, Pallas kernels for hot stencils;
- spectral transforms as batched matmuls on the MXU (no Fortran SPHEREPACK);
- scaling via ``jax.sharding.Mesh`` + ``shard_map`` (data + lat-band spatial
  decomposition with ICI halo exchange), not ``multi_gpu_model``.

Subpackages
-----------
- :mod:`dlwp_tpu.grid`       -- lat/lon grids, quadrature, insolation
- :mod:`dlwp_tpu.spectral`   -- spherical-harmonic transform engine
- :mod:`dlwp_tpu.barotropic` -- barotropic vorticity dynamical core
- :mod:`dlwp_tpu.ops`        -- padding/conv/pool stencil ops + losses
- :mod:`dlwp_tpu.models`     -- neural network model API (flax)
- :mod:`dlwp_tpu.data`       -- predictor files, samplers, acquisition
- :mod:`dlwp_tpu.train`      -- training loop, checkpointing, callbacks
- :mod:`dlwp_tpu.forecast`   -- autoregressive rollout + verification
- :mod:`dlwp_tpu.parallel`   -- meshes, shardings, halo exchange
- :mod:`dlwp_tpu.serve`      -- AOT compiled-program export for serving
- :mod:`dlwp_tpu.utils`      -- serialization, reflection, misc helpers
"""

__version__ = "0.1.0"

# Convenience top-level API (lazy to keep bare import cheap).
def __getattr__(name):
    _MAP = {
        "DLWPNeuralNet": "dlwp_tpu.models",
        "DLWPFunctional": "dlwp_tpu.models",
        "SeriesSampler": "dlwp_tpu.data",
        "PredictorDataset": "dlwp_tpu.data",
        "Preprocessor": "dlwp_tpu.data",
        "TimeSeriesEstimator": "dlwp_tpu.forecast",
        "BarotropicModel": "dlwp_tpu.barotropic",
        "BarotropicModelPsi": "dlwp_tpu.barotropic",
        "SphericalHarmonics": "dlwp_tpu.spectral",
        "LatLonGrid": "dlwp_tpu.grid",
        "ExperimentConfig": "dlwp_tpu.config",
        "save_model": "dlwp_tpu.utils",
        "load_model": "dlwp_tpu.utils",
        "Servable": "dlwp_tpu.serve",
        "export_rollout": "dlwp_tpu.serve",
        "export_barotropic": "dlwp_tpu.serve",
    }
    if name in _MAP:
        import importlib

        return getattr(importlib.import_module(_MAP[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
