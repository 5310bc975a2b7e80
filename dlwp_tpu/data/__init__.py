"""Data pipeline: predictor files, preprocessing, samplers, acquisition."""

from dlwp_tpu.data.dataset import PredictorDataset
from dlwp_tpu.data.preprocessing import Preprocessor
from dlwp_tpu.data.sampler import SeriesSampler, SamplesSampler, device_prefetch
from dlwp_tpu.data.device_sampler import DeviceSeriesSampler
from dlwp_tpu.data.barotropic_archive import BarotropicArchiveSource

__all__ = [
    "PredictorDataset",
    "Preprocessor",
    "SeriesSampler",
    "SamplesSampler",
    "DeviceSeriesSampler",
    "BarotropicArchiveSource",
    "device_prefetch",
]
