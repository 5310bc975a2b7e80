"""Forecast orchestration and verification."""

from dlwp_tpu.forecast.rollout import TimeSeriesEstimator, Forecast
from dlwp_tpu.forecast import verify

__all__ = ["TimeSeriesEstimator", "Forecast", "verify"]
