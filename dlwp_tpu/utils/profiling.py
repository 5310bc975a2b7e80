"""Profiling and throughput instrumentation.

The reference's observability is TensorBoard callbacks + wall-clock prints
(SURVEY.md section 5.1). TPU-native equivalents:

- :func:`trace` -- context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory;
- :class:`StepTimer` -- per-step wall-clock with device sync;
- :class:`ThroughputMeter` -- the grid-points/s/chip meter used by
  bench.py and the scaling-efficiency harness.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that synchronizes the device before reading."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def best(self) -> float:
        return min(self.times)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times)


class ThroughputMeter:
    """grid-points/s(/chip) meter.

    grid_points = batch * steps * nlat * nlon processed per wall-clock
    second, divided by the number of chips for the per-chip figure.
    """

    def __init__(self, nlat: int, nlon: int, n_chips: int = 1):
        self.nlat = nlat
        self.nlon = nlon
        self.n_chips = n_chips

    def rate(self, batch: int, steps: int, seconds: float) -> float:
        return batch * steps * self.nlat * self.nlon / seconds

    def rate_per_chip(self, batch: int, steps: int, seconds: float) -> float:
        return self.rate(batch, steps, seconds) / self.n_chips

    def scaling_efficiency(
        self, single_chip_rate: float, n_chip_rate: float, n: int
    ) -> float:
        """Fraction of ideal linear scaling achieved at n chips."""
        return n_chip_rate / (single_chip_rate * n)
