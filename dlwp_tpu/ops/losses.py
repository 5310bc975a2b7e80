"""Training losses and skill metrics.

jnp ports of the reference's custom losses (``DLWP/custom.py:899-1088``):
latitude-weighted losses (cosine / midlatitude weighting) and the anomaly
correlation coefficient metric/loss with its regularization variants. All are
pure functions suitable for jit/grad.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def mse(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean((y_pred - y_true) ** 2)


def mae(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_pred - y_true))


def latitude_weights(
    lats: np.ndarray, weighting: str = "cosine"
) -> np.ndarray:
    """Latitude weights per the reference factory (custom.py:977-978):
    'cosine' -> cos(lat); 'midlatitude' -> cos(lat) + 0.5 sin^2(2 lat)."""
    if weighting not in ("cosine", "midlatitude"):
        raise ValueError("weighting must be 'cosine' or 'midlatitude'")
    rad = np.radians(np.asarray(lats, dtype=np.float64))
    w = np.cos(rad)
    if weighting == "midlatitude":
        w = w + 0.5 * np.sin(2.0 * rad) ** 2
    return w


class LatitudeWeightedLoss:
    """Picklable latitude-weighted loss callable (see factory below)."""

    def __init__(self, loss_function, lats, weighting="cosine", lat_axis=-2):
        self.loss_function = loss_function
        self.weights = latitude_weights(lats, weighting)
        self.lat_axis = lat_axis
        self.__name__ = "latitude_weighted_loss"

    def __call__(self, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        shape = [1] * y_true.ndim
        shape[self.lat_axis] = self.weights.shape[0]
        wb = jnp.asarray(self.weights).reshape(shape).astype(y_true.dtype)
        return self.loss_function(y_true * wb, y_pred * wb)


def latitude_weighted_loss(
    loss_function: Callable = mse,
    lats: np.ndarray | None = None,
    weighting: str = "cosine",
    lat_axis: int = -2,
) -> Callable:
    """Build a loss that scales y_true/y_pred by latitude weight before the
    base loss -- semantics of the reference factory (custom.py:956-991),
    which multiplies both tensors by the weights (so MSE is weighted by w^2).

    Args:
        loss_function: base loss (y_true, y_pred) -> scalar.
        lats: 1-d latitude array; if None, no weighting.
        weighting: 'cosine' | 'midlatitude'.
        lat_axis: axis of y arrays holding latitude (default -2, i.e.
            (..., lat, lon) layouts).
    """
    if lats is None:
        return loss_function
    return LatitudeWeightedLoss(loss_function, lats, weighting, lat_axis)


def anomaly_correlation(
    y_true: jax.Array,
    y_pred: jax.Array,
    mean: jax.Array | float = 0.0,
) -> jax.Array:
    """Anomaly correlation about a climatological ``mean`` (custom.py:994):
    mean(y'_p y'_t) / sqrt(mean(y'_p^2) mean(y'_t^2))."""
    yp = y_pred - mean
    yt = y_true - mean
    return jnp.mean(yp * yt) / jnp.sqrt(
        jnp.mean(yp**2) * jnp.mean(yt**2)
    )


class AnomalyCorrelationLoss:
    """Picklable ACC loss callable (see factory below)."""

    def __init__(self, mean=None, regularize_mean="mse", reverse=True):
        if regularize_mean is not None:
            if regularize_mean not in ("global", "spatial", "mse", "mae"):
                raise ValueError(f"bad regularize_mean {regularize_mean!r}")
            reverse = True
        self.mean = None if mean is None else np.asarray(mean)
        self.regularize_mean = regularize_mean
        self.reverse = reverse
        self.__name__ = "anomaly_correlation_loss"

    def __call__(self, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        a = anomaly_correlation(
            y_true, y_pred, 0.0 if self.mean is None else jnp.asarray(self.mean)
        )
        reg = self.regularize_mean
        if reg is None:
            return -a if self.reverse else a
        if reg == "global":
            m = jnp.abs((jnp.mean(y_true) - jnp.mean(y_pred)) / jnp.mean(y_true))
        elif reg == "spatial":
            mt = jnp.mean(y_true, axis=(-2, -1))
            mp = jnp.mean(y_pred, axis=(-2, -1))
            m = jnp.mean(jnp.abs((mt - mp) / mt))
        elif reg == "mse":
            m = mse(y_true, y_pred)
        else:  # mae
            m = mae(y_true, y_pred)
        return m - a if self.reverse else a - m


def anomaly_correlation_loss(
    mean: np.ndarray | None = None,
    regularize_mean: str | None = "mse",
    reverse: bool = True,
) -> Callable:
    """ACC loss factory (reference custom.py:1036-1088).

    Args:
        mean: climatological mean broadcastable to predictions (the reference
            requires a leading length-1 batch axis; any broadcastable shape
            is accepted here), or None for zero mean (pre-scaled data).
        regularize_mean: None | 'global' | 'spatial' | 'mse' | 'mae' -- add a
            mean-error penalty m so the loss is ``m - acc``.
        reverse: negate so minimizing drives ACC -> 1 (forced True when
            regularized, as in the reference).
    """
    return AnomalyCorrelationLoss(mean, regularize_mean, reverse)
