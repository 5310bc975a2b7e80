"""AOT compiled-program export for production serving (``jax.export``).

The reference deploys forecasts by reloading a Keras model and looping
``model.predict`` in host Python (reference ``DLWP/util.py:126-192`` +
``examples/validate.py:167-205``); there, re-tracing the graph at load time
is cheap. On TPU the expensive step is TRACING + XLA COMPILATION of the
rollout scan (minutes for a conv-tower program on a fresh process), so the
deployable unit here is the *compiled program*, not the weight file: this
module exports the jitted autoregressive rollout as a serialized StableHLO
artifact -- weights baked in as constants, optionally batch-polymorphic
(one artifact serves any batch size) and multi-platform (lower once on a
CPU build host, run on TPU serving hosts) -- plus the host-side scaler /
imputer state, in one self-contained file.

Typical flow::

    dlwp.fit(...)                                        # build host
    servable = export_rollout(dlwp, x, 24, path="fc.dlwpserve")
    ...
    servable = Servable.load("fc.dlwpserve")             # serving host
    forecast = servable.predict_timeseries(predictors)   # no model code

``Servable.call`` runs the raw exported program; ``predict_timeseries``
additionally applies the saved imputer/scaler and the reference's output
shaping, matching :meth:`dlwp_tpu.models.DLWPNeuralNet.predict_timeseries`
bit for bit.

Security note: the container embeds the scaler/imputer via pickle -- load
artifacts only from trusted sources (same caveat as the reference's ``.pkl``
model files, ``DLWP/util.py:156-192``).
"""

from __future__ import annotations

import io
import json
import pickle
import struct

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from dlwp_tpu.models.api import shape_series

_MAGIC = b"DLWPSERVE\x01"
_FORMAT_VERSION = 1


def _pack(meta: dict, blob: bytes, state: bytes) -> bytes:
    head = json.dumps(meta).encode("utf-8")
    out = io.BytesIO()
    out.write(_MAGIC)
    for part in (head, blob, state):
        out.write(struct.pack("<Q", len(part)))
        out.write(part)
    return out.getvalue()


def _unpack(data: bytes) -> tuple[dict, bytes, bytes]:
    if not data.startswith(_MAGIC):
        raise ValueError("not a dlwp_tpu servable artifact (bad magic)")
    off = len(_MAGIC)
    parts = []
    for _ in range(3):
        if off + 8 > len(data):
            raise ValueError("truncated servable artifact")
        (n,) = struct.unpack_from("<Q", data, off)
        off += 8
        if off + n > len(data):
            raise ValueError("truncated servable artifact")
        parts.append(data[off : off + n])
        off += n
    meta = json.loads(parts[0].decode("utf-8"))
    if meta.get("format_version", 0) > _FORMAT_VERSION:
        raise ValueError(
            f"servable format v{meta['format_version']} is newer than this "
            f"dlwp_tpu (v{_FORMAT_VERSION})"
        )
    return meta, parts[1], parts[2]


class Servable:
    """A deserialized exported program plus its host-side metadata.

    Wraps a :class:`jax.export.Exported`; ``call`` invokes the compiled
    program (under jit -- XLA compiles the pre-lowered StableHLO directly,
    skipping Python tracing). Rollout servables additionally expose
    :meth:`predict_timeseries` with the full host pre/post-processing.
    """

    def __init__(self, exported, meta: dict, host_state: dict | None = None):
        self._exported = exported
        self.meta = dict(meta)
        self._host = host_state or {}

    # ------------------------------------------------------------ execution
    def call(self, *args):
        """Run the raw exported program on the current backend."""
        return self._exported.call(*args)

    def predict_timeseries(self, predictors, keep_time_dim: bool = False):
        """Scaled-and-shaped rollout, matching
        ``DLWPNeuralNet.predict_timeseries`` (reference models.py:247-301).
        """
        if self.meta.get("kind") != "rollout":
            raise ValueError(
                "this servable was not exported with export_rollout()"
            )
        x = np.asarray(predictors)
        imputer = self._host.get("imputer")
        if imputer is not None:
            x = imputer.transform(x)
        scaler = self._host.get("scaler")
        if scaler is not None:
            x = scaler.transform(x)
        dtype = self.meta.get("dtype", "float32")
        ts = np.asarray(self.call(jnp.asarray(x, dtype=dtype)))
        scaler_y = self._host.get("scaler_y")
        if scaler_y is not None and self.meta.get("scale_targets", True):
            ts = scaler_y.inverse_transform(ts)
        return shape_series(
            ts,
            self.meta["time_dim"],
            tuple(self.meta["feature_shape"]),
            step_sequence=self.meta["step_sequence"],
            keep_time_dim=keep_time_dim,
        )

    # ---------------------------------------------------------- inspection
    @property
    def platforms(self) -> tuple[str, ...]:
        return tuple(self._exported.platforms)

    @property
    def in_avals(self):
        return self._exported.in_avals

    def __repr__(self):
        return (
            f"Servable(kind={self.meta.get('kind')!r}, "
            f"platforms={self.platforms}, in={self.in_avals})"
        )

    # --------------------------------------------------------- persistence
    def serialize(self) -> bytes:
        meta = dict(self.meta)
        meta["format_version"] = _FORMAT_VERSION
        return _pack(
            meta, self._exported.serialize(), pickle.dumps(self._host)
        )

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize())

    @classmethod
    def load(cls, path_or_bytes) -> "Servable":
        if isinstance(path_or_bytes, (bytes, bytearray)):
            data = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        meta, blob, state = _unpack(data)
        return cls(jax_export.deserialize(blob), meta, pickle.loads(state))


def export_jitted(
    fn,
    args_spec,
    *,
    platforms=("cpu", "tpu"),
    meta: dict | None = None,
    host_state: dict | None = None,
) -> Servable:
    """Export an arbitrary jittable function as a :class:`Servable`.

    ``args_spec`` is a tuple of ``jax.ShapeDtypeStruct`` (symbolic dims
    allowed via :func:`jax.export.symbolic_shape`) or concrete arrays.
    """
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        *args_spec
    )
    return Servable(exported, meta or {"kind": "custom"}, host_state)


def export_rollout(
    dlwp,
    example_predictors,
    time_steps: int,
    *,
    step_sequence: bool = False,
    batch: int | str | None = "b",
    platforms=("cpu", "tpu"),
    path: str | None = None,
) -> Servable:
    """Export a trained model's autoregressive rollout as a servable.

    Args:
        dlwp: a fitted ``DLWPNeuralNet``/``DLWPFunctional``.
        example_predictors: an example (unscaled) predictor batch -- only its
            shape and dtype are used to build the input specification.
        time_steps: forecast steps, as in ``predict_timeseries``.
        step_sequence: sliding-window feedback (models.py:280-290).
        batch: the exported batch dimension -- a symbolic-dimension name
            (default ``"b"``: the artifact accepts any batch size), an int
            to pin it, or ``None`` to keep the example's batch size.
        platforms: lowering platforms baked into the artifact.
        path: if given, also write the artifact to this file.
    """
    fn, n_iter = dlwp.rollout_fn(time_steps, step_sequence)
    x = np.asarray(example_predictors)
    feature_shape = x.shape[2:] if dlwp.is_recurrent else x.shape[1:]
    lead = x.shape[1:2] if dlwp.is_recurrent else ()
    if isinstance(batch, str):
        (b,) = jax_export.symbolic_shape(batch)
    elif batch is None:
        b = x.shape[0]
    else:
        b = int(batch)
    # The rollout runs in the model's scaled space; dtype follows the
    # trained parameters' compute dtype convention (fp32 serving default).
    dtype = jnp.float32
    spec = jax.ShapeDtypeStruct((b,) + lead + tuple(feature_shape), dtype)
    meta = {
        "kind": "rollout",
        "time_dim": dlwp.time_dim,
        "is_recurrent": dlwp.is_recurrent,
        "n_iter": n_iter,
        "time_steps": int(time_steps),
        "step_sequence": bool(step_sequence),
        "feature_shape": list(feature_shape),
        "scale_targets": bool(dlwp.scale_targets),
        "dtype": "float32",
    }
    host_state = {
        "scaler": dlwp.scaler,
        "scaler_y": dlwp.scaler_y if dlwp.scale_targets else None,
        "imputer": dlwp.imputer if dlwp.impute else None,
    }
    servable = export_jitted(
        fn, (spec,), platforms=platforms, meta=meta, host_state=host_state
    )
    if path is not None:
        servable.save(path)
    return servable


def export_barotropic(
    model,
    n_snapshots: int,
    snapshot_every: int,
    *,
    batch: int | str | None = None,
    platforms=("cpu", "tpu"),
    path: str | None = None,
) -> Servable:
    """Export a barotropic integration (z0 -> height snapshots).

    The barotropic model is the operational validation baseline
    (reference ``examples/validate.py:250-273``); this gives it the same
    compiled-artifact deployment as the CNN rollouts: the returned
    servable maps an initial height field ``(..., nlat, nlon)`` to
    ``(n_snapshots, ..., nlat, nlon)`` snapshots, with the integration
    scheme and spectral tables baked into the program.

    ``batch``: ``None`` exports the single-member shape; a symbolic name
    (e.g. ``"b"``) makes the member axis polymorphic; an int pins it.
    Requires ``step_impl='xla'`` (Pallas kernels lower only for TPU, so
    they cannot be baked into a multi-platform artifact).
    """
    if getattr(model, "step_impl", "xla") != "xla":
        raise ValueError(
            "export_barotropic requires step_impl='xla' (the fused Pallas "
            "kernel does not lower for multi-platform artifacts)"
        )
    J, L = model.grid.nlat, model.grid.nlon

    def fn(z0):
        state = model.from_z(z0)
        _, _, zs = model.run_with_snapshots(
            state, n_snapshots, snapshot_every
        )
        return zs

    if isinstance(batch, str):
        (b,) = jax_export.symbolic_shape(batch)
        shape = (b, J, L)
    elif batch is None:
        shape = (J, L)
    else:
        shape = (int(batch), J, L)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    meta = {
        "kind": "barotropic",
        "n_snapshots": int(n_snapshots),
        "snapshot_every": int(snapshot_every),
        "dt": float(model.dt),
        "truncation": int(model.truncation),
        "grid": [int(J), int(L)],
        "spectral_mode": model.spectral_mode,
    }
    servable = export_jitted(fn, (spec,), platforms=platforms, meta=meta)
    if path is not None:
        servable.save(path)
    return servable


__all__ = ["Servable", "export_jitted", "export_rollout", "export_barotropic"]
