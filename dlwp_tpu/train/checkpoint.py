"""Checkpoint save/restore via orbax.

TPU-native replacement for the reference's two-file persistence
(``DLWP/util.py:126-192``: Keras HDF5 weights + pickle of the wrapper):
orbax sharded checkpoints of {params, opt_state, step} plus a JSON-able
metadata dict (scaler statistics, model config), resumable across device
topologies.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    metadata: dict | None = None,
) -> None:
    """Save params (+optimizer state) and metadata to ``directory``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(directory, f"step_{step}"),
            {"params": params}
            | ({"opt_state": opt_state} if opt_state is not None else {}),
            force=True,
        )
    if metadata is not None:
        with open(os.path.join(directory, "metadata.json"), "w") as f:
            json.dump(_jsonify(metadata), f, indent=2)


def restore_checkpoint(
    directory: str, step: int | None = None, template: Any = None
) -> tuple[Any, dict]:
    """Restore the latest (or given) step. Returns (state_dict, metadata)."""
    directory = os.path.abspath(directory)
    if step is None:
        steps = [
            int(d.split("_", 1)[1])
            for d in os.listdir(directory)
            if d.startswith("step_")
        ]
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {directory}")
        step = max(steps)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            state = ckptr.restore(
                os.path.join(directory, f"step_{step}"), template
            )
        else:
            state = ckptr.restore(os.path.join(directory, f"step_{step}"))
    meta_path = os.path.join(directory, "metadata.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


def _jsonify(obj):
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj
