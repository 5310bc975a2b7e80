"""Model persistence.

Equivalent of the reference's two-file scheme (``DLWP/util.py:126-192``:
Keras HDF5 + pickle with Keras objects nulled): the wrapper's config (layer
specs, scaler statistics, flags) pickles to ``<path>.pkl`` with the flax
module and trainer stripped, and the parameter pytree (as numpy arrays)
saves to ``<path>.params``. Reload rebuilds the flax module from the stored
specs and restores parameters into it (the analogue of re-injecting
``DLWP.custom`` custom_objects, util.py:171-174). History saves separately
as in util.py:151-153.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax


def save_model(model, file_path: str, history=None) -> None:
    """Save a DLWPNeuralNet-style wrapper: config pickle + params pickle."""
    state = model.__getstate__()
    params = state.pop("_params", None)
    with open(file_path + ".pkl", "wb") as f:
        pickle.dump({"class": type(model).__name__, "state": state}, f)
    if params is not None:
        with open(file_path + ".params", "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, params), f)
    if history is not None:
        with open(file_path + ".history", "wb") as f:
            pickle.dump(
                {"epoch": history.epoch, "history": history.history}, f
            )


def load_model(file_path: str, history: bool = False):
    """Load a saved model wrapper (reference util.py:156-192)."""
    from dlwp_tpu.models.api import DLWPFunctional, DLWPNeuralNet

    with open(file_path + ".pkl", "rb") as f:
        blob = pickle.load(f)
    classes = {
        "DLWPNeuralNet": DLWPNeuralNet,
        "DLWPFunctional": DLWPFunctional,
    }
    cls = classes[blob["class"]]
    state = blob["state"]
    try:
        with open(file_path + ".params", "rb") as f:
            state["_params"] = pickle.load(f)
    except FileNotFoundError:
        pass
    model = cls.__new__(cls)
    model.__setstate__(state)
    if history:
        try:
            with open(file_path + ".history", "rb") as f:
                h = pickle.load(f)
        except FileNotFoundError:
            h = None
        return model, h
    return model
