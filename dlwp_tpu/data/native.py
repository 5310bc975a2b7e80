"""Loader for the native (C) batch assembler.

The series sampler's per-batch gather (the host hot loop, SURVEY.md section
3.1) has a native implementation in ``native/batch_assembler.c``; this
module builds (once, cached in ``native/``) and loads it, exposing
:func:`assemble` with a numpy fallback of identical semantics.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_ext = None
_tried = False


def _load():
    global _ext, _tried
    if _ext is not None or _tried:
        return _ext
    _tried = True
    if _NATIVE_DIR not in sys.path:
        sys.path.insert(0, _NATIVE_DIR)
    try:
        import _batch_assembler  # type: ignore

        _ext = _batch_assembler
        return _ext
    except ImportError:
        pass
    # Attempt a one-time in-place build.
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        import _batch_assembler  # type: ignore

        _ext = _batch_assembler
    except Exception:
        _ext = None
    return _ext


def have_native() -> bool:
    return _load() is not None


def assemble(
    series: np.ndarray,
    samples: np.ndarray,
    offsets: np.ndarray,
    chan_idx: np.ndarray,
    n_threads: int = 4,
) -> np.ndarray:
    """out[b, t, c] = series[samples[b] + offsets[t], chan_idx[c]].

    Uses the native threaded gather when available and applicable
    (contiguous float32 input), else numpy.
    """
    ext = _load()
    samples = np.ascontiguousarray(samples, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    chan_idx = np.ascontiguousarray(chan_idx, dtype=np.int64)
    if (
        ext is not None
        and isinstance(series, np.ndarray)
        and series.dtype == np.float32
        and series.flags.c_contiguous
        and series.ndim == 4
    ):
        return ext.assemble(series, samples, offsets, chan_idx, n_threads)
    # numpy fallback (and oracle for tests)
    idx = samples[:, None] + offsets[None, :]
    return np.asarray(series)[idx][:, :, chan_idx]
