"""Spherical-geometry padding primitives.

Functional equivalents of the reference's padding layers
(``DLWP/custom.py``): ``PeriodicPadding2D/3D`` (custom.py:139-306, wraparound
for longitude periodicity), ``FillPadding2D/3D`` (custom.py:309-524,
edge-replication as the pole treatment), and ``TFPadding2D/3D``
(custom.py:527-672, constant/symmetric/reflect modes).

Unlike the reference (Keras layer classes doing concat of edge slices), these
are pure functions on the trailing (lat, lon) axes of arrays of any rank, so
they compose with arbitrary batch/channel/time leading axes and fuse under
XLA. Padding amounts follow the Keras convention
``((top, bottom), (left, right))`` or a single symmetric tuple/int.
"""

from __future__ import annotations

import jax.numpy as jnp


def _norm_padding(padding) -> tuple[tuple[int, int], tuple[int, int]]:
    if isinstance(padding, int):
        return (padding, padding), (padding, padding)
    a, b = padding
    if isinstance(a, int):
        return (a, a), (b, b)
    return tuple(a), tuple(b)


def _trailing_pad(x, hw_pad, mode, **kw):
    pad = [(0, 0)] * (x.ndim - 2) + list(hw_pad)
    return jnp.pad(x, pad, mode=mode, **kw)


def pad_periodic(x, padding=(1, 1)):
    """Wraparound padding on the trailing (lat, lon) axes.

    Matches ``PeriodicPadding2D`` (custom.py:196-213): left pad takes columns
    from the right edge and vice versa; same for rows. Typical use is
    longitude-only wrap, e.g. ``padding=((0, 0), (2, 2))`` before a VALID
    conv (the reference's canonical ``PeriodicPadding2D(padding=(0, 2))``,
    examples/train.py:152).
    """
    (t, b), (l, r) = _norm_padding(padding)
    return _trailing_pad(x, [(t, b), (l, r)], "wrap")


def pad_fill(x, padding=(1, 1)):
    """Edge-replication padding (``FillPadding2D``, custom.py:309-402):
    repeats the boundary row/column, the reference's alternative pole
    treatment ('fillpad' models, examples/validate.py:37)."""
    (t, b), (l, r) = _norm_padding(padding)
    return _trailing_pad(x, [(t, b), (l, r)], "edge")


def pad_constant(x, padding=(1, 1), value=0.0):
    """Constant padding (``TFPadding2D`` CONSTANT mode / ZeroPadding2D)."""
    (t, b), (l, r) = _norm_padding(padding)
    return _trailing_pad(x, [(t, b), (l, r)], "constant", constant_values=value)


def pad_reflect(x, padding=(1, 1), symmetric: bool = False):
    """Reflect/symmetric padding (``TFPadding2D`` REFLECT/SYMMETRIC modes,
    custom.py:527-599)."""
    (t, b), (l, r) = _norm_padding(padding)
    return _trailing_pad(x, [(t, b), (l, r)], "symmetric" if symmetric else "reflect")


def pad_latlon(x, lat_padding: tuple[int, int], lon_padding: tuple[int, int],
               lat_mode: str = "zero"):
    """Combined spherical padding: periodic in longitude, configurable at the
    latitude boundaries ('zero' | 'edge' | 'reflect' | 'symmetric').

    This is the fused form of the reference's canonical layer stack
    ``PeriodicPadding2D((0, w)) -> ZeroPadding2D((h, 0))``
    (examples/train.py:152-155) in one call.
    """
    x = pad_periodic(x, ((0, 0), lon_padding))
    if lat_padding == (0, 0):
        return x
    if lat_mode == "zero":
        return pad_constant(x, (lat_padding, (0, 0)))
    if lat_mode == "edge":
        return pad_fill(x, (lat_padding, (0, 0)))
    if lat_mode in ("reflect", "symmetric"):
        return pad_reflect(x, (lat_padding, (0, 0)), symmetric=lat_mode == "symmetric")
    raise ValueError(f"unknown lat_mode {lat_mode!r}")
