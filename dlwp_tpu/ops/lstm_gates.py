"""ConvLSTM gate chain fused into one Pallas VMEM pass.

Motivation (measured, BASELINE.md round-4 "ConvLSTM gate chain"): at the
canonical flagship configuration the recurrent gate chain is *bandwidth*-
bound, not transcendental-bound — swapping hard_sigmoid for sigmoid gates
changes nothing (80.4 vs 80.6 Mgp/s apply), while computing the identical
chain in bfloat16 (half the HBM bytes) gains +29%. XLA materializes the
intermediate ``z = zx + zh + bias`` (a 4F-channel full-resolution array)
and several gate products between the two convolutions and the carry
update. This kernel reads ``zx``, ``zh``, ``c`` once, computes

    i, f, g, o = split(zx + zh + bias, 4)
    c' = ra(f) * c + ra(i) * a(g)
    h' = ra(o) * a(c')

entirely in VMEM, and writes ``h'``, ``c'`` once — the minimum possible
HBM traffic for the op (reference semantics: Keras ConvLSTM2D step,
reference train.py:144-157; the splice math mirrors
``models.layers.ConvLSTM2D`` exactly, same op order).

Differentiable: ``custom_vjp`` whose backward recomputes through the plain
jnp formulation (the repo-wide pattern for Pallas fast paths,
``parallel/pallas_overlap.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Supported activations (local map: ops must not import models).
_ACTS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "hard_sigmoid": lambda x: jnp.clip(0.2 * x + 0.5, 0.0, 1.0),
    "linear": lambda x: x,
}


def _act(name):
    if callable(name):
        return name
    try:
        return _ACTS[name]
    except KeyError:
        raise ValueError(
            f"fused gates support activations {sorted(_ACTS)}, got {name!r}"
        ) from None


def lstm_gates_reference(zx, zh, c, activation="tanh",
                         recurrent_activation="hard_sigmoid",
                         gate_dtype=None):
    """Plain-XLA gate chain; op order identical to the Pallas kernel (and
    to ``ConvLSTM2D``'s in-scan math). ``zx`` carries the bias (it is
    added once, outside the recurrence, where XLA folds it into the
    batched input-conv epilogue — Mosaic cannot lower a 1-D→3-D
    broadcast reshape in-kernel)."""
    act, r_act = _act(activation), _act(recurrent_activation)
    z = zx + zh
    if gate_dtype is not None:
        z = z.astype(gate_dtype)
    i, f, g, o = jnp.split(z, 4, axis=-3)
    if gate_dtype is None:
        c_new = r_act(f) * c + r_act(i) * act(g)
        h_new = r_act(o) * act(c_new)
        return h_new, c_new
    c_new = (r_act(f) * c.astype(gate_dtype) + r_act(i) * act(g)).astype(
        c.dtype
    )
    h_new = (r_act(o) * act(c_new.astype(gate_dtype))).astype(c.dtype)
    return h_new, c_new


def _gates_kernel(zx_ref, zh_ref, c_ref, h_out, c_out, *,
                  F, act, r_act, gate_dtype):
    z = zx_ref[0] + zh_ref[0]  # (4F, H, W); bias folded into zx
    if gate_dtype is not None:
        z = z.astype(gate_dtype)
    i = z[0:F]
    f = z[F:2 * F]
    g = z[2 * F:3 * F]
    o = z[3 * F:4 * F]
    c = c_ref[0]
    if gate_dtype is None:
        c_new = r_act(f) * c + r_act(i) * act(g)
        h_new = r_act(o) * act(c_new)
    else:
        c_new = (r_act(f) * c.astype(gate_dtype)
                 + r_act(i) * act(g)).astype(c.dtype)
        h_new = (r_act(o) * act(c_new.astype(gate_dtype))).astype(c.dtype)
    h_out[0] = h_new
    c_out[0] = c_new


def _pallas_gates(zx, zh, c, activation, recurrent_activation,
                  gate_dtype):
    B, C4, H, W = zx.shape
    F = C4 // 4
    kern = partial(
        _gates_kernel, F=F, act=_act(activation),
        r_act=_act(recurrent_activation), gate_dtype=gate_dtype,
    )
    blk_z = pl.BlockSpec((1, C4, H, W), lambda b: (b, 0, 0, 0))
    blk_c = pl.BlockSpec((1, F, H, W), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[blk_z, blk_z, blk_c],
        out_specs=[blk_c, blk_c],
        out_shape=[
            jax.ShapeDtypeStruct((B, F, H, W), c.dtype),
            jax.ShapeDtypeStruct((B, F, H, W), c.dtype),
        ],
        # CPU: interpret mode (tests / parity oracles), as in
        # barotropic/pallas_step.py.
        interpret=jax.default_backend() == "cpu",
    )(zx, zh, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_lstm_gates(zx, zh, c, activation="tanh",
                     recurrent_activation="hard_sigmoid", gate_dtype=None):
    """One-HBM-pass LSTM gate chain: ``(h', c')`` from bias-carrying
    input-conv output ``zx`` (B, 4F, H, W), recurrent-conv output ``zh``
    (B, 4F, H, W), carry ``c`` (B, F, H, W)."""
    return _pallas_gates(zx, zh, c, activation, recurrent_activation,
                         gate_dtype)


def _fwd(zx, zh, c, activation, recurrent_activation, gate_dtype):
    out = _pallas_gates(zx, zh, c, activation, recurrent_activation,
                        gate_dtype)
    return out, (zx, zh, c)


def _bwd(activation, recurrent_activation, gate_dtype, res, cts):
    zx, zh, c = res
    _, vjp = jax.vjp(
        lambda a, b, cc: lstm_gates_reference(
            a, b, cc, activation, recurrent_activation, gate_dtype
        ),
        zx, zh, c,
    )
    return vjp(tuple(cts))


fused_lstm_gates.defvjp(_fwd, _bwd)
