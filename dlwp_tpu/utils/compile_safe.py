"""Forward-only-compile workaround as API.

Certain forward-only program shapes pathologically slow down (5-90x) or
deterministically fault XLA:TPU compilation through the remote-PJRT stack:
the bisect in ``benchmarks/probes/repro_eval_fault.py`` (BASELINE.md round
4) pinned a latitude-WEIGHTED loss reduction inside a forward-only
sequence ``lax.scan`` at batch 32 on v5e as a hard worker fault, and
measured 654-1338 s compiles for forward-only variants vs 15 s for the
same computation with a backward pass attached (``jax.value_and_grad``).

:func:`compile_forward_safe` packages the known-good workaround — lower
the forward computation *under* ``value_and_grad`` and discard the
gradients — as a reusable wrapper, so call sites (validation eval,
rollout-only serving, perf probes of forward-only stacks) do not each
rediscover the trick. Cost: the backward pass roughly triples the FLOPs
and adds residual storage; use it only where the forward-only form is
known slow/faulty (see docs/DEPLOY.md "Forward-only programs on TPU").

Reference anchor: this protects the reference's standard validation-eval
workflow (EarlyStoppingMin on val_loss, DLWP/custom.py:99-136) on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _is_inexact(x) -> bool:
    return jnp.issubdtype(jnp.result_type(x), jnp.inexact)


def compile_forward_safe(fn=None, *, argnums=0):
    """Wrap a forward-only function so it lowers in the train-step-like
    (fwd+bwd) program form that is known-good on TPU.

    The wrapped function computes ``fn(*args, **kwargs)`` under
    ``jax.value_and_grad`` of a scalar probe (the sum of means of the
    inexact output leaves) with respect to the inexact leaves of
    ``args[argnums]``, returns the original output unchanged, and discards
    the gradients. Outputs are bitwise the values ``fn`` produces; only
    the lowered program shape changes.

    Args:
        fn: function returning an array or pytree of arrays. At least one
            output leaf and one leaf of the differentiated argument must be
            inexact (float/complex) so a backward pass exists.
        argnums: positional argument (int, or tuple of ints) to
            differentiate through — typically the parameters. Defaults to 0.

    Usage::

        safe_eval = compile_forward_safe(eval_fn)      # direct
        @compile_forward_safe(argnums=1)               # decorator w/ args
        def rollout(steps_const, params, x): ...
    """
    if fn is None:
        return functools.partial(compile_forward_safe, argnums=argnums)
    argnums_t = (argnums,) if isinstance(argnums, int) else tuple(argnums)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        for a in argnums_t:
            if a >= len(args):
                raise TypeError(
                    f"compile_forward_safe(argnums={argnums_t}): function "
                    f"called with only {len(args)} positional arguments"
                )
        # Differentiate only the inexact leaves of the selected arguments;
        # integer/bool leaves ride along un-differentiated.
        diff_leaves, treedefs, masks = [], [], []
        for a in argnums_t:
            leaves, treedef = jax.tree_util.tree_flatten(args[a])
            mask = [_is_inexact(l) for l in leaves]
            diff_leaves.append([l for l, m in zip(leaves, mask) if m])
            treedefs.append((treedef, leaves))
            masks.append(mask)
        if not any(len(dl) for dl in diff_leaves):
            raise TypeError(
                "compile_forward_safe: no inexact (float/complex) leaves in "
                f"argument(s) {argnums_t} to differentiate through; pass "
                "argnums pointing at a float-valued argument (e.g. the "
                "parameters)"
            )

        def probe(dl):
            call_args = list(args)
            for i, a in enumerate(argnums_t):
                treedef, leaves = treedefs[i]
                it = iter(dl[i])
                merged = [
                    next(it) if m else l for l, m in zip(leaves, masks[i])
                ]
                call_args[a] = jax.tree_util.tree_unflatten(treedef, merged)
            out = fn(*call_args, **kwargs)
            floats = [
                l for l in jax.tree_util.tree_leaves(out) if _is_inexact(l)
            ]
            if not floats:
                raise TypeError(
                    "compile_forward_safe: fn returned no inexact leaves; "
                    "a backward pass needs a float output to flow from"
                )
            # Scalar probe value is discarded; .real keeps it real-valued
            # for complex outputs (grad of a real scalar is defined).
            s = functools.reduce(
                lambda x, y: x + y,
                [jnp.mean(l).real.astype(jnp.float32) for l in floats],
            )
            return s, out

        (_, out), _ = jax.value_and_grad(probe, has_aux=True)(diff_leaves)
        return out

    return wrapped
