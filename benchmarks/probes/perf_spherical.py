"""Spectral spherical-conv (s2cnn-equivalent) throughput on TPU.

The new ``S2Convolution`` (models/spherical.py) is three MXU contractions
(analysis matmuls, per-degree channel einsum, synthesis matmuls). This
measures the reference train_torch.py architecture (two spherical layers +
linear read-out, train_torch.py:100-114) and the layers in isolation, at
the reference 2.5-degree grid (73x144, b_in=36) and at a production
0.5-degree-like width, against the only baseline that exists for this path:
s2cnn is a CUDA library the reference calls "yet to produce good results"
(README.md:75) and publishes no numbers for -- so the rows here are the
recorded TPU facts, not a comparison.

Timing: in-graph scan over applications (dispatch floor amortized), min of
3 repeats. Run on TPU; do NOT override PYTHONPATH.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.models.spherical import S2Convolution, s2_near_identity_grid
from dlwp_tpu.utils.compile_safe import compile_forward_safe


def timed_apply(fn, steps=10, repeats=3):
    def body(c, _):
        y = fn(c)
        return 1.0 + 0.0 * y.ravel()[0], ()

    @jax.jit
    def loop():
        c, _ = lax.scan(body, jnp.float32(1.0), None, length=steps)
        return c

    jax.block_until_ready(loop())
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop())
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps


def timed_apply_safe(apply_params_fn, params, steps=10, repeats=3):
    """Apply timing in the compile_forward_safe form: the scan body runs
    the apply under value_and_grad-with-discarded-grads (w.r.t. params),
    the fwd+bwd program class that compiles in seconds where the
    forward-only scan of this stack never finishes (ROUND_NOTES round 4).
    The reported time therefore UPPER-bounds the pure apply (it includes a
    discarded backward pass)."""
    safe = compile_forward_safe(apply_params_fn)

    def body(carry, _):
        p, c = carry
        y = safe(p, c)
        return (p, 1.0 + 0.0 * y.ravel()[0]), ()

    @jax.jit
    def loop(p):
        (_, c), _ = lax.scan(body, (p, jnp.float32(1.0)), None, length=steps)
        return c

    jax.block_until_ready(loop(params))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(params))
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps


def stack(c_in, c_out, nlat, nlon, b_in, trunc, feat):
    grid = s2_near_identity_grid()
    n_features = c_out * nlat * nlon
    return build_sequential([
        ("S2Convolution", (c_in, feat, b_in, trunc, grid),
         {"mean_gamma": True, "activation": "tanh"}),
        ("S2Convolution", (feat, feat, trunc, trunc, grid),
         {"mean_gamma": True, "activation": "tanh"}),
        ("TorchReshape", ((-1, feat * (2 * trunc) ** 2),), None),
        ("Linear", (feat * (2 * trunc) ** 2, n_features), None),
        ("TorchReshape", ((-1, c_out, nlat, nlon),), None),
    ])


def timed_grad_step(model, params, x, steps=10, repeats=3):
    """Train-step-form timing: fwd+bwd+SGD inside the scan.

    Forward-only scan programs of this stack do not finish remote
    compilation within 25 min (ROUND_NOTES.md round 4 — same pathology as
    repro_eval_fault.py's 654-1338 s forward-only compiles vs 15 s with a
    backward pass), so the recorded TPU row is the training step, the
    faster-compiling program class that *contains* the apply.
    """

    def loss(p, xin):
        return jnp.mean(model.apply(p, xin) ** 2)

    def body(carry, _):
        p, c = carry
        l, g = jax.value_and_grad(loss)(p, x * c)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)
        return (p, 1.0 + 0.0 * l), ()

    @jax.jit
    def loop(p):
        (p, c), _ = lax.scan(body, (p, jnp.float32(1.0)), None, length=steps)
        return c

    jax.block_until_ready(loop(params))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(params))
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps


def _time_one(form, model, params, x, steps, repeats):
    if form == "fwd":
        return timed_apply(
            lambda c: model.apply(params, x * c), steps, repeats
        )
    if form == "safe":
        return timed_apply_safe(
            lambda p, c: model.apply(p, x * c), params, steps, repeats
        )
    if form == "grad":
        return timed_grad_step(model, params, x, steps, repeats)
    raise ValueError(form)


def main(form="safe", steps=10, repeats=3):
    """``form``: 'fwd' = forward-only scan (known to never finish remote
    TPU compilation for this stack — CPU only); 'safe' = apply under
    compile_forward_safe (the recorded TPU apply row; includes a discarded
    backward pass, so it upper-bounds the apply); 'grad' = full
    fwd+bwd+SGD train step."""
    rng = np.random.RandomState(0)
    print(f"form={form} platform={jax.default_backend()}", flush=True)

    # Reference configuration: 73x144 (2.5 deg), b_in=36, T=12, 16 feat
    # (train_torch.py:101-110), batch 64.
    for label, B, nlat, nlon, b_in, trunc, feat in (
        ("ref 2.5deg stack (73x144, b36->12, f16)", 64, 73, 144, 36, 12, 16),
    ):
        model = stack(3, 3, nlat, nlon, b_in, trunc, feat)
        x = jnp.asarray(rng.randn(B, 3, nlat, nlon), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        dt = _time_one(form, model, params, x, steps, repeats)
        gps = B * nlat * nlon / dt / 1e6
        print(f"{label} [{form}]: {dt*1e6:.0f} us/step, {gps:.1f} Mgp/s",
              flush=True)

    # Isolated layers (no read-out): keep_shape at the data grid, and the
    # production 0.5-degree-like width (the Linear read-out does not scale
    # there -- a b90 stack would need a 14G-parameter read-out, so wide
    # models would pair the spherical front end with a conv head instead).
    for label, B, C, nlat, nlon, b in (
        ("single S2Conv 16ch b36 keep_shape (73x144, B=64)", 64, 16, 73, 144, 36),
        ("single S2Conv 16ch b90 keep_shape (180x720, B=16)", 16, 16, 180, 720, 90),
    ):
        layer = S2Convolution(C, C, b, b, None, keep_shape=True)
        x = jnp.asarray(rng.randn(B, C, nlat, nlon), jnp.float32)
        p = layer.init(jax.random.PRNGKey(0), x)
        dt = _time_one(form, layer, p, x, steps, repeats)
        print(f"{label} [{form}]: {dt*1e6:.0f} us/step, "
              f"{B*nlat*nlon/dt/1e6:.1f} Mgp/s", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--form", choices=("fwd", "safe", "grad"),
                    default="safe")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    a = ap.parse_args()
    main(a.form, a.steps, a.repeats)
