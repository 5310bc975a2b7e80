"""One-off perf experiments for the flagship rollout (not part of the API).

Measures variants of the bench rollout to guide optimization: dtype
(fp32/bf16), batch size, and barotropic dtype. Prints a table to stdout.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.models import build_sequential


def make_model(c_out=4, dtype=jnp.float32):
    specs = [
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh", "dtype": dtype}),
        ("MaxPooling2D", (2,), None),
        ("CyclicConv2D", (64, 3), {"activation": "tanh", "dtype": dtype}),
        ("MaxPooling2D", (2,), None),
        ("CyclicConv2D", (128, 3), {"activation": "tanh", "dtype": dtype}),
        ("UpSampling2D", (2,), None),
        ("CyclicConv2D", (64, 3), {"activation": "tanh", "dtype": dtype}),
        ("UpSampling2D", (2,), None),
        ("CyclicConv2D", (32, 3), {"dilation": 2, "activation": "tanh", "dtype": dtype}),
        ("CyclicConv2D", (c_out, 5), {"activation": "linear", "dtype": dtype}),
    ]
    return build_sequential(specs)


def bench_rollout(batch, steps, dtype, nlat=36, nlon=144, repeats=3):
    model = make_model(dtype=dtype)
    c_in = 6
    x_init = jnp.zeros((batch, c_in, nlat, nlon), dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), x_init)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    x0 = jnp.asarray(
        np.random.RandomState(0).randn(batch, c_in, nlat, nlon), dtype=dtype
    )

    def step(x, _):
        pred = model.apply(params, x)
        nxt = jnp.concatenate(
            [pred[:, :2], x[:, 2:3], pred[:, 2:], x[:, 5:6]], axis=1
        )
        return nxt, pred[:, :1]

    @jax.jit
    def rollout(x):
        _, out = jax.lax.scan(step, x, None, length=steps)
        return out

    out = rollout(x0)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(rollout(x0))
        times.append(time.perf_counter() - t0)
    el = min(times)
    return batch * steps * nlat * nlon / el, el


def main():
    steps = 64
    results = []
    for dtype, batch in [
        (jnp.float32, 16),
        (jnp.bfloat16, 16),
        (jnp.float32, 64),
        (jnp.bfloat16, 64),
        (jnp.bfloat16, 256),
    ]:
        gps, el = bench_rollout(batch, steps, dtype)
        name = f"{np.dtype(dtype).name} b={batch}"
        print(f"{name:>22}: {gps/1e6:10.1f} Mgp/s  ({steps*batch/el:8.0f} samples-steps/s)", flush=True)
        results.append((name, gps))


if __name__ == "__main__":
    main()
