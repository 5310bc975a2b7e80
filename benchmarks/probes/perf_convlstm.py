"""Profile the ConvLSTM flagship: where do the 5 ms/application go?

Round-2 measured the ConvLSTM flagship rollout at 65.1 Mgp/s (batch 64)
= ~5.1 ms/application vs ~0.4 ms for the fused plain tower at that batch.
This script times the pieces: the ConvLSTM front end (batched input conv,
recurrent scan), the 24-channel tower, and the full composition.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_tpu.models import build_sequential
from dlwp_tpu.models.layers import ConvLSTM2D
from dlwp_tpu.ops.conv import cyclic_conv2d
from __graft_entry__ import _flagship, _tower_specs

B, T, C, H, W = 64, 2, 3, 36, 144
F = 12  # lstm features


def timed(fn, *args, steps=50, repeats=3):
    def body(c, _):
        y = fn(*(a * c if i == 0 else a for i, a in enumerate(args)))
        return 1.0 + 0.0 * jax.tree.leaves(y)[0].ravel()[0], ()

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


def main():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # Full flagship (ConvLSTM + tower)
    model, params, _ = _flagship()
    x5 = jnp.asarray(rng.randn(B, T, C, H, W), jnp.float32)
    t_full = timed(lambda a: model.apply(params, a), x5)
    print(f"full flagship apply : {t_full*1e6:8.1f} us", flush=True)

    # ConvLSTM front end alone
    lstm = ConvLSTM2D(F, 3, dilation=2, return_sequences=True,
                      activation="tanh")
    pl = lstm.init(key, x5)
    t_lstm = timed(lambda a: lstm.apply(pl, a), x5)
    print(f"ConvLSTM front end  : {t_lstm*1e6:8.1f} us", flush=True)

    # Tower alone on the stacked (24-ch) input
    tower = build_sequential(_tower_specs(T * 2))
    xt = jnp.asarray(rng.randn(B, T * F, H, W), jnp.float32)
    pt = tower.init(key, xt)
    t_tower = timed(lambda a: tower.apply(pt, a), xt)
    print(f"tower (24ch input)  : {t_tower*1e6:8.1f} us", flush=True)

    # ConvLSTM pieces: batched input conv; recurrent scan (conv + gates)
    Wx = jnp.asarray(rng.randn(4 * F, C, 3, 3) * 0.1, jnp.float32)
    Wh = jnp.asarray(rng.randn(4 * F, F, 3, 3) * 0.1, jnp.float32)
    bias = jnp.zeros((4 * F,), jnp.float32)

    def zx_conv(a):
        return cyclic_conv2d(
            a.reshape(B * T, C, H, W), Wx, dilation=(2, 2)
        ).reshape(B, T, 4 * F, H, W)

    t_zx = timed(zx_conv, x5)
    print(f"  input conv (BT)   : {t_zx*1e6:8.1f} us", flush=True)

    zxs = jnp.asarray(rng.randn(T, B, 4 * F, H, W), jnp.float32)

    def recur(z):
        def step(carry, zx):
            h, c = carry
            zz = zx + cyclic_conv2d(h, Wh) + bias[:, None, None]
            i, f, g, o = jnp.split(zz, 4, axis=-3)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((B, F, H, W), jnp.float32)
        (_, _), hs = lax.scan(step, (h0, h0), z)
        return hs

    t_rec = timed(recur, zxs)
    print(f"  recurrent scan    : {t_rec*1e6:8.1f} us", flush=True)

    # recurrent conv alone (one step)
    h = jnp.asarray(rng.randn(B, F, H, W), jnp.float32)
    t_hconv = timed(lambda a: cyclic_conv2d(a, Wh), h)
    print(f"  h-conv (one step) : {t_hconv*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
