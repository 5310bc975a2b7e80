"""Measure the tunnel per-dispatch floor and floor-free per-step costs.

Motivation: the first perf_fold.py run timed a T72 B1 spectral round
trip at 28 ms -- impossible compute; every ``block_until_ready`` per
call pays the axon tunnel's host<->device round trip. This probe pins
that floor three ways:

1. trivial jitted op, timed per call (upper bound on the floor),
2. the same op dispatched R times and blocked ONCE (pipelined; floor
   amortizes to ~1/R),
3. two-point slope on the fused barotropic kernel and the flagship
   rollout scan (t(n2) - t(n1)) / (n2 - n1): pure per-step device cost,
   the floor cancels.

Use the slope for us/step claims and pipelined dispatch for throughput
claims; single-call timings are latency claims (they include the RTT).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def t_once(fn, *a, repeats=5):
    out = fn(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def t_pipelined(fn, *a, reps=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    floor = t_once(f, x)
    piped = t_pipelined(f, x)
    print(f"trivial jitted op: {1e3 * floor:.2f} ms/call single, "
          f"{1e3 * piped:.3f} ms/call pipelined x20", flush=True)

    # Fused barotropic step: slope between 500- and 2000-step calls.
    from dlwp_tpu.grid.latlon import LatLonGrid
    from dlwp_tpu.barotropic.model import BarotropicModelPsi

    grid = LatLonGrid.regular(73, 144)
    z = 100.0 * np.random.RandomState(0).randn(73, 144).astype(np.float32)
    for kwargs, name in (({}, "xla"), ({"step_impl": "pallas"}, "pallas")):
        model = BarotropicModelPsi(grid, truncation=72, dt=1800.0, **kwargs)
        s0 = model.from_z(jnp.asarray(z))
        t1 = t_once(lambda s: model.run(s, 500), s0, repeats=3)
        t2 = t_once(lambda s: model.run(s, 2000), s0, repeats=3)
        slope = (t2 - t1) / 1500
        print(f"psi {name}: t(500)={1e3 * t1:.1f} ms t(2000)={1e3 * t2:.1f} ms"
              f" -> slope {1e6 * slope:.1f} us/step ({1 / slope:.0f}/s);"
              f" single-call 500-step figure {1e6 * t1 / 500:.1f} us/step",
              flush=True)

    # Flagship rollout: slope between 64- and 256-step scans, batch 256.
    from __graft_entry__ import _flagship

    model, params, _ = _flagship(nlat=36, nlon=144, convlstm=False)
    batch = 256
    x0 = jnp.asarray(
        np.random.RandomState(0).randn(batch, 6, 36, 144), jnp.float32
    )

    def mk(steps):
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

        return rollout

    r64, r256 = mk(64), mk(256)
    t64 = t_once(r64, x0, repeats=3)
    t256 = t_once(r256, x0, repeats=3)
    slope = (t256 - t64) / 192  # s/step
    gp = batch * 36 * 144
    print(f"flagship rollout B256: t(64)={1e3 * t64:.1f} ms "
          f"t(256)={1e3 * t256:.1f} ms -> slope {1e6 * slope:.0f} us/step = "
          f"{gp / slope / 1e6:.0f} Mgp/s device rate; single-call 64-step "
          f"figure {gp * 64 / t64 / 1e6:.0f} Mgp/s", flush=True)
    tp = t_pipelined(r64, x0, reps=10)
    print(f"flagship rollout B256 x64 steps pipelined x10: "
          f"{1e3 * tp:.1f} ms/rollout = {gp * 64 / tp / 1e6:.0f} Mgp/s",
          flush=True)


if __name__ == "__main__":
    main()
