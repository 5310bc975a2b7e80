"""Folded vs dense Legendre transform timings (T170 production class).

The fold halves contraction FLOPs/bytes; padded-tile analysis
(BASELINE.md) predicts the gain materializes at T ~ 170 (both layouts
pad ~1.5x) and washes out at T72 (folded K=37 pads 3.5x to the 128
lane tile). This probe measures both, single-field and batched.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.grid.latlon import LatLonGrid
from dlwp_tpu.spectral.transforms import SphericalHarmonics


def timeit(fn, *a, repeats=5):
    out = fn(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


REPS = 50  # in-graph repetitions: the tunnel's ~27 ms dispatch floor
#            otherwise swamps every per-call timing at these sizes
#            (first probe run measured 28 ms for a T72 B1 round trip).


def main():
    for (mk, J, L, T, B) in [
        ("gaussian", 192, 384, 170, 1),
        ("gaussian", 192, 384, 170, 16),
        ("regular", 361, 720, 170, 1),
        ("regular", 73, 144, 72, 1),
        ("regular", 73, 144, 72, 64),
    ]:
        grid = getattr(LatLonGrid, mk)(J, L)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, J, L).squeeze(), jnp.float32)
        for fold in (False, True):
            sh = SphericalHarmonics.build(grid, T, fold=fold)

            @jax.jit
            def rt(v, sh=sh):
                spec0 = sh.analyze(v)
                spec = jax.lax.fori_loop(
                    0, REPS,
                    lambda i, s: sh.analyze(sh.synthesize(s)),
                    spec0,
                )
                return spec
            t = timeit(rt, x)
            print(f"{mk} {J}x{L} T{T} B{B} fold={fold}: "
                  f"{1e3 * t / REPS:.3f} ms/round-trip "
                  f"(x{REPS} in-graph)", flush=True)


if __name__ == "__main__":
    main()
