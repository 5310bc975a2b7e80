"""Barotropic T72 step attribution: where do the ~95 us/step go?

Times 500-step scans of (a) the full step, (b) the tendency alone,
(c) the FFT pair alone at the step's shapes, (d) the Legendre einsums
alone, on the real chip. Guides the matmul-DFT Fourier experiment.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.grid.latlon import LatLonGrid
from dlwp_tpu.barotropic.model import BarotropicModel, BarotropicModelPsi

STEPS = 500


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    grid = LatLonGrid.regular(73, 144)
    for cls in (BarotropicModel, BarotropicModelPsi):
        model = cls(grid, truncation=72, dt=1800.0)
        rng = np.random.RandomState(0)
        z = 100.0 * rng.randn(73, 144).astype(np.float32)
        state = model.from_z(jnp.asarray(z))

        t = timeit(lambda s: model.run(s, STEPS), state)
        print(f"{cls.__name__}: full step {1e6 * t / STEPS:.1f} us/step "
              f"({STEPS / t:.0f} steps/s)")

        sh = model.sh

        @jax.jit
        def tend_scan(v):
            def body(x, _):
                d = model._tendency(x)
                return x + 0.0 * d, None
            return jax.lax.scan(body, v, None, length=STEPS)[0]

        t = timeit(tend_scan, state.vrt_spec)
        print(f"  tendency-only scan: {1e6 * t / STEPS:.1f} us/step")

        # FFT pair at the step's shapes: one 3-field inverse + one 2-field
        # forward (vorticity form); psi-form: 2-field inverse x2 + 1 forward.
        @jax.jit
        def fft_scan(modes, g2):
            def body(carry, _):
                m3, g = carry
                grids = sh._inv_fourier(m3)  # (3, J, L)
                back = sh._fourier(g)        # (2, M, J)
                m3 = m3 + 0.0 * jnp.mean(grids) + 0.0 * jnp.mean(back.real)
                return (m3, g), None
            return jax.lax.scan(body, (modes, g2), None, length=STEPS)[0]

        base = jnp.broadcast_to(state.vrt_spec, (3, 73, 73))
        modes = jax.jit(lambda b: b * (1.0 + 0.5j))(base)
        g2 = jax.jit(
            lambda b: jnp.broadcast_to(sh.synthesize(b[0]), (2, 73, 144))
        )(base)
        t = timeit(fft_scan, modes, g2)
        print(f"  fft pair (3 inv + 2 fwd): {1e6 * t / STEPS:.1f} us/step")

        # Legendre contractions alone (vorticity form's stacked synthesis +
        # the vector analysis).
        @jax.jit
        def leg_scan(v):
            def body(x, _):
                syn = sh._legendre_syn(
                    getattr(model, "_syn_table", sh.P), x
                )
                N = sh.truncation + 1
                Au = jnp.concatenate([sh.AuPsi, sh.AuChi], axis=1)
                ana = sh._legendre_ana(Au, syn[..., : grid.nlat])
                return x + 0.0 * jnp.mean(ana), None
            return jax.lax.scan(body, v, None, length=STEPS)[0]

        t = timeit(leg_scan, state.vrt_spec)
        print(f"  legendre (1 syn + 1 ana): {1e6 * t / STEPS:.1f} us/step")


if __name__ == "__main__":
    main()
