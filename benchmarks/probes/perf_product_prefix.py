"""Prefix-time the PRODUCT rollout step (VERDICT r3 item 5).

The headline bench moved from a hand-rolled channel splice (round 2:
1474 Mgp/s) to the product ``TimeSeriesEstimator.rollout_fn`` (round 3:
1259; round 4 post-insolation-factoring: 1216). This probe decomposes the
product step at the headline configuration (B=256, 36x144, fp32) into
cumulative variants, each measured by the two-point step-count slope
(64- vs 192-step scans; cancels the tunnel dispatch floor):

  1. apply-only        : model apply + naive feedback (keep x's SOL
                         channel untouched) -- the round-2 hand-rolled
                         formulation, carry only.
  2. +preds output     : same, but stacking per-step (out_ts, C_out)
                         predictions as the scan output (what predict()
                         returns).
  3. +splice           : full build_next slot/source splice, insolation
                         slot reused from the previous window (no sol
                         compute).
  4. full product      : est.rollout_fn verbatim (factored in-scan
                         insolation).

Run on TPU with PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from bench import _product_estimator


def slope(fn, x0, days, ms, n1=64, n3=192, repeats=3):
    f1, f3 = fn(n1), fn(n3)

    def timed(f):
        out = f(x0, days, ms)
        jax.block_until_ready(out)
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0, days, ms))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t3 = timed(f1), timed(f3)
    return max(t3 - t1, 1e-9) / (n3 - n1)


def main():
    B, nlat, nlon = 256, 36, 144
    est = _product_estimator(B, nlat, nlon)
    x0, days, ms, _ = est.prepare_inputs(np.arange(B))
    apply_fn = est.model.trainer.model.apply
    params = est.model.trainer.params
    in_ts, out_ts = est._in_ts, est._out_ts
    n_out = len(est._output_names)
    H, W = nlat, nlon
    gp = B * nlat * nlon

    def model_step(x):
        inp = x.reshape(B, in_ts * x.shape[2], H, W)
        pred = apply_fn(params, inp)
        return pred.reshape(B, out_ts, n_out, H, W)

    # -- 1. apply-only: naive feedback, carry only ------------------------
    def naive_next(x, pred):
        # predicted channels into their slots; SOL channel kept from x.
        slots = []
        for m in range(in_ts):
            ch = [pred[:, m, j] for j in range(n_out)] + [x[:, m, n_out]]
            slots.append(jnp.stack(ch, axis=1))
        return jnp.stack(slots, axis=1)

    def mk_apply_only(steps):
        @jax.jit
        def run(x, days, ms):
            def body(x, _):
                pred = model_step(x)
                return naive_next(x, pred), ()
            x, _ = lax.scan(body, x, None, length=steps)
            return jnp.mean(x)
        return run

    # -- 2. + preds output --------------------------------------------------
    def mk_with_preds(steps):
        @jax.jit
        def run(x, days, ms):
            def body(x, _):
                pred = model_step(x)
                return naive_next(x, pred), pred
            _, preds = lax.scan(body, x, None, length=steps)
            return jnp.mean(preds)
        return run

    # -- 3. + full splice, SOL slot mean-imputed (no sol compute) ----------
    def mk_variant(steps, sol="full"):
        if sol == "none":
            # monkeypatch: replace the per-step insolation with a reuse of
            # the previous window's SOL channel by marking the source map.
            saved = est._sources
            est._sources = [
                (k if k != "sol" else "impute", i if k != "sol" else n_out)
                for (k, i) in saved
            ]
            try:
                fn = est.rollout_fn(steps)
            finally:
                est._sources = saved
        else:
            fn = est.rollout_fn(steps)

        @jax.jit
        def run(x, days, ms2):
            return jnp.mean(fn(x, days, ms2))

        return run

    labels = [
        ("1. apply-only (hand-rolled, carry only)", mk_apply_only),
        ("2. + per-step preds output", mk_with_preds),
        ("3. + full splice, SOL imputed (no sol compute)",
         lambda s: mk_variant(s, "none")),
        ("4. full product rollout_fn", lambda s: mk_variant(s, "full")),
    ]
    for label, mk in labels:
        per = slope(mk, x0, days, ms)
        print(f"{label:48s}: {per*1e6:7.1f} us/step -> "
              f"{gp/per/1e6:7.1f} Mgp/s", flush=True)


if __name__ == "__main__":
    main()
