"""Joint zx+zh conv formulation A/B at the flagship (round 5b).

The round-4 verdict named "joint zx+zh formulation" as an untried lever
for the ConvLSTM recurrent step; the round-5 ladder landed everything
else (time-major zx, lhsdil upsample, small-T unroll, per-step input
convs) but never measured this one. The joint form runs steps t >= 1 of
the unrolled recurrence as ONE conv of concat([x_t, h_t], C) with the
channel-concatenated kernel (models/layers.py CONVLSTM_UNROLL_JOINT):
half the conv launches, but at dilation 2 the input taps must embed in
a dense 5x5 window, so MACs grow (C+F)*25 = 375 vs C*9 + F*9 = 135 per
output. Both convs are MXU-starved (K=108/N=48) -- only the full-model
A/B decides (per the round-5 methodological lesson, per-stage harnesses
measure themselves).

Harness note: a forward-only scan-of-applies of the flagship (the
perf_convlstm.py `timed` form) hits the forward-only compile pathology
on TPU (654-1338 s compiles, docs/ROUND_NOTES.md round 4), so this
probe A/Bs through `bench.bench_convlstm_rollout` -- the PRODUCT
rollout program and the accountable canonical number -- which compiles
normally, ABA to bound session drift.

Usage: python perf_convlstm_joint.py  (TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import bench

    rows = []
    for form in ("separate", "joint", "separate"):  # ABA for drift check
        os.environ["DLWP_CONVLSTM_JOINT"] = form
        gps, elapsed = bench.bench_convlstm_rollout()
        rows.append((form, gps))
        print(
            f"convlstm canonical rollout [{form:>8}]: "
            f"{gps / 1e6:7.1f} Mgp/s  ({elapsed * 1e3:.1f} ms/rollout)",
            flush=True,
        )
    a1, j, a2 = rows[0][1], rows[1][1], rows[2][1]
    base = max(a1, a2)
    print(
        f"joint vs separate: {100.0 * (j - base) / base:+.1f}% "
        f"(separate drift {100.0 * abs(a1 - a2) / base:.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
