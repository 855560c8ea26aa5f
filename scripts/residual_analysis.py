#!/usr/bin/env python3
"""Reproduce the round-4 time-to-goal residual decomposition (CPU-only).

Regenerates every number in BENCHMARK_RESULTS.md's "Residual time-to-goal
decomposition" section from the two committed 16,000-trial datasets:

1. Env-clustered z-scores: the reference generates its benchmark
   environments with the UNSEEDED global NumPy RNG
   (reference: benchmark.ipynb[cell 4]), so its 160 semantic maps cannot
   be reproduced and trial pairing is impossible — the honest comparison
   is mean ± env-clustered SE per method.
2. Matched-success trimming: the proposed methods succeed MORE often than
   the paper run; dropping our slowest successes down to the paper's
   success rate upper-bounds that selection effect on the success-only
   time-to-goal mean.
3. Stratum decomposition of noisy_dyn at alpha=1.0 by grass density.

Usage:
    python scripts/residual_analysis.py [ours.pickle] [reference.pickle]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mppi_numba_tpu.checkpoint import load_reference_experiment

OURS = "mppi_benchmark/envs_40_trials_5_densities_4_device_us2_dw3.pickle"
REF = "/root/reference/mppi_benchmark/envs_40_trials_5_densities_4_date_20220907-2234.pickle"


def env_stats(df):
    out = {}
    for m, g in df[df.success].groupby("method"):
        per_env = g.groupby(["grass_density_index",
                             "sem_map_index"])["time_to_goal"].mean()
        out[m] = dict(mean=g["time_to_goal"].mean(),
                      se=per_env.std(ddof=1) / np.sqrt(len(per_env)),
                      n_env=len(per_env))
    return out


def main():
    ours_path = sys.argv[1] if len(sys.argv) > 1 else OURS
    ref_path = sys.argv[2] if len(sys.argv) > 2 else REF
    with open(ours_path, "rb") as fh:
        odf = pickle.load(fh)["logger"]
    ref = load_reference_experiment(ref_path)["logger"]

    print("== env-clustered time-to-goal comparison (success-only) ==")
    rs, os_ = env_stats(ref), env_stats(odf)
    print(f"{'method':18s} {'ours':>6s} {'paper':>6s} {'delta':>6s} "
          f"{'SE':>6s} {'z':>5s}")
    for m in rs:
        d = os_[m]["mean"] - rs[m]["mean"]
        se = float(np.hypot(os_[m]["se"], rs[m]["se"]))
        print(f"{m:18s} {os_[m]['mean']:6.2f} {rs[m]['mean']:6.2f} "
              f"{d:+6.2f} {se:6.3f} {d / se:5.2f}")

    print("\n== matched-success trimmed means (selection-effect bound) ==")
    for m in ("noisy_dyn", "risk_dyn"):
        o, r = odf[odf.method == m], ref[ref.method == m]
        to = o[o.success].time_to_goal.sort_values()
        keep = int(round(r.success.mean() * len(o)))
        print(f"{m}: success {o.success.mean():.3f} vs paper "
              f"{r.success.mean():.3f}; ttg {to.mean():.2f} -> trimmed "
              f"{to.iloc[:keep].mean():.2f} vs paper "
              f"{r[r.success].time_to_goal.mean():.2f}")

    print("\n== noisy_dyn alpha=1.0 by grass density ==")
    for df, name in ((odf, "ours"), (ref, "paper")):
        g = df[(df.method == "noisy_dyn") & (df.alpha == 1.0)]
        s = g.groupby("grass_density").success.mean().round(3)
        t = g[g.success].groupby("grass_density").time_to_goal.mean().round(2)
        print(name, "success:", dict(s), "ttg:", dict(t))


if __name__ == "__main__":
    main()
