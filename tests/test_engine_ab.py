"""Host-vs-device trial-engine statistical agreement (small scale).

The two engines differ ONLY in warm-start semantics (the host engine
preserves the reference's carry-over between realizations; the device
engine batches independent episodes) and in RNG streams.  On identical
paired environments their outcome STATISTICS must agree; scripts/
engine_ab_check.py quantifies this at benchmark scale on TPU, this test
pins the pairing machinery and a loose statistical bound on CPU.
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_engines_agree_statistically():
    from engine_ab_check import build

    kw = dict(envs=2, trials=2, methods=["risk_dyn"], alphas=[0.6],
              max_steps=150, small=True, densities=(0.1,))
    df_host = build(host=True, **kw)
    df_dev = build(host=False, **kw)

    keys = ["method", "alpha", "grass_density_index", "sem_map_index",
            "map_sample_index"]
    merged = df_host.merge(df_dev, on=keys, suffixes=("_host", "_dev"))
    # Pairing is exact: every (env, realization, alpha) appears in both.
    assert len(merged) == len(df_host) == len(df_dev) == 4

    # On the easiest density with a generous step budget both engines
    # should succeed on (nearly) all trials; the warm-start semantic
    # difference may flip at most one outcome at this scale.
    sh = merged.success_host.mean()
    sd = merged.success_dev.mean()
    assert sh >= 0.75 and sd >= 0.75, (sh, sd)
    assert abs(sh - sd) <= 0.25, (sh, sd)
    # Time-to-goal on successes within 2 s of each other on average.
    th = merged[merged.success_host].time_to_goal_host.mean()
    td = merged[merged.success_dev].time_to_goal_dev.mean()
    assert abs(th - td) <= 2.0, (th, td)
