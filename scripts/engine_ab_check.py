#!/usr/bin/env python3
"""Device-vs-host trial-engine A/B on identical paired environments.

The two benchmark engines intentionally differ in ONE semantic:

* ``benchmark.run_trials`` (host) reproduces the reference's exact
  sequencing (reference: benchmark.ipynb[cell 4]) — the planner is NOT
  reset between the realizations of an environment, so the warm-started
  control sequence (and the stale ``params['x0']``) carries into the next
  trial's first solve.
* ``benchmark.run_trials_device`` starts every episode from a fresh warm
  start (episodes are batched concurrently on device, so carry-over is
  impossible by construction).

Both engines draw their per-solve noise/map samples from different RNG
streams, so individual trials are not comparable; this script quantifies
the ENGINE effect statistically on the same (density x env x realization)
grid: per-method success rate and mean time-to-goal, with a paired
per-trial outcome-agreement rate.  Run on TPU (default platform) or CPU:

    python scripts/engine_ab_check.py [--envs 5] [--trials 3] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(envs, trials, methods, alphas, max_steps, host, small=False,
          densities=(1.0, 0.4)):
    import mppi_numba_tpu as m
    from mppi_numba_tpu.benchmark import run_trials, run_trials_device

    # The world's GaussianMixtures hold a stateful RandomState consumed by
    # ground-truth realization draws — rebuild per engine so both engines
    # see IDENTICAL realizations (generation order is identical: both
    # engines pre-generate (density, env, realization) in the same loops).
    world = m.make_benchmark_world(num_bins=20, rng=np.random.RandomState(0))
    K, M = (256, 64) if small else (1024, 1024)
    cfg = m.Config(T=10.0, dt=0.1, num_grid_samples=M,
                   num_control_rollouts=K, max_speed_padding=5.0,
                   num_vis_state_rollouts=1, max_map_dim=(15, 15), seed=1,
                   use_tdm=True)
    params = m.default_benchmark_params(cfg, (9, 9), 1)
    params["u_std"] = np.array([2.0, 2.0])
    fn = run_trials if host else run_trials_device
    return fn(cfg, world, max_steps, (9, 9), 1, 1.0, params,
              grass_density_list=list(densities), envs_per_density=envs,
              trials_per_env=trials, alpha_list=alphas,
              method_list=methods, verbose=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=5)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=150)
    ap.add_argument("--methods", default="noisy_dyn,risk_dyn")
    ap.add_argument("--alphas", default="1.0,0.5")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="K=256/M=64 instead of flagship shapes (CPU smoke)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    methods = args.methods.split(",")
    alphas = [float(a) for a in args.alphas.split(",")]
    df_host = build(args.envs, args.trials, methods, alphas,
                    args.max_steps, host=True, small=args.small)
    df_dev = build(args.envs, args.trials, methods, alphas,
                   args.max_steps, host=False, small=args.small)

    keys = ["method", "alpha", "grass_density_index", "sem_map_index",
            "map_sample_index"]
    merged = df_host.merge(df_dev, on=keys, suffixes=("_host", "_dev"))
    assert len(merged) == len(df_host) == len(df_dev)

    out = {"n_trials_per_engine": len(df_host)}
    for meth in methods:
        sub = merged[merged.method == meth]
        sh = float(sub.success_host.mean())
        sd = float(sub.success_dev.mean())
        # Guard the success-conditioned means: a hard config can yield zero
        # successes for one engine; emit null rather than NaN (NaN is not
        # valid strict JSON and poisons the deltas silently).
        th = (float(sub[sub.success_host].time_to_goal_host.mean())
              if sub.success_host.any() else None)
        td = (float(sub[sub.success_dev].time_to_goal_dev.mean())
              if sub.success_dev.any() else None)
        agree = float((sub.success_host == sub.success_dev).mean())
        out[meth] = dict(
            success_host=round(sh, 4), success_dev=round(sd, 4),
            success_delta=round(sd - sh, 4),
            ttg_host_s=None if th is None else round(th, 3),
            ttg_dev_s=None if td is None else round(td, 3),
            ttg_delta_s=(None if th is None or td is None
                         else round(td - th, 3)),
            paired_outcome_agreement=round(agree, 4))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
