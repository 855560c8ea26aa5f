#!/usr/bin/env python3
"""Full reference-scale benchmark (reference: benchmark.ipynb[cell 5-7]):
3 methods x 4 vegetation densities x 10 envs x 5 alphas x 3 realizations =
1,800 closed-loop trials, on the device-batched engine.

Reference wall-clock on RTX 3070: 2,421 s.  Saves the DataFrame + full
experiment config to mppi_benchmark/ (same keys as the reference pickle).
"""

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mppi_numba_tpu as m
from mppi_numba_tpu.benchmark import run_trials_device


def main():
    world = m.make_benchmark_world(num_bins=20, rng=np.random.RandomState(0))
    cfg = m.Config(T=10.0, dt=0.1, num_grid_samples=1024,
                   num_control_rollouts=1024, max_speed_padding=5.0,
                   num_vis_state_rollouts=50, max_map_dim=(15, 15), seed=1,
                   use_tdm=True)
    grid_shape = (9, 9)
    mud_margin = 1
    res = 1.0
    max_steps = 150
    default_mppi_params = m.default_benchmark_params(cfg, grid_shape,
                                                     mud_margin)
    grass_density_list = [1.0, 0.7, 0.4, 0.1]
    envs_per_density = 10
    trials_per_env = 3
    alpha_list = [1.0, 0.8, 0.6, 0.4, 0.2]
    method_list = ["noisy_dyn", "risk_dyn", "nom_dyn_risk_cost"]

    t0 = time.time()
    df = run_trials_device(cfg, world, max_steps, grid_shape, mud_margin,
                           res, default_mppi_params, grass_density_list,
                           envs_per_density, trials_per_env, alpha_list,
                           method_list, verbose=True)
    wall = time.time() - t0
    print("Benchmark took {:.2f}s for {} trials (reference: 2421 s)".format(
        wall, len(df)))

    print("\nSuccess rate by method:")
    print(df.groupby("method")["success"].mean())
    print("\nSuccess rate by method x alpha:")
    print(df.groupby(["method", "alpha"])["success"].mean().unstack())
    print("\nMean time-to-goal on successes:")
    print(df[df.success].groupby("method")["time_to_goal"].mean())

    os.makedirs("mppi_benchmark", exist_ok=True)
    out = dict(
        logger=df, cfg=cfg, max_speed=3.0, max_steps=max_steps,
        grid_shape=grid_shape, mud_margin=mud_margin, res=res,
        num_pmf_bins=world["num_pmf_bins"], bin_values=world["bin_values"],
        bin_values_bounds=world["bin_values_bounds"],
        default_mppi_params=default_mppi_params,
        grass_density_list=grass_density_list,
        envs_per_density=envs_per_density, trials_per_env=trials_per_env,
        alpha_list=alpha_list, method_list=method_list,
        pmf_bounds=[0, 1.0], bush_weights=[0.6, 0.4], bush_means=[0, 0.8],
        bush_std=[0.15, 0.1], dirt_weights=[1], dirt_means=[0.65],
        dirt_std=[0.1], wall_clock_s=wall, engine="device")
    fname = "mppi_benchmark/envs_{}_trials_{}_densities_{}_device.pickle".format(
        envs_per_density, trials_per_env, len(grass_density_list))
    with open(fname, "wb") as fh:
        pickle.dump(out, fh)
    print("saved:", fname)


if __name__ == "__main__":
    main()
