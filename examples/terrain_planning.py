#!/usr/bin/env python3
"""Terrain-aware planning example: random vegetation world, closed loop.

Mirrors reference: test.ipynb — builds a random 9x9 Dirt/Vegetation world
from Gaussian-mixture ground truth, plans with any of the three risk-aware
modes, and runs the closed loop against a frozen realization of the true
traction field.  Saves map + trajectory + rollout figures.

Usage: python examples/terrain_planning.py [tdm|det|speed]
"""

import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu import (Config, MPPIPlanner, TDM, make_benchmark_world,
                            make_semantic_grid)
from mppi_numba_tpu.visualization import TDMVisualizer


def main(mode="tdm"):
    rng = np.random.RandomState(1)
    world = make_benchmark_world(num_bins=20, rng=rng)
    grid_shape = (9, 9)
    mud_margin = 1
    res = 1.0
    sg = make_semantic_grid(grid_shape, mud_margin, 0.4, rng)
    xlimits = (0, grid_shape[1] * res)
    ylimits = (0, grid_shape[0] * res)
    max_speed = 3.0

    cfg = Config(
        T=10.0, dt=0.1, num_grid_samples=1024, num_control_rollouts=1024,
        max_speed_padding=max_speed + 2.0,
        num_vis_state_rollouts=100 if mode == "tdm" else 1,
        max_map_dim=(15, 15), seed=1,
        use_tdm=mode == "tdm", use_det_dynamics=mode == "det",
        use_nom_dynamics_with_speed_map=mode == "speed")

    cvar_alpha = 0.2 if mode == "tdm" else 1.0
    alpha_dyn = 1.0 if mode == "tdm" else 0.2

    x0 = np.array([mud_margin / 2, mud_margin / 2, np.pi / 4])
    xgoal = np.array([grid_shape[0] - mud_margin / 2,
                      grid_shape[0] - mud_margin / 2])
    mppi_params = dict(
        dt=cfg.dt, x0=x0, xgoal=xgoal, goal_tolerance=0.5,
        v_post_rollout=0.01, cvar_alpha=cvar_alpha, alpha_dyn=alpha_dyn,
        dist_weight=1, lambda_weight=1.0, num_opt=1,
        u_std=np.array([2.0, 3.0]), vrange=np.array([0.0, max_speed]),
        wrange=np.array([-np.pi, np.pi]))

    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    det_alpha = None if mode == "tdm" else alpha_dyn
    lin_tdm.set_TDM_from_semantic_grid(
        sg, res, world["num_pmf_bins"], world["bin_values"],
        world["bin_values_bounds"], xlimits, ylimits, world["id2name"],
        world["name2terrain"], world["lin_terrain2pmf"],
        det_dynamics_cvar_alpha=det_alpha)
    ang_tdm.set_TDM_from_semantic_grid(
        sg, res, world["num_pmf_bins"], world["bin_values"],
        world["bin_values_bounds"], xlimits, ylimits, world["id2name"],
        world["name2terrain"], world["ang_terrain2pmf"],
        det_dynamics_cvar_alpha=det_alpha)

    planner = MPPIPlanner(cfg)
    planner.setup(mppi_params, lin_tdm, ang_tdm)
    traction_grid = lin_tdm.sample_grids_true_dist()

    max_steps = 151
    xhist = np.full((max_steps + 1, 3), np.nan)
    xhist[0] = x0
    for t in range(max_steps):
        useq = planner.solve()
        u = useq[0]
        lt, at = traction_grid.get(xhist[t, 0], xhist[t, 1])
        xhist[t + 1, 0] = xhist[t, 0] + cfg.dt * lt * np.cos(xhist[t, 2]) * u[0]
        xhist[t + 1, 1] = xhist[t, 1] + cfg.dt * lt * np.sin(xhist[t, 2]) * u[0]
        xhist[t + 1, 2] = xhist[t, 2] + cfg.dt * at * u[1]
        planner.shift_and_update(xhist[t + 1], useq, num_shifts=1)
        if np.linalg.norm(xhist[t + 1, :2] - xgoal) <= mppi_params["goal_tolerance"]:
            print("goal reached at t={:.2f}s".format(t * cfg.dt))
            break

    vis = TDMVisualizer(lin_tdm)
    fig, ax = vis.draw(figsize=(6, 6))
    ax.plot(xhist[:, 0], xhist[:, 1], "r", linewidth=2, label="Trajectory")
    rollouts = planner.get_state_rollout()
    ax.plot(rollouts[:, :, 0].T, rollouts[:, :, 1].T, "b", alpha=0.2)
    ax.plot(*x0[:2], "ko", markersize=10, markerfacecolor="none")
    ax.add_patch(plt.Circle(xgoal, mppi_params["goal_tolerance"], color="r",
                            fill=False))
    fig.savefig("examples/terrain_planning_{}.png".format(mode), dpi=120)
    print("saved examples/terrain_planning_{}.png".format(mode))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tdm")
