#!/usr/bin/env python3
"""Closed-loop planning animation on a fixed hand-written semantic map.

Mirrors reference: planner_example_vis_gif.ipynb — a 12x6 world with a
vegetation block, closed-loop replanning with per-step rollout
visualization, rendered to an animated GIF (example_gifs/ equivalents).

Usage: python examples/planner_animation.py [tdm|det|speed|example] [alpha]

The reference's committed GIF set (example_gifs/) sweeps
cvar_obj_alpha in {0.4, 1.0} (tdm mode) and cvar_dyn_alpha in {0.4, 1.0}
(det mode); passing ``alpha`` reproduces those parameterizations.

``example`` reproduces example_gifs/planner_example_vis.gif itself: the
notebook's exact 12x6 world, task (x0=(1,1), goal at the far corner,
cvar_alpha=0.8, u_std=(2,2), 150 steps) and frame styling
(reference: planner_example_vis_gif.ipynb[cells 3, 7]), rendered through
``mppi_numba_tpu.visualization.render_episode_gif``.
"""

import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import animation

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu import Config, MPPIPlanner, TDM, make_benchmark_world
from mppi_numba_tpu.visualization import TDMVisualizer


def fixed_semantic_map():
    """A 12x6 map with a vegetation belt across the middle
    (hand-written, in the spirit of planner_example_vis_gif.ipynb[cell 3])."""
    sg = np.zeros((6, 12), dtype=np.int8)
    sg[2:4, 2:10] = 1
    sg[1, 5:8] = 1
    sg[4, 4:6] = 1
    return sg


def reference_example_grid():
    """The exact 12x6 world of planner_example_vis_gif.ipynb[cell 3]."""
    sg = np.zeros((12, 6), dtype=np.int8)
    sg[2:5, 0:4] = 1
    sg[7:10, 3:6] = 1
    return sg


def main_example_vis():
    """Reproduce example_gifs/planner_example_vis.gif (tdm mode, 150 steps,
    every step a frame, reference marker/legend styling)."""
    from mppi_numba_tpu.visualization import render_episode_gif

    world = make_benchmark_world(num_bins=20, rng=np.random.RandomState(2))
    sg = reference_example_grid()
    res = 1.0
    H, W = sg.shape
    max_speed = 3.0
    cfg = Config(T=10.0, dt=0.1, num_grid_samples=1024,
                 num_control_rollouts=1024, max_speed_padding=5.0,
                 num_vis_state_rollouts=100, max_map_dim=(15, 15), seed=1,
                 use_tdm=True)
    x0 = np.array([1.0, 1.0, 0.0])
    xgoal = np.array([W - 1.0, H - 1.0])
    params = dict(dt=cfg.dt, x0=x0, xgoal=xgoal, goal_tolerance=1.0,
                  v_post_rollout=0.01, cvar_alpha=0.8, alpha_dyn=1.0,
                  dist_weight=1, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([2.0, 2.0]),
                  vrange=np.array([0.0, max_speed]),
                  wrange=np.array([-np.pi, np.pi]))

    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    for tdm, pmfs in ((lin_tdm, world["lin_terrain2pmf"]),
                      (ang_tdm, world["ang_terrain2pmf"])):
        tdm.set_TDM_from_semantic_grid(
            sg, res, world["num_pmf_bins"], world["bin_values"],
            world["bin_values_bounds"], (0, W * res), (0, H * res),
            world["id2name"], world["name2terrain"], pmfs)

    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)
    traction_grid = lin_tdm.sample_grids_true_dist()

    frames = []
    x = x0.copy()
    xs = [x.copy()]
    for t in range(150):
        useq = planner.solve()
        u = useq[0]
        frames.append((np.array(xs), planner.get_state_rollout()))
        lt, at = traction_grid.get(x[0], x[1])
        x = x + cfg.dt * np.array([lt * u[0] * np.cos(x[2]),
                                   lt * u[0] * np.sin(x[2]), at * u[1]])
        xs.append(x.copy())
        planner.shift_and_update(x, useq, 1)

    vis = TDMVisualizer(lin_tdm)
    fig, ax = vis.draw(figsize=(8, 8))
    out = render_episode_gif(fig, ax, frames, x0, xgoal,
                             params["goal_tolerance"], cfg.dt,
                             "examples/planner_example_vis.gif")
    print("saved", out)


def main(mode="tdm", alpha=None):
    rng = np.random.RandomState(2)
    world = make_benchmark_world(num_bins=20, rng=rng)
    sg = fixed_semantic_map()
    res = 1.0
    H, W = sg.shape
    xlimits = (0, W * res)
    ylimits = (0, H * res)
    max_speed = 3.0

    cfg = Config(T=8.0, dt=0.1, num_grid_samples=1024,
                 num_control_rollouts=1024, max_speed_padding=max_speed + 2.0,
                 num_vis_state_rollouts=30 if mode == "tdm" else 1,
                 max_map_dim=(20, 26), seed=1,
                 use_tdm=mode == "tdm", use_det_dynamics=mode == "det",
                 use_nom_dynamics_with_speed_map=mode == "speed")
    if alpha is None:
        alpha = 0.4
    cvar_alpha = alpha if mode == "tdm" else 1.0
    alpha_dyn = 1.0 if mode == "tdm" else alpha

    x0 = np.array([0.5, 0.5, 0.0])
    xgoal = np.array([11.5, 5.5])
    params = dict(dt=cfg.dt, x0=x0, xgoal=xgoal, goal_tolerance=0.5,
                  v_post_rollout=0.01, cvar_alpha=cvar_alpha,
                  alpha_dyn=alpha_dyn, dist_weight=1, lambda_weight=1.0,
                  num_opt=1, u_std=np.array([2.0, 3.0]),
                  vrange=np.array([0.0, max_speed]),
                  wrange=np.array([-np.pi, np.pi]))

    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    det_alpha = None if mode == "tdm" else alpha_dyn
    for tdm, pmfs in ((lin_tdm, world["lin_terrain2pmf"]),
                      (ang_tdm, world["ang_terrain2pmf"])):
        tdm.set_TDM_from_semantic_grid(
            sg, res, world["num_pmf_bins"], world["bin_values"],
            world["bin_values_bounds"], xlimits, ylimits, world["id2name"],
            world["name2terrain"], pmfs, det_dynamics_cvar_alpha=det_alpha)

    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)
    traction_grid = lin_tdm.sample_grids_true_dist()

    frames = []
    x = x0.copy()
    xs = [x.copy()]
    for t in range(150):
        useq = planner.solve()
        u = useq[0]
        rollouts = planner.get_state_rollout()
        frames.append((np.array(xs), rollouts))
        lt, at = traction_grid.get(x[0], x[1])
        x = x + cfg.dt * np.array([lt * u[0] * np.cos(x[2]),
                                   lt * u[0] * np.sin(x[2]), at * u[1]])
        xs.append(x.copy())
        planner.shift_and_update(x, useq, 1)
        if np.linalg.norm(x[:2] - xgoal) <= params["goal_tolerance"]:
            print("goal reached at t={:.2f}s".format(t * cfg.dt))
            break

    vis = TDMVisualizer(lin_tdm)
    fig, ax = vis.draw(figsize=(8, 5))
    traj_line, = ax.plot([], [], "r", linewidth=2)
    roll_lines = [ax.plot([], [], "b", alpha=0.2)[0]
                  for _ in range(frames[0][1].shape[0])]
    ax.add_patch(plt.Circle(xgoal, params["goal_tolerance"], color="r",
                            fill=False))

    def update(i):
        traj, rollouts = frames[i]
        traj_line.set_data(traj[:, 0], traj[:, 1])
        for line, states in zip(roll_lines, rollouts):
            line.set_data(states[:, 0], states[:, 1])
        return [traj_line] + roll_lines

    anim = animation.FuncAnimation(fig, update, frames=len(frames),
                                   interval=100, blit=True)
    kind = "cvar_obj_alpha" if mode == "tdm" else "cvar_dyn_alpha"
    out = "examples/planner_{}_{}_{}.gif".format(mode, kind, alpha)
    anim.save(out, writer=animation.PillowWriter(fps=10))
    print("saved", out)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "example":
        main_example_vis()
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "tdm",
             float(sys.argv[2]) if len(sys.argv) > 2 else None)
