#!/usr/bin/env python3
"""Barebone MPPI example: goal reaching with analytic circle obstacles.

Mirrors reference: barebone_mppi_numba.ipynb — K=1000 rollouts, T=5 s
horizon, two obstacles; plots the closed-loop trajectory and control
history, and reports the solve-rate (%timeit equivalent).
"""

import time

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu import BareboneConfig, BareboneMPPI


def main():
    cfg = BareboneConfig(T=5.0, dt=0.1, num_control_rollouts=1000,
                         num_vis_state_rollouts=20, seed=1)
    x0 = np.array([0, 0, np.pi / 4])
    xgoal = np.array([7, 5])
    obstacle_positions = np.array([[5, 4.5], [2, 1]])
    obstacle_radius = np.array([1.5, 1])

    mppi_params = dict(
        dt=cfg.dt, x0=x0, xgoal=xgoal,
        goal_tolerance=0.5, dist_weight=10,
        lambda_weight=1.0, num_opt=1,
        u_std=np.array([1.0, 1.0]),
        vrange=np.array([0.0, 2.0]),
        wrange=np.array([-np.pi, np.pi]),
        obstacle_positions=obstacle_positions,
        obstacle_radius=obstacle_radius,
        obs_penalty=1e6)

    planner = BareboneMPPI(cfg)
    planner.setup(mppi_params)

    # Timing probe (reference cell 6).
    planner.solve()
    n = 25
    t0 = time.perf_counter()
    for _ in range(n):
        planner.solve()
    print("solve(): {:.2f} ms avg over {} calls".format(
        1000 * (time.perf_counter() - t0) / n, n))

    planner.reset()
    planner.setup(mppi_params)

    max_steps = 151
    xhist = np.full((max_steps + 1, 3), np.nan)
    uhist = np.full((max_steps, 2), np.nan)
    xhist[0] = x0
    for t in range(max_steps):
        useq = planner.solve()
        u = useq[0]
        uhist[t] = u
        xhist[t + 1, 0] = xhist[t, 0] + cfg.dt * np.cos(xhist[t, 2]) * u[0]
        xhist[t + 1, 1] = xhist[t, 1] + cfg.dt * np.sin(xhist[t, 2]) * u[0]
        xhist[t + 1, 2] = xhist[t, 2] + cfg.dt * u[1]
        planner.shift_and_update(xhist[t + 1], useq, num_shifts=1)
        if np.linalg.norm(xhist[t + 1, :2] - xgoal) <= mppi_params["goal_tolerance"]:
            print("goal reached at t={:.2f}s".format(t * cfg.dt))
            break

    fig, (ax, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    ax.plot(xhist[:, 0], xhist[:, 1], "r", label="Trajectory")
    ax.plot(*x0[:2], "ro", markersize=10, markerfacecolor="none", label="Start")
    ax.add_patch(plt.Circle(xgoal, mppi_params["goal_tolerance"], color="b",
                            fill=False, label="Goal"))
    for pos, r in zip(obstacle_positions, obstacle_radius):
        ax.add_patch(plt.Circle(pos, r, color="k"))
    rollouts = planner.get_state_rollout()
    ax.plot(rollouts[:, :, 0].T, rollouts[:, :, 1].T, "k", alpha=0.3)
    ax.set_aspect("equal")
    ax.legend()
    ax2.plot(uhist[:, 0], label="v")
    ax2.plot(uhist[:, 1], label="w")
    ax2.legend()
    fig.tight_layout()
    fig.savefig("examples/barebone_mppi.png", dpi=120)
    print("saved examples/barebone_mppi.png")


if __name__ == "__main__":
    main()
