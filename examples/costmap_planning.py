#!/usr/bin/env python3
"""Planning from an occupancy costmap (the ROS costmap2d-shaped interface).

The reference stubs this path (``use_costmap`` exists but construction is
commented out at mppi_numba/terrain.py:698-747 and solve() asserts); this
engine completes it: the costmap provides no traction information, so
dynamics are nominal, lethal cells (> threshold) become the obstacle mask,
no-information cells (255) become the unknown mask, and planning runs
through the speed-map solve at full nominal speed.

    python examples/costmap_planning.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu import Config, MPPIPlanner, TDM, trial
from mppi_numba_tpu.terrain import TractionGrid


def make_costmap(H=24, W=30):
    """A lethal wall with an off-axis gap + an unexplored region the
    planner should treat cautiously + scattered lethal debris."""
    rng = np.random.RandomState(3)
    cm = np.zeros((H, W), dtype=np.uint8)
    cm[:, 14:16] = 220
    cm[14:19, 14:16] = 0     # gap, offset from the start-goal line
    cm[:8, 20:] = 255        # unexplored corner
    debris = (rng.rand(H, W) < 0.015) & (cm == 0)
    cm[debris] = 180                   # scattered lethal debris
    cm[4:13, :8] = np.where(cm[4:13, :8] == 220, 220, 0)   # clear start area
    cm[15:23, 22:29] = 0                                   # clear goal area
    return cm


def main():
    cm = make_costmap()
    H, W = cm.shape
    res = 0.5
    cfg = Config(T=4.0, dt=0.1, num_grid_samples=1,
                 num_control_rollouts=1024, max_speed_padding=2.0,
                 max_map_dim=(H + 4, W + 4), seed=0, use_costmap=True)
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    costmap_dict = dict(costmap=cm, res=res, xlimits=(0.0, W * res),
                        ylimits=(0.0, H * res), costmap_lethal_threshold=100)
    lin_tdm.set_TDM_from_costmap(costmap_dict)
    ang_tdm.set_TDM_from_costmap(costmap_dict)

    params = dict(dt=cfg.dt, x0=np.array([2.0, 4.0, 0.5]),
                  xgoal=np.array([13.0, 9.5]), goal_tolerance=0.5,
                  v_post_rollout=0.5, cvar_alpha=1.0, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.5, 2.0]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-np.pi, np.pi]),
                  obs_penalty=1e5, unknown_penalty=1e3)
    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)

    # Ground truth for simulation: full traction except lethal cells block.
    gt = np.ones((H, W), dtype=np.float32)
    gt[(cm > 100) & (cm != 255)] = 0.0
    grid = TractionGrid(gt, gt, res=res, xlimits=(0.0, W * res),
                        ylimits=(0.0, H * res))

    logger = trial(planner, grid, cfg.dt, max_steps=200, mppi_params=params,
                   return_history=True)
    xhist = logger.pop("xhist")
    logger.pop("uhist", None)
    print(logger)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(cm, origin="lower", cmap="Reds",
                  extent=(0, W * res, 0, H * res), alpha=0.8)
        ax.plot(xhist[:, 0], xhist[:, 1], "b.-", ms=3, label="trajectory")
        ax.plot(*params["x0"][:2], "go", ms=9, label="start")
        ax.plot(*params["xgoal"], "r*", ms=14, label="goal")
        ax.legend(loc="upper left")
        ax.set_title("Costmap planning: lethal walls (dark), unknown (255)")
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "costmap_planning.png")
        fig.savefig(out, dpi=110, bbox_inches="tight")
        print("saved", out)
    except Exception as e:  # noqa: BLE001
        print("(plot skipped: {})".format(e))


if __name__ == "__main__":
    main()
