#!/usr/bin/env python3
"""Planning from an externally supplied PMF grid (the learned-model path).

Mirrors the reference's README FAQ workflow (reference: README.md:138-152
and terrain.py:380-508): a perception stack hands the planner an int8
``(num_bins, H, W)`` PMF over traction per cell — here synthesized, in
deployment produced by a learned traversability model — and the TDM is
initialized via ``set_TDM_from_PMF_grid`` instead of semantic types.
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu import Config, MPPIPlanner, TDM


def synth_pmf_grid(num_bins=12, rows=30, cols=40, seed=0):
    """A synthetic 'learned' PMF: easy terrain with a low-traction swamp."""
    rng = np.random.RandomState(seed)
    bin_values = np.linspace(0.0, 1.0, num_bins)
    pmf = np.zeros((num_bins, rows, cols), dtype=np.int8)
    # Mostly confident high traction...
    hi = num_bins - 2
    pmf[hi] = 70
    pmf[hi + 1] = 30
    # ...with an uncertain swamp band.
    band = slice(rows // 3, rows // 2)
    pmf[:, band, :] = 0
    pmf[1, band, :] = 50
    pmf[hi, band, :] = 50
    assert (pmf.sum(0) == 100).all()
    return pmf, bin_values


def main():
    num_bins, rows, cols, res = 12, 30, 40, 0.5
    pmf, bin_values = synth_pmf_grid(num_bins, rows, cols)

    cfg = Config(T=8.0, dt=0.1, num_grid_samples=512,
                 num_control_rollouts=2048, max_speed_padding=4.0,
                 num_vis_state_rollouts=20, max_map_dim=(80, 100), seed=0,
                 use_tdm=True)
    tdm_dict = dict(res=res, xlimits=(0.0, cols * res),
                    ylimits=(0.0, rows * res), bin_values=bin_values,
                    bin_values_bounds=np.array([0.0, 1.0]),
                    det_dynamics_cvar_alpha=1.0)
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    lin_tdm.set_TDM_from_PMF_grid(pmf, tdm_dict)
    ang_tdm.set_TDM_from_PMF_grid(pmf, tdm_dict)

    params = dict(dt=cfg.dt, x0=np.array([2.0, 2.0, np.pi / 4]),
                  xgoal=np.array([18.0, 13.0]), goal_tolerance=0.5,
                  v_post_rollout=0.01, cvar_alpha=0.3, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([2.0, 3.0]), vrange=np.array([0.0, 3.0]),
                  wrange=np.array([-np.pi, np.pi]))
    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)
    useq = planner.solve()
    print("optimized first controls:", useq[:5])
    states = planner.get_state_rollout()
    print("rollout endpoints (first 5):", states[:5, -1, :2])


if __name__ == "__main__":
    main()
