"""Costmap planning mode — the reference's abandoned ROS-costmap path,
completed (reference: mppi_numba/terrain.py:698-747 commented out;
mppi.py:209-211 asserts False on use_costmap)."""

import numpy as np

from mppi_numba_tpu import Config, MPPIPlanner, TDM


def make_costmap(H=12, W=12):
    cm = np.zeros((H, W), dtype=np.uint8)
    cm[:, 6] = 200          # lethal wall column...
    cm[2:5, 6] = 10         # ...with a gap
    cm[8:, 9:] = 255        # a no-information corner
    return cm


def build(use_costmap=True, seed=2):
    cm = make_costmap()
    H, W = cm.shape
    kw = dict(use_costmap=True) if use_costmap else \
        dict(use_nom_dynamics_with_speed_map=True)
    cfg = Config(T=3.0, dt=0.1, num_grid_samples=1, num_control_rollouts=256,
                 max_speed_padding=2.0, max_map_dim=(16, 16), seed=seed, **kw)
    tdm_pair = []
    for _ in range(2):
        tdm = TDM(cfg)
        if use_costmap:
            tdm.set_TDM_from_costmap(dict(
                costmap=cm, res=1.0, xlimits=(0.0, float(W)),
                ylimits=(0.0, float(H)), costmap_lethal_threshold=100))
        else:
            # The hand-built equivalent through the speed-map path: nominal
            # 2-bin PMF + explicit masks (risk of a one-hot-at-1 PMF is 100).
            pmf = np.zeros((2, H, W), dtype=np.int8)
            pmf[-1] = 100
            no_info = cm == 255
            lethal = (cm > 100) & ~no_info
            tdm.set_TDM_from_PMF_grid(
                pmf, dict(res=1.0, xlimits=(0.0, float(W)),
                          ylimits=(0.0, float(H)),
                          bin_values=np.array([0.0, 1.0]),
                          bin_values_bounds=np.array([0.0, 1.0]),
                          det_dynamics_cvar_alpha=1.0),
                obstacle_map=lethal.astype(np.int8),
                unknown_map=no_info.astype(np.int8))
        tdm_pair.append(tdm)
    params = dict(dt=cfg.dt, x0=np.array([2.0, 3.5, 0.0]),
                  xgoal=np.array([10.0, 3.5]), goal_tolerance=0.5,
                  v_post_rollout=0.5, cvar_alpha=1.0, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.0, 1.5]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-np.pi, np.pi]),
                  obs_penalty=1e5, unknown_penalty=1e3)
    planner = MPPIPlanner(cfg)
    planner.setup(params, tdm_pair[0], tdm_pair[1])
    return planner, cm


def test_costmap_tdm_construction():
    planner, cm = build()
    tdm = planner.lin_tdm
    assert tdm.num_pmf_bins == 2
    np.testing.assert_array_equal(np.asarray(tdm.pmf_grid[-1]), 100)
    # lethal wall -> obstacle mask (gap excluded); 255 -> unknown mask
    assert tdm.obstacle_map[6, 6] == 1 and tdm.obstacle_map[3, 6] == 0
    assert tdm.unknown_map[9, 10] == 1 and tdm.unknown_map[0, 0] == 0
    # risk byte is 100 (full nominal speed) everywhere on the unpadded map
    inner = np.asarray(tdm.risk_traction_map)[0]
    assert (inner[inner > 0] == 100).all()
    assert tdm.pmf_grid_initialized


def test_costmap_solve_equals_equivalent_speed_map_solve():
    p_cm, _ = build(use_costmap=True)
    p_sm, _ = build(use_costmap=False)
    u_cm = p_cm.solve()
    u_sm = p_sm.solve()
    np.testing.assert_array_equal(u_cm, u_sm)


def test_costmap_planner_avoids_lethal_wall():
    planner, cm = build()
    x = np.asarray(planner.params["x0"], dtype=float)
    crossed_lethal = False
    for _ in range(30):
        useq = planner.solve()
        v, w = useq[0]
        x = np.array([x[0] + 0.1 * v * np.cos(x[2]),
                      x[1] + 0.1 * v * np.sin(x[2]),
                      x[2] + 0.1 * w])
        xi, yi = int(x[0]), int(x[1])
        if 0 <= yi < cm.shape[0] and 0 <= xi < cm.shape[1]:
            if cm[yi, xi] > 100 and cm[yi, xi] != 255:
                crossed_lethal = True
        planner.shift_and_update(x, useq, 1)
    assert not crossed_lethal
    # Should have made progress toward the goal through the gap.
    assert x[0] > 4.0
