"""Extended coverage: oversized M, obstacle/unknown penalties, PMF-grid
construction modes through the TDM class."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mppi_numba_tpu import Config, TDM
from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.solver import get_terrain_solver
from mppi_numba_tpu.terrain import condense_pmf_grid_det, risk_map_from_pmf_grid

from test_sharding import build_case


def test_oversized_grid_samples_just_work():
    """M > 1024 forces the reference onto a serialized fallback kernel
    (reference: mppi_numba/mppi.py:199-207, 759-913).  On TPU M is a tensor
    axis — same code path, no special case."""
    static, maps, task, u0, keys = build_case(1, K=128, M=1500, T=5,
                                              cvar_numel=300)
    fn = get_terrain_solver(static)
    maps_s = jax.tree.map(lambda x: x[0], maps)
    task_s = jax.tree.map(lambda x: x[0], task)
    u, aux = fn(keys[0], maps_s, task_s, u0[0])
    assert np.isfinite(np.asarray(u)).all()
    assert aux.lin_grids.shape[0] == 1500


def test_obstacle_and_unknown_penalties_steer_planner():
    """A wall of obstacle cells between start and goal must repel rollouts:
    the optimal first controls turn instead of driving straight."""
    from test_planner import make_world
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    cfg = Config(T=5.0, dt=0.1, num_grid_samples=8, num_control_rollouts=512,
                 max_speed_padding=3.0, num_vis_state_rollouts=1,
                 max_map_dim=(15, 15), seed=1, use_tdm=True)

    obstacle_map = np.zeros((9, 9), dtype=np.int8)
    obstacle_map[:, 4] = 1   # vertical wall at x ~ 4.5
    obstacle_map[4, 4] = 0   # gap at the middle

    from mppi_numba_tpu import MPPIPlanner
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    for tdm in (lin_tdm, ang_tdm):
        tdm.set_TDM_from_semantic_grid(
            sg * 0, 1.0, len(bin_values), bin_values, np.array([0.0, 1.0]),
            np.array([0.0, 9.0]), np.array([0.0, 9.0]),
            id2name, name2terrain, terrain2pmf,
            obstacle_map=obstacle_map)
    params = dict(dt=cfg.dt, x0=np.array([2.0, 4.5, 0.0]),
                  xgoal=np.array([7.0, 4.5]), goal_tolerance=0.3,
                  v_post_rollout=0.01, cvar_alpha=1.0, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.5, 2.0]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-3.0, 3.0]), obs_penalty=1e6)
    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)
    planner.solve()
    # Rollout of the optimal sequence should not cross the wall cells.
    states = planner.get_state_rollout()[0]
    xi = np.floor(states[:, 0]).astype(int)
    yi = np.floor(states[:, 1]).astype(int)
    inb = (xi >= 0) & (xi < 9) & (yi >= 0) & (yi < 9)
    hits = obstacle_map[yi[inb], xi[inb]].sum()
    assert hits == 0, "optimal rollout drives through the obstacle wall"


@pytest.mark.parametrize("mode", ["det", "speed"])
def test_set_tdm_from_pmf_grid_modes(mode):
    """External-PMF initialization for the det/speed-map modes matches the
    module-level condensation math (reference: terrain.py:380-508)."""
    rng = np.random.RandomState(5)
    B, R, C = 8, 6, 7
    raw = rng.randint(0, 100, size=(B, R, C)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    bin_values = np.linspace(0, 1, B)
    alpha = 0.4

    cfg = Config(T=2.0, dt=0.1, num_grid_samples=4, num_control_rollouts=128,
                 max_speed_padding=2.0, max_map_dim=(20, 20), seed=0,
                 use_det_dynamics=mode == "det",
                 use_nom_dynamics_with_speed_map=mode == "speed")
    tdm = TDM(cfg)
    tdm.set_TDM_from_PMF_grid(pmf, dict(
        res=1.0, xlimits=(0.0, C), ylimits=(0.0, R),
        bin_values=bin_values, bin_values_bounds=np.array([0.0, 1.0]),
        det_dynamics_cvar_alpha=alpha))

    if mode == "det":
        expect = condense_pmf_grid_det(pmf, bin_values, alpha)
        np.testing.assert_array_equal(tdm.pmf_grid, expect)
    else:
        assert (tdm.pmf_grid[-1] == 100).all()
        expect_risk = risk_map_from_pmf_grid(pmf, bin_values,
                                             np.array([0.0, 1.0]), alpha)
        pad = tdm.pad_cells
        np.testing.assert_array_equal(
            tdm.risk_traction_map[0, pad:-pad, pad:-pad], expect_risk[0])


def test_pmf_grid_alpha_one_modes():
    rng = np.random.RandomState(6)
    B, R, C = 5, 4, 4
    raw = rng.randint(0, 100, size=(B, R, C)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    bin_values = np.linspace(0, 1, B)
    got = condense_pmf_grid_det(pmf, bin_values, 1.0)
    assert (got.sum(0) == 100).all()
    risk = risk_map_from_pmf_grid(pmf, bin_values, np.array([0.0, 1.0]), 1.0)
    means = (0.01 * pmf.astype(float) * bin_values.reshape(-1, 1, 1)).sum(0)
    np.testing.assert_array_equal(risk[0], (100 * means).astype(np.int8))


def test_faq_nominal_dynamics_via_two_bin_pmf_grid():
    """Reference FAQ 1 (README.md:134-152): nominal unicycle MPPI through
    the TDM interface — a 2-bin PMF grid with all mass in the last bin
    (perfect traction).  The rollout must see traction 1 everywhere."""
    import numpy as np
    from mppi_numba_tpu import Config, MPPIPlanner, TDM

    HEIGHT = WIDTH = 10
    cfg = Config(T=3.0, dt=0.1, num_grid_samples=4, num_control_rollouts=256,
                 max_speed_padding=2.0, max_map_dim=(14, 14), seed=0,
                 use_tdm=True)
    tdm_params = dict(xlimits=(0.0, float(WIDTH)),
                      ylimits=(0.0, float(HEIGHT)), res=1.0,
                      bin_values=np.array([0.0, 1.0]),
                      bin_values_bounds=np.array([0.0, 1.0]),
                      det_dynamics_cvar_alpha=1.0)
    nominal = np.zeros((2, HEIGHT, WIDTH), dtype=np.int8)
    nominal[-1] = 100
    lin, ang = TDM(cfg), TDM(cfg)
    lin.set_TDM_from_PMF_grid(nominal, tdm_params)
    ang.set_TDM_from_PMF_grid(nominal, tdm_params)

    # Every sampled map must decode to traction 1 inside the map.
    grids = np.asarray(lin.sample_grids())
    inner = grids[:, 2:-2, 2:-2]
    assert (lin.int8_grid_to_float32(inner) == 1.0).all()

    params = dict(dt=cfg.dt, x0=np.array([1.0, 1.0, 0.8]),
                  xgoal=np.array([8.0, 8.0]), goal_tolerance=0.5,
                  v_post_rollout=0.01, cvar_alpha=1.0, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.5, 2.0]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-3.14, 3.14]))
    p = MPPIPlanner(cfg)
    p.setup(params, lin, ang)
    useq = p.solve()
    assert np.isfinite(useq).all()
    # With perfect traction toward an open goal, MPPI commands forward speed.
    assert np.asarray(useq)[:5, 0].mean() > 0.5
