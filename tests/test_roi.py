"""Reachable-window (ROI) cropping: exactness and closed-loop behavior.

The solver may sample/pack/roll only a static window re-centered on x0
(SolverStatic.roi_shape; SURVEY §7 "Hard parts": sample only the map ROI the
rollouts can reach, radius max_speed*T).  Rollouts cannot leave that window
— per-step displacement is ``dt * lin_traction * v`` (reference:
mppi_numba/mppi.py:690-694) — so with DETERMINISTIC (one-hot) PMFs a cropped
solve must match the full-map solve exactly.
"""

import numpy as np
import pytest

from mppi_numba_tpu import Config, MPPIPlanner, TDM


def build_planner(roi_enabled, mode="tdm", H=40, W=40, seed=3, x0=None,
                  stochastic_pmf=False):
    num_bins = 4
    bin_values = np.array([0.0, 0.5, 0.8, 1.0])
    rng = np.random.RandomState(0)
    if stochastic_pmf:
        # Multi-bin PMFs: sampling draws per-cell uniforms.  The crop must
        # still match the full solve exactly because uniforms are generated
        # at GLOBAL cell indices (ops/sampling.py::uniform_window).
        raw = rng.randint(1, 50, size=(num_bins, H, W))
        raw[0] = 1  # keep 0-traction mass tiny
        pmf = np.floor(100 * raw / raw.sum(0)).astype(np.int8)
        pmf[-1] += 100 - pmf.sum(0).astype(np.int8)
    else:
        # One-hot PMF per cell -> map sampling is deterministic.
        pmf = np.zeros((num_bins, H, W), dtype=np.int8)
        hot = rng.randint(1, num_bins, size=(H, W))  # avoid 0-traction traps
        for b in range(num_bins):
            pmf[b][hot == b] = 100

    kw = {"tdm": dict(use_tdm=True),
          "det": dict(use_det_dynamics=True),
          "speed": dict(use_nom_dynamics_with_speed_map=True)}[mode]
    cfg = Config(T=2.0, dt=0.1, num_grid_samples=8 if mode == "tdm" else 1,
                 num_control_rollouts=128, max_speed_padding=1.0,
                 max_map_dim=(64, 64), seed=seed, **kw)
    res = 0.5
    tdm_dict = dict(res=res, xlimits=(0.0, W * res), ylimits=(0.0, H * res),
                    bin_values=bin_values,
                    bin_values_bounds=np.array([0.0, 1.0]),
                    det_dynamics_cvar_alpha=1.0 if mode == "tdm" else 0.5)
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    lin_tdm.set_TDM_from_PMF_grid(pmf, tdm_dict)
    ang_tdm.set_TDM_from_PMF_grid(pmf, tdm_dict)

    params = dict(dt=cfg.dt,
                  x0=np.array([4.25, 5.25, 0.3]) if x0 is None else x0,
                  xgoal=np.array([17.0, 16.0]), goal_tolerance=0.5,
                  v_post_rollout=0.5, cvar_alpha=0.5, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.0, 1.5]), vrange=np.array([0.0, 1.0]),
                  wrange=np.array([-np.pi, np.pi]))
    planner = MPPIPlanner(cfg)
    if not roi_enabled:
        planner._roi_shape = lambda hw: None
    planner.setup(params, lin_tdm, ang_tdm)
    return planner


@pytest.mark.parametrize("mode", ["tdm", "det", "speed"])
def test_roi_crop_matches_full_map_exactly(mode):
    p_roi = build_planner(True, mode)
    p_full = build_planner(False, mode)
    static = p_roi._static()
    assert static.roi_shape is not None, "test must actually exercise the crop"
    rH, rW = static.roi_shape
    assert rH < static.map_shape[0] and rW < static.map_shape[1]

    u_roi = p_roi.solve()
    u_full = p_full.solve()
    np.testing.assert_array_equal(u_roi, u_full)
    np.testing.assert_allclose(np.asarray(p_roi._last_aux.costs),
                               np.asarray(p_full._last_aux.costs))

    # Vis rollouts agree too (exercises the cropped-mask vis path).
    s_roi = p_roi.get_state_rollout()
    s_full = p_full.get_state_rollout()
    np.testing.assert_array_equal(s_roi, s_full)


def test_uniform_window_bit_identical_to_full_draw():
    import jax
    import jax.numpy as jnp
    from mppi_numba_tpu.ops.sampling import uniform_window

    key = jax.random.PRNGKey(7)
    M, H, W = 5, 17, 23
    full = np.asarray(jax.random.uniform(key, (M, H * W))).reshape(M, H, W)
    for oy, ox, rH, rW in [(0, 0, H, W), (3, 4, 7, 9), (10, 15, 7, 8)]:
        win = np.asarray(uniform_window(
            key, M, (H, W), jnp.int32(oy), jnp.int32(ox), (rH, rW)))
        np.testing.assert_array_equal(
            win.reshape(M, rH, rW), full[:, oy:oy + rH, ox:ox + rW])


def test_roi_crop_matches_full_map_with_stochastic_pmf():
    p_roi = build_planner(True, "tdm", stochastic_pmf=True)
    p_full = build_planner(False, "tdm", stochastic_pmf=True)
    assert p_roi._static().roi_shape is not None
    u_roi = p_roi.solve()
    u_full = p_full.solve()
    np.testing.assert_array_equal(u_roi, u_full)
    # The realized window grids equal the corresponding full-map slices.
    oy, ox = np.asarray(p_roi._last_aux.roi_offset)
    rH, rW = p_roi._static().roi_shape
    g_roi = np.asarray(p_roi._last_aux.lin_grids)
    g_full = np.asarray(p_full._last_aux.lin_grids)
    np.testing.assert_array_equal(g_roi,
                                  g_full[:, oy:oy + rH, ox:ox + rW])


def test_roi_disabled_for_models_without_displacement_bound():
    """A custom model without a declared translation bound could leave the
    reachable window; the planner must not crop for it (round-2 review)."""
    from mppi_numba_tpu.models import (register_model, has_displacement_bound,
                                       unicycle_step, _REGISTRY)

    def hover_step(x, y, th, v, w, lin_tr, ang_tr, dt):
        return x + dt * 2.0 * v, y, th          # ignores traction entirely

    register_model("hover-test", hover_step)
    try:
        assert not has_displacement_bound("hover-test")
        p = build_planner(True, "tdm")
        p.cfg.model = "hover-test"
        assert p._static().roi_shape is None
        p.cfg.model = "unicycle"
        assert p._static().roi_shape is not None
    finally:
        _REGISTRY.pop("hover-test", None)


def test_counter_draws_reject_foreign_prng():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from mppi_numba_tpu.ops.sampling import uniform_window

    bad = jnp.zeros((4,), jnp.uint32)   # rbg-shaped raw key
    with _pytest.raises(RuntimeError, match="threefry2x32 key"):
        uniform_window(bad, 2, (4, 4), jnp.int32(0), jnp.int32(0), (4, 4))


def test_roi_offset_clamps_at_map_corner():
    p = build_planner(True, "tdm", x0=np.array([0.75, 0.75, 0.0]))
    u = p.solve()
    assert np.isfinite(u).all()
    off = np.asarray(p._last_aux.roi_offset)
    np.testing.assert_array_equal(off, [0, 0])

    # Compare against the full-map solve from the same corner.
    p_full = build_planner(False, "tdm", x0=np.array([0.75, 0.75, 0.0]))
    np.testing.assert_array_equal(u, p_full.solve())


def test_roi_closed_loop_replans_with_moving_window():
    """The window offset is dynamic: replanning across the map must reuse
    ONE executable (no recompile per step) and keep making progress."""
    from mppi_numba_tpu.solver import get_terrain_solver
    p = build_planner(True, "tdm")
    static = p._static()
    x = np.asarray(p.params["x0"], dtype=np.float64)
    goal = np.asarray(p.params["xgoal"])
    d0 = np.linalg.norm(x[:2] - goal)
    for _ in range(12):
        useq = p.solve()
        v, w = useq[0]
        lt = at = 0.8
        x = np.array([x[0] + p.dt * lt * v * np.cos(x[2]),
                      x[1] + p.dt * lt * v * np.sin(x[2]),
                      x[2] + p.dt * at * w])
        p.shift_and_update(x, useq, 1)
    assert np.linalg.norm(x[:2] - goal) < d0
    offs = np.asarray(p._last_aux.roi_offset)
    assert (offs >= 0).all()
    assert get_terrain_solver.cache_info().currsize >= 1
