"""Planner API + closed-loop behavior (integration, mirrors test.ipynb /
barebone_mppi_numba.ipynb)."""

import numpy as np
import pytest

from mppi_numba_tpu import (BareboneConfig, BareboneMPPI, Config,
                            GaussianMixture, MPPIPlanner, TDM, Terrain)


def make_world(seed=1, num_bins=12, shape=(9, 9)):
    rng = np.random.RandomState(seed)
    pmf_bounds = [0, 1.0]
    bush_gm = GaussianMixture(pmf_bounds, pmf_bounds, [0.6, 0.4], [0, 0.8],
                              [0.15, 0.1], num_samples=1e4, rng=rng)
    dirt_gm = GaussianMixture(pmf_bounds, pmf_bounds, [1], [0.65], [0.1],
                              num_samples=1e4, rng=rng)
    bush = Terrain("Vegetation", (0, 1, 0), bush_gm, bush_gm)
    dirt = Terrain("Dirt", (1, 1, 0), dirt_gm, dirt_gm)
    id2name = {0: "Dirt", 1: "Vegetation"}
    name2terrain = {"Vegetation": bush, "Dirt": dirt}
    terrain2pmf = {bush: bush_gm.get_pmf(num_bins),
                   dirt: dirt_gm.get_pmf(num_bins)}
    sg = np.zeros(shape, dtype=np.int8)
    sg[1:-1, 1:-1][rng.rand(shape[0] - 2, shape[1] - 2) < 0.3] = 1
    bin_values = terrain2pmf[bush][0]
    return sg, id2name, name2terrain, terrain2pmf, bin_values


def make_planner(mode, K=256, M=64, T=6.0, vis=8, seed=1):
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    kw = dict(use_tdm=mode == "tdm", use_det_dynamics=mode == "det",
              use_nom_dynamics_with_speed_map=mode == "speed")
    cfg = Config(T=T, dt=0.1, num_grid_samples=M, num_control_rollouts=K,
                 max_speed_padding=3.0, num_vis_state_rollouts=vis,
                 max_map_dim=(15, 15), seed=seed, **kw)
    alpha_dyn = 1.0 if mode == "tdm" else 0.3
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    for tdm in (lin_tdm, ang_tdm):
        tdm.set_TDM_from_semantic_grid(
            sg, 1.0, len(bin_values), bin_values, np.array([0.0, 1.0]),
            np.array([0.0, 9.0]), np.array([0.0, 9.0]),
            id2name, name2terrain, terrain2pmf,
            det_dynamics_cvar_alpha=None if mode == "tdm" else alpha_dyn)
    params = dict(
        dt=cfg.dt, x0=np.array([0.5, 0.5, np.pi / 4]),
        xgoal=np.array([8.0, 8.0]), goal_tolerance=0.5, v_post_rollout=0.01,
        cvar_alpha=0.3 if mode == "tdm" else 1.0, alpha_dyn=alpha_dyn,
        dist_weight=1, lambda_weight=1.0, num_opt=1,
        u_std=np.array([2.0, 3.0]), vrange=np.array([0.0, 3.0]),
        wrange=np.array([-np.pi, np.pi]))
    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)
    return cfg, planner, params, lin_tdm


@pytest.mark.parametrize("mode", ["tdm", "det", "speed"])
def test_solve_returns_valid_sequence(mode):
    cfg, planner, params, _ = make_planner(mode)
    useq = planner.solve()
    assert useq.shape == (cfg.num_steps, 2)
    assert useq.dtype == np.float32
    vr = params["vrange"].astype(np.float32)
    wr = params["wrange"].astype(np.float32)
    assert (useq[:, 0] >= vr[0]).all()
    assert (useq[:, 0] <= vr[1]).all()
    assert (useq[:, 1] >= wr[0]).all()
    assert (useq[:, 1] <= wr[1]).all()
    assert np.isfinite(useq).all()


@pytest.mark.parametrize("mode", ["tdm", "det"])
def test_closed_loop_reaches_goal(mode):
    cfg, planner, params, lin_tdm = make_planner(mode, K=512, M=128, T=8.0)
    tg = lin_tdm.sample_grids_true_dist()
    x = params["x0"].copy()
    reached = False
    for t in range(150):
        useq = planner.solve()
        u = useq[0]
        lt, at = tg.get(x[0], x[1])
        x = x + cfg.dt * np.array([lt * u[0] * np.cos(x[2]),
                                   lt * u[0] * np.sin(x[2]), at * u[1]])
        planner.shift_and_update(x, useq, 1)
        if np.linalg.norm(x[:2] - params["xgoal"]) <= params["goal_tolerance"]:
            reached = True
            break
    assert reached, "planner failed to reach goal in 15 s of sim time"


@pytest.mark.parametrize("mode", ["tdm", "det", "speed"])
def test_state_rollout_shapes_and_start(mode):
    cfg, planner, params, _ = make_planner(mode)
    planner.solve()
    states = planner.get_state_rollout()
    assert states.shape == (cfg.num_vis_state_rollouts, cfg.num_steps + 1, 3)
    np.testing.assert_allclose(states[:, 0, :],
                               np.tile(params["x0"], (states.shape[0], 1)),
                               rtol=1e-6)


def test_shift_and_update_rolls_sequence():
    cfg, planner, params, _ = make_planner("det")
    useq = planner.solve()
    new_x0 = params["x0"] + 0.05
    planner.shift_and_update(new_x0, useq, num_shifts=1)
    shifted = np.asarray(planner.u_cur)
    np.testing.assert_allclose(shifted[:-1], useq[1:], rtol=1e-6)
    np.testing.assert_allclose(planner.params["x0"], new_x0)


def test_solve_without_setup_returns_none():
    cfg = Config(T=2.0, dt=0.1, use_tdm=True, num_grid_samples=4,
                 num_control_rollouts=128)
    planner = MPPIPlanner(cfg)
    assert planner.solve() is None


def test_x0_out_of_bounds_asserts():
    cfg, planner, params, lin_tdm = make_planner("det")
    bad = dict(params)
    bad["x0"] = np.array([100.0, 0.5, 0.0])
    with pytest.raises(AssertionError):
        planner.set_params(bad)


def test_solver_reuses_compiled_executable():
    from mppi_numba_tpu.solver import get_terrain_solver
    cfg, planner, params, _ = make_planner("det")
    planner.solve()
    before = get_terrain_solver.cache_info().misses
    planner.solve()
    planner.solve()
    after = get_terrain_solver.cache_info().misses
    assert before == after


def test_barebone_closed_loop_reaches_goal():
    cfg = BareboneConfig(T=5.0, dt=0.1, num_control_rollouts=500,
                         num_vis_state_rollouts=10, seed=1)
    x0 = np.array([0, 0, np.pi / 4])
    xgoal = np.array([7, 5])
    params = dict(dt=cfg.dt, x0=x0, xgoal=xgoal, goal_tolerance=0.5,
                  dist_weight=10, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.0, 1.0]), vrange=np.array([0.0, 2.0]),
                  wrange=np.array([-np.pi, np.pi]),
                  obstacle_positions=np.array([[5, 4.5], [2, 1]]),
                  obstacle_radius=np.array([1.5, 1.0]), obs_penalty=1e6)
    planner = BareboneMPPI(cfg)
    planner.setup(params)
    x = x0.astype(float).copy()
    reached = False
    traj = [x.copy()]
    for t in range(151):
        useq = planner.solve()
        u = useq[0]
        x = x + cfg.dt * np.array([u[0] * np.cos(x[2]),
                                   u[0] * np.sin(x[2]), u[1]])
        traj.append(x.copy())
        planner.shift_and_update(x, useq, 1)
        if np.linalg.norm(x[:2] - xgoal) <= params["goal_tolerance"]:
            reached = True
            break
    assert reached
    # Obstacles avoided along the way.
    traj = np.asarray(traj)
    assert np.min(np.hypot(traj[:, 0] - 5, traj[:, 1] - 4.5)) > 1.4
    assert np.min(np.hypot(traj[:, 0] - 2, traj[:, 1] - 1)) > 0.9
    states = planner.get_state_rollout()
    assert states.shape == (cfg.num_vis_state_rollouts, cfg.num_steps + 1, 3)


def test_solver_num_opt_iterations_chain():
    """num_opt=2 equals two chained iterations over the SAME sampled maps
    with per-iteration folded noise keys (reference: mppi.py:402-448 loops
    kernels 3-5 inside one solve; maps are sampled once per solve)."""
    import jax
    import jax.numpy as jnp
    from mppi_numba_tpu.config import SolverStatic
    from mppi_numba_tpu.ops.cvar import cvar_from_costs
    from mppi_numba_tpu.ops.packing import pack_map_words
    from mppi_numba_tpu.ops.rollout import (control_coupling,
                                            terrain_rollout_costs)
    from mppi_numba_tpu.ops.sampling import (sample_noise,
                                             sample_traction_grids)
    from mppi_numba_tpu.ops.update import update_useq
    from mppi_numba_tpu.solver import get_terrain_solver
    from mppi_numba_tpu.types import MapInputs, TerrainTask

    K, M, T, H, W, B = 64, 8, 12, 7, 7, 6
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 100, size=(B, H, W)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    qbins = np.linspace(0, 100, B).astype(np.int8)
    maps = MapInputs(
        lin_pmf=jnp.asarray(pmf), ang_pmf=jnp.asarray(pmf),
        lin_qbins=jnp.asarray(qbins), ang_qbins=jnp.asarray(qbins),
        obstacle=jnp.zeros((H, W), jnp.int8),
        unknown=jnp.zeros((H, W), jnp.int8),
        risk=jnp.zeros((H, W), jnp.int8))
    f32 = np.float32
    task = TerrainTask(
        x0=jnp.asarray(np.array([2.0, 2.0, 0.3], f32)),
        xgoal=jnp.asarray(np.array([5.0, 5.0], f32)),
        goal_tolerance=f32(0.5), v_post_rollout=f32(0.01),
        lambda_weight=f32(1.0),
        u_std=jnp.asarray(np.array([1.0, 1.5], f32)),
        vrange=jnp.asarray(np.array([0.0, 2.0], f32)),
        wrange=jnp.asarray(np.array([-3.0, 3.0], f32)),
        dt=f32(0.1), dist_weight=f32(1.0), obs_penalty=f32(1e5),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(1.0),
        xlim0=f32(-1.0), ylim0=f32(-1.0), lin_lb=f32(0.0),
        lin_ratio=f32(0.01), ang_lb=f32(0.0), ang_ratio=f32(0.01))
    static = SolverStatic(mode="tdm", num_steps=T, num_control_rollouts=K,
                          num_grid_samples=M, map_shape=(H, W),
                          num_obstacles=0, cvar_numel=3, num_opt=2,
                          num_vis_state_rollouts=1, backend="xla")
    key = jax.random.PRNGKey(7)
    # The solver donates its u0 argument; hand it a dedicated buffer.
    got, aux = get_terrain_solver(static)(key, maps, task,
                                          jnp.zeros((T, 2), jnp.float32))
    u0 = jnp.zeros((T, 2), jnp.float32)

    # Manual two-iteration chain with the solver's documented key schedule.
    kmap, knoise = jax.random.split(key)
    lin = sample_traction_grids(kmap, maps.lin_pmf, maps.lin_qbins,
                                task.alpha_dyn, M)
    ang = sample_traction_grids(kmap, maps.ang_pmf, maps.ang_qbins,
                                task.alpha_dyn, M)
    packed = pack_map_words(lin, ang, maps.obstacle, maps.unknown)
    u = u0
    for i in range(2):
        noise = sample_noise(jax.random.fold_in(knoise, i), task.u_std, K, T)
        costs = (cvar_from_costs(
                     terrain_rollout_costs(packed, task, u, noise), 3)
                 + control_coupling(u, noise, task.u_std, task.lambda_weight))
        u, _ = update_useq(costs, noise, u, task.lambda_weight,
                           task.vrange, task.wrange)
    # Fused-vs-eager reassociation: tolerate a few ulps.
    np.testing.assert_allclose(np.asarray(got), np.asarray(u),
                               rtol=1e-4, atol=1e-5)


def test_pmf_support_compaction_bit_identical():
    """The planner drops globally-zero-mass PMF rows before staging
    (mppi.py::_compact_planes): the effective bin count shrinks for
    routing, and the solve output is BIT-identical to the uncompacted
    planes (zero-mass bins are never selected by the sampling rank)."""
    H = W = 9
    B = 12
    rng = np.random.RandomState(5)
    # Mass only in rows {0, 4, 9} of 12 declared bins.
    pmf = np.zeros((B, H, W), np.int8)
    a = rng.randint(0, 101, (H, W))
    b = rng.randint(0, 101 - 50, (H, W))
    pmf[0] = (a * 0.3).astype(np.int8)
    pmf[4] = (b * 0.3).astype(np.int8)
    pmf[9] = 100 - pmf[0] - pmf[4]
    bin_values = np.linspace(0.0, 1.0, B)
    tdm_dict = dict(res=1.0, xlimits=(0, W), ylimits=(0, H),
                    bin_values=bin_values,
                    bin_values_bounds=(0.0, 1.0),
                    det_dynamics_cvar_alpha=1.0)
    params = dict(
        dt=0.1, x0=np.array([1.5, 1.5, 0.5]), xgoal=np.array([7.0, 7.0]),
        goal_tolerance=0.5, v_post_rollout=0.01, cvar_alpha=0.5,
        alpha_dyn=1.0, dist_weight=1, lambda_weight=1.0, num_opt=1,
        u_std=np.array([1.0, 1.5]), vrange=np.array([0.0, 2.0]),
        wrange=np.array([-3.0, 3.0]))

    def run(compact):
        cfg = Config(T=3.0, dt=0.1, num_grid_samples=16,
                     num_control_rollouts=128, seed=7, use_tdm=True,
                     max_map_dim=(15, 15))
        cfg.compact_pmf_support = compact
        lin, ang = TDM(cfg), TDM(cfg)
        for t in (lin, ang):
            t.set_TDM_from_PMF_grid(pmf.copy(), tdm_dict)
        pl = MPPIPlanner(cfg)
        pl.setup(params, lin, ang)
        u = pl.solve()
        return u, pl._static(), pl._map_inputs()

    u_c, st_c, maps_c = run(True)
    u_f, st_f, maps_f = run(False)
    assert st_f.num_pmf_bins == B
    assert st_c.num_pmf_bins == 3
    assert maps_c.lin_pmf.shape[0] == 3
    assert maps_c.lin_qbins.shape[0] == 3
    # Bit-identical solves: same seed, same sampled traction values.
    np.testing.assert_array_equal(u_c, u_f)


def test_pmf_support_compaction_unnormalized_grid_keeps_clamp_bin():
    """Unnormalized PMF grids (column mass < 100) can run the CDF walk off
    the end: decode_bins' take then clamps to the LAST plane row, so the
    compactor must retain the declared last bin for the clamp target to be
    unchanged (round-3 advisor finding)."""
    H = W = 9
    B = 12
    rng = np.random.RandomState(5)
    # Mass only in rows {0, 4}, summing to ~60 per cell: draws above the
    # column mass clamp to the last bin.  Bin 11 (value 1.0) has ZERO mass
    # everywhere — naive compaction would drop it and re-target the clamp
    # at bin 4's value.
    pmf = np.zeros((B, H, W), np.int8)
    pmf[0] = (rng.randint(0, 101, (H, W)) * 0.3).astype(np.int8)
    pmf[4] = 60 - pmf[0]
    bin_values = np.linspace(0.0, 1.0, B)
    tdm_dict = dict(res=1.0, xlimits=(0, W), ylimits=(0, H),
                    bin_values=bin_values,
                    bin_values_bounds=(0.0, 1.0),
                    det_dynamics_cvar_alpha=1.0)
    params = dict(
        dt=0.1, x0=np.array([1.5, 1.5, 0.5]), xgoal=np.array([7.0, 7.0]),
        goal_tolerance=0.5, v_post_rollout=0.01, cvar_alpha=0.5,
        alpha_dyn=1.0, dist_weight=1, lambda_weight=1.0, num_opt=1,
        u_std=np.array([1.0, 1.5]), vrange=np.array([0.0, 2.0]),
        wrange=np.array([-3.0, 3.0]))

    def run(compact):
        cfg = Config(T=3.0, dt=0.1, num_grid_samples=16,
                     num_control_rollouts=128, seed=7, use_tdm=True,
                     max_map_dim=(15, 15))
        cfg.compact_pmf_support = compact
        lin, ang = TDM(cfg), TDM(cfg)
        for t in (lin, ang):
            t.set_TDM_from_PMF_grid(pmf.copy(), tdm_dict)
        pl = MPPIPlanner(cfg)
        pl.setup(params, lin, ang)
        return pl.solve(), pl._static(), pl._map_inputs()

    u_c, st_c, maps_c = run(True)
    u_f, st_f, _ = run(False)
    # Rows {0, 4} plus the retained clamp bin 11.
    assert st_c.num_pmf_bins == 3
    assert maps_c.lin_qbins.shape[0] == 3
    assert int(np.asarray(maps_c.lin_qbins)[-1]) == 100  # declared last bin
    np.testing.assert_array_equal(u_c, u_f)


def test_compaction_cache_invalidated_by_inplace_tdm_update():
    """Mutating a TDM in place (reset + set_TDM_from_*) without re-calling
    set_tdm must not serve stale compacted planes (round-3 advisor
    finding): the memo is keyed on the TDM content-version token."""
    H = W = 9
    B = 6
    bin_values = np.linspace(0.0, 1.0, B)
    tdm_dict = dict(res=1.0, xlimits=(0, W), ylimits=(0, H),
                    bin_values=bin_values,
                    bin_values_bounds=(0.0, 1.0),
                    det_dynamics_cvar_alpha=1.0)
    params = dict(
        dt=0.1, x0=np.array([1.5, 1.5, 0.5]), xgoal=np.array([7.0, 7.0]),
        goal_tolerance=0.5, v_post_rollout=0.01, cvar_alpha=0.5,
        alpha_dyn=1.0, dist_weight=1, lambda_weight=1.0, num_opt=1,
        u_std=np.array([1.0, 1.5]), vrange=np.array([0.0, 2.0]),
        wrange=np.array([-3.0, 3.0]))

    def one_hot(row):
        pmf = np.zeros((B, H, W), np.int8)
        pmf[row] = 100
        return pmf

    cfg = Config(T=3.0, dt=0.1, num_grid_samples=16,
                 num_control_rollouts=128, seed=7, use_tdm=True,
                 max_map_dim=(15, 15))
    lin, ang = TDM(cfg), TDM(cfg)
    for t in (lin, ang):
        t.set_TDM_from_PMF_grid(one_hot(1), tdm_dict)
    pl = MPPIPlanner(cfg)
    pl.setup(params, lin, ang)
    pl.solve()
    stale = pl._compact_planes()

    # In-place update to a different support WITHOUT set_tdm().
    for t in (lin, ang):
        t.reset()
        t.set_TDM_from_PMF_grid(one_hot(4), tdm_dict)
    fresh = pl._compact_planes()
    assert fresh is not stale
    np.testing.assert_array_equal(np.asarray(fresh[1]),
                                  np.asarray(lin.qbin_values_host[[0, 4]]))


def test_pmf_support_compaction_speed_map_routes_crumb():
    """Speed-map mode's PMF support is exactly {padding, nominal}: the
    effective bin count is 2, which (on TPU) routes the realistic-map
    solve to the 2-bit crumb kernel regardless of the declared count."""
    cfg, planner, params, _ = make_planner("speed")
    static = planner._static()
    assert static.num_pmf_bins == 2
    # Routing on a TPU backend would pick the crumb layout for this count
    # at realistic map sizes (tests/test_solver_backends.py pins that);
    # here just confirm the CPU solve still matches its own output shape.
    assert planner.solve().shape == (planner.num_steps, 2)
