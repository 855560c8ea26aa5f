"""Multi-device sharded solve vs single-device solve on a virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.parallel.mesh import make_mesh
from mppi_numba_tpu.parallel.sharded import get_sharded_terrain_solver
from mppi_numba_tpu.solver import get_terrain_solver
from mppi_numba_tpu.types import MapInputs, TerrainTask


def build_case(S, K=64, M=8, T=10, B=5, H=8, W=8, seed=0, mode="tdm",
               cvar_numel=None):
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 100, size=(S, B, H, W)).astype(float)
    pmf = (raw / raw.sum(1, keepdims=True) * 100).astype(np.int8)
    pmf[:, -1] = 100 - pmf[:, :-1].sum(1)
    qbins = np.linspace(0, 100, B).astype(np.int8)

    maps = MapInputs(
        lin_pmf=jnp.asarray(pmf),
        ang_pmf=jnp.asarray(pmf),
        lin_qbins=jnp.broadcast_to(jnp.asarray(qbins), (S, B)),
        ang_qbins=jnp.broadcast_to(jnp.asarray(qbins), (S, B)),
        obstacle=jnp.zeros((S, H, W), jnp.int8),
        unknown=jnp.zeros((S, H, W), jnp.int8),
        risk=jnp.zeros((S, H, W), jnp.int8),
    )
    f32 = np.float32

    def batch(x):
        return jnp.broadcast_to(jnp.asarray(np.asarray(x, f32)),
                                (S,) + np.shape(np.asarray(x, f32)))

    task = TerrainTask(
        x0=batch([2.0, 2.0, 0.3]), xgoal=batch([6.0, 6.0]),
        goal_tolerance=batch(0.4), v_post_rollout=batch(0.3),
        lambda_weight=batch(1.0), u_std=batch([1.0, 1.5]),
        vrange=batch([0.0, 2.0]), wrange=batch([-3.0, 3.0]),
        dt=batch(0.1), dist_weight=batch(1.5), obs_penalty=batch(1e4),
        unknown_penalty=batch(1e2), alpha_dyn=batch(1.0), res=batch(1.0),
        xlim0=batch(0.0), ylim0=batch(0.0), lin_lb=batch(0.0),
        lin_ratio=batch(0.01), ang_lb=batch(0.0), ang_ratio=batch(0.01),
    )
    static = SolverStatic(mode=mode, num_steps=T, num_control_rollouts=K,
                          num_grid_samples=M, map_shape=(H, W),
                          num_obstacles=0,
                          cvar_numel=M if cvar_numel is None else cvar_numel,
                          num_opt=2, num_vis_state_rollouts=1)
    u0 = jnp.zeros((S, T, 2), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))
    return static, maps, task, u0, keys


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_solve_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    S = mesh_shape[0] * 2  # two scenarios per scenario-shard
    static, maps, task, u0, keys = build_case(S, cvar_numel=3)
    mesh = make_mesh(*mesh_shape, devices=jax.devices()[:8])
    sharded = get_sharded_terrain_solver(static, mesh)
    u_multi, costs_multi = sharded(keys, maps, task, u0)

    single = get_terrain_solver(static)
    for s in range(S):
        maps_s = jax.tree.map(lambda x: x[s], maps)
        task_s = jax.tree.map(lambda x: x[s], task)
        u_single, aux = single(keys[s], maps_s, task_s, u0[s])
        np.testing.assert_allclose(np.asarray(u_multi)[s],
                                   np.asarray(u_single), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(costs_multi)[s],
                                   np.asarray(aux.costs), rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (1, 4, 2), (2, 2, 2),
                                        (1, 1, 8)])
@pytest.mark.parametrize("cvar_numel", [3, 8])   # two-phase top-k / psum-mean
def test_map_sharded_solve_matches_single_device(mesh_shape, cvar_numel):
    """M sharded over the mesh 'm' axis: per-chip (K/n_k, M/n_m) rollouts
    with the two-phase distributed CVaR must match the single-device solve
    (SURVEY §7 'CVaR across shards')."""
    s, k, m = mesh_shape
    S = s * 2
    static, maps, task, u0, keys = build_case(S, cvar_numel=cvar_numel)
    mesh = make_mesh(s, k, devices=jax.devices()[:8], num_map_shards=m)
    sharded = get_sharded_terrain_solver(static, mesh)
    u_multi, costs_multi = sharded(keys, maps, task, u0)

    single = get_terrain_solver(static)
    for si in range(S):
        maps_s = jax.tree.map(lambda x: x[si], maps)
        task_s = jax.tree.map(lambda x: x[si], task)
        u_single, aux = single(keys[si], maps_s, task_s, u0[si])
        np.testing.assert_allclose(np.asarray(u_multi)[si],
                                   np.asarray(u_single), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(costs_multi)[si],
                                   np.asarray(aux.costs), rtol=2e-4, atol=2e-3)


def test_map_sharded_dynamic_cvar_matches_single_device():
    import dataclasses
    from mppi_numba_tpu.solver import DYNAMIC_CVAR

    S = 2
    static, maps, task, u0, keys = build_case(S)
    static = dataclasses.replace(static, cvar_numel=DYNAMIC_CVAR)
    task = task._replace(cvar_alpha=jnp.full((S,), 0.4, jnp.float32))
    mesh = make_mesh(1, 2, devices=jax.devices()[:8], num_map_shards=4)
    u_sh, _ = get_sharded_terrain_solver(static, mesh)(keys, maps, task, u0)
    u_ref, _ = jax.vmap(get_terrain_solver(static))(keys, maps, task,
                                                    jnp.zeros_like(u0))
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mesh_shape", [(1, 4, 1), (1, 2, 2), (2, 2, 2)])
def test_roi_sharded_solve_matches_single_device(mesh_shape):
    """ROI cropping under k- and (k, m)-sharding: the most delicate
    interaction in the codebase — dynamic window offsets x
    counter-addressable draws x m-offsets x all-gather — must reproduce the
    single-device ROI solve (which test_roi.py pins against the full-map
    solve).  x0 sits near the map corner so the window clamps at the edge."""
    import dataclasses

    s, k, m = mesh_shape
    S = s * 2
    static, maps, task, u0, keys = build_case(S, H=20, W=20, cvar_numel=3)
    # build_case's x0=(2, 2): a 9x9 window centered there clamps to the
    # (0, 0) corner, exercising the offset-clip path.
    static = dataclasses.replace(static, roi_shape=(9, 9))
    mesh = make_mesh(s, k, devices=jax.devices()[:s * k * m],
                     num_map_shards=(m if m > 1 else None))
    sharded = get_sharded_terrain_solver(static, mesh)
    u_multi, costs_multi = sharded(keys, maps, task, u0)

    single = get_terrain_solver(static)
    for si in range(S):
        maps_s = jax.tree.map(lambda x: x[si], maps)
        task_s = jax.tree.map(lambda x: x[si], task)
        u_single, aux = single(keys[si], maps_s, task_s, u0[si])
        np.testing.assert_allclose(np.asarray(u_multi)[si],
                                   np.asarray(u_single), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(costs_multi)[si],
                                   np.asarray(aux.costs), rtol=2e-4, atol=2e-3)


def test_sharded_solve_byte2_backend_matches_single_device():
    """>16-bin maps under k-sharding run the byte-pair kernel per shard
    (shared rollout backend, interpret mode on CPU) and must match the
    single-device solve — pins the sharded-path x cell_bits=8 interaction."""
    import dataclasses

    S = 2
    static, maps, task, u0, keys = build_case(S, B=22, cvar_numel=3)
    static = dataclasses.replace(static, num_pmf_bins=22,
                                 backend="pallas_binned8_interpret")
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    u_sh, costs_sh = get_sharded_terrain_solver(static, mesh)(keys, maps,
                                                              task, u0)
    single = get_terrain_solver(static)
    for si in range(S):
        maps_s = jax.tree.map(lambda x: x[si], maps)
        task_s = jax.tree.map(lambda x: x[si], task)
        u_single, aux = single(keys[si], maps_s, task_s, u0[si])
        np.testing.assert_allclose(np.asarray(u_sh)[si],
                                   np.asarray(u_single), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(costs_sh)[si],
                                   np.asarray(aux.costs), rtol=2e-4,
                                   atol=2e-3)


def test_sharded_solve_crumb_backend_matches_single_device():
    """<=4-bin maps under k-sharding run the 2-bit crumb kernel per shard;
    pins the sharded-path x cell_bits=2 interaction."""
    import dataclasses

    S = 2
    static, maps, task, u0, keys = build_case(S, B=4, cvar_numel=3)
    static = dataclasses.replace(static, num_pmf_bins=4,
                                 backend="pallas_binned2_interpret")
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    u_sh, costs_sh = get_sharded_terrain_solver(static, mesh)(keys, maps,
                                                              task, u0)
    single = get_terrain_solver(static)
    for si in range(S):
        maps_s = jax.tree.map(lambda x: x[si], maps)
        task_s = jax.tree.map(lambda x: x[si], task)
        u_single, aux = single(keys[si], maps_s, task_s, u0[si])
        np.testing.assert_allclose(np.asarray(u_sh)[si],
                                   np.asarray(u_single), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(costs_sh)[si],
                                   np.asarray(aux.costs), rtol=2e-4,
                                   atol=2e-3)


def test_sharded_solver_is_cached():
    static, maps, task, u0, keys = build_case(2)
    mesh = make_mesh(1, 8, devices=jax.devices()[:8])
    a = get_sharded_terrain_solver(static, mesh)
    b = get_sharded_terrain_solver(static, mesh)
    assert a is b


def test_sharded_trial_batch_matches_local():
    """Scenario-sharded episodes (8 devices) == local vmapped episodes."""
    import __graft_entry__ as g
    from mppi_numba_tpu.device_sim import make_device_trial_batch
    from mppi_numba_tpu.parallel.mesh import make_mesh
    from mppi_numba_tpu.parallel.sharded import make_sharded_trial_batch

    B = 8
    static, maps, task, u0 = g._make_problem(S=B, K=64, M=8, T=8, H=7, W=7)
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.uniform(0.4, 1.0, (B, 5, 5)).astype(np.float32))
    meta = jnp.asarray(np.tile(np.array([0.0, 0.0, 1.0], np.float32),
                               (B, 1)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    args = (keys, maps, task, gt, gt, meta)

    local = make_device_trial_batch(static, 10)(*args)
    mesh = make_mesh(2, 4)
    sharded = make_sharded_trial_batch(static, 10, mesh)(*args)

    np.testing.assert_array_equal(np.asarray(local.steps),
                                  np.asarray(sharded.steps))
    np.testing.assert_array_equal(np.asarray(local.success),
                                  np.asarray(sharded.success))
    np.testing.assert_allclose(np.asarray(local.cum_obj),
                               np.asarray(sharded.cum_obj), rtol=1e-4)


def test_sharded_solver_honors_model_and_dynamic_cvar():
    """The sharded solve must honor the FULL static signature: non-unicycle
    models and the dynamic-CVaR sentinel (both previously silently ignored)."""
    import dataclasses
    import __graft_entry__ as g
    from mppi_numba_tpu.parallel.mesh import make_mesh
    from mppi_numba_tpu.parallel.sharded import get_sharded_terrain_solver
    from mppi_numba_tpu.solver import DYNAMIC_CVAR, get_terrain_solver

    S, K = 2, 64
    static, maps, task, u0 = g._make_problem(S=S, K=K, M=8, T=8, H=7, W=7)
    static = dataclasses.replace(static, model="bicycle",
                                 cvar_numel=DYNAMIC_CVAR, backend="xla")
    task = task._replace(cvar_alpha=jnp.full((S,), 0.5, jnp.float32))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))

    mesh = make_mesh(1, 8)
    u_sh, costs_sh = get_sharded_terrain_solver(static, mesh)(
        keys, maps, task, u0)

    # Single-device oracle: same static, vmapped over scenarios.
    solve = get_terrain_solver(static)
    u_ref, _ = jax.vmap(solve)(keys, maps, task,
                               jnp.zeros_like(np.asarray(u_sh)))
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=2e-4, atol=2e-5)
