"""Device-resident closed-loop episodes (CPU/XLA backend)."""

import numpy as np

import jax
import jax.numpy as jnp

from mppi_numba_tpu import Config, default_benchmark_params, make_benchmark_world
from mppi_numba_tpu.benchmark import run_trials_device


def test_run_trials_device_schema_and_success():
    world = make_benchmark_world(num_bins=10, rng=np.random.RandomState(0))
    cfg = Config(T=6.0, dt=0.1, num_grid_samples=16, num_control_rollouts=128,
                 max_speed_padding=3.0, num_vis_state_rollouts=1,
                 max_map_dim=(15, 15), seed=1, use_tdm=True)
    params = default_benchmark_params(cfg, (9, 9), mud_margin=1)
    df = run_trials_device(cfg, world, max_steps=120, grid_shape=(9, 9),
                           mud_margin=1, res=1.0,
                           default_mppi_params=params,
                           grass_density_list=[0.2], envs_per_density=1,
                           trials_per_env=2, alpha_list=[1.0, 0.5],
                           method_list=["noisy_dyn", "risk_dyn"],
                           verbose=False)
    assert len(df) == 8
    # Low vegetation density, generous horizon: everything should succeed.
    assert df["success"].mean() > 0.7
    assert np.isfinite(df["cum_obj"]).all()
    ttg = df[df["success"]]["time_to_goal"]
    assert (ttg > 0).all() and (ttg <= 12.0).all()


def test_device_trial_single_matches_batch():
    """The while_loop single-trial engine and the masked fori batch engine
    agree for the same key/inputs."""
    from mppi_numba_tpu.config import SolverStatic
    from mppi_numba_tpu.device_sim import (make_device_trial,
                                           make_device_trial_batch)
    from mppi_numba_tpu.types import MapInputs, TerrainTask

    rng = np.random.RandomState(0)
    B_bins, H, W = 6, 9, 9
    raw = rng.randint(0, 100, size=(B_bins, H, W)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    qbins = np.linspace(0, 100, B_bins).astype(np.int8)
    maps = MapInputs(jnp.asarray(pmf), jnp.asarray(pmf), jnp.asarray(qbins),
                     jnp.asarray(qbins), jnp.zeros((H, W), jnp.int8),
                     jnp.zeros((H, W), jnp.int8), jnp.zeros((H, W), jnp.int8))
    f32 = np.float32
    task = TerrainTask(
        x0=jnp.asarray([2.0, 2.0, 0.8], jnp.float32),
        xgoal=jnp.asarray([6.0, 6.0], jnp.float32),
        goal_tolerance=f32(0.5), v_post_rollout=f32(0.01),
        lambda_weight=f32(1.0), u_std=jnp.asarray([1.5, 2.0], jnp.float32),
        vrange=jnp.asarray([0.0, 2.0], jnp.float32),
        wrange=jnp.asarray([-3.14, 3.14], jnp.float32), dt=f32(0.1),
        dist_weight=f32(1.0), obs_penalty=f32(1e5), unknown_penalty=f32(1e2),
        alpha_dyn=f32(1.0), res=f32(1.0), xlim0=f32(0.0), ylim0=f32(0.0),
        lin_lb=f32(0.0), lin_ratio=f32(0.01), ang_lb=f32(0.0),
        ang_ratio=f32(0.01))
    static = SolverStatic("tdm", 30, 128, 8, (H, W), 0, 8, 1, 1)
    gt_lin = jnp.full((H, W), 0.7, jnp.float32)
    gt_ang = jnp.full((H, W), 0.7, jnp.float32)
    gt_meta = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    key = jax.random.PRNGKey(3)

    single = make_device_trial(static, 40)
    batch = make_device_trial_batch(static, 40)
    r1 = single(key, maps, task, gt_lin, gt_ang, gt_meta)
    rb = batch(*jax.tree.map(lambda x: x[None], (key, maps, task, gt_lin,
                                                 gt_ang, gt_meta)))
    assert int(r1.steps) == int(rb.steps[0])
    assert bool(r1.success) == bool(rb.success[0])
    np.testing.assert_allclose(float(r1.cum_obj), float(rb.cum_obj[0]),
                               rtol=1e-5)
