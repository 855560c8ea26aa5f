"""Pluggable dynamics models: registry, bicycle model, solver integration."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.models import (bicycle_step, get_step_fn,
                                   make_bicycle_step, register_model,
                                   unicycle_step)
from mppi_numba_tpu.solver import get_terrain_solver, resolve_backend
from mppi_numba_tpu.types import MapInputs, TerrainTask


def test_registry_roundtrip_and_unknown_name():
    assert get_step_fn("unicycle") is unicycle_step
    assert get_step_fn("bicycle") is bicycle_step
    with pytest.raises(ValueError, match="unknown dynamics model"):
        get_step_fn("hovercraft")
    register_model("hovercraft", unicycle_step)
    assert get_step_fn("hovercraft") is unicycle_step


def test_bicycle_step_matches_hand_math():
    L = 0.7
    step = make_bicycle_step(L)
    x, y, th = 1.0, 2.0, 0.3
    v, delta = 1.5, 0.2
    lt, at = 0.8, 0.9
    dt = 0.1
    xn, yn, tn = step(jnp.float32(x), jnp.float32(y), jnp.float32(th),
                      jnp.float32(v), jnp.float32(delta), jnp.float32(lt),
                      jnp.float32(at), jnp.float32(dt))
    assert np.isclose(float(xn), x + dt * lt * v * math.cos(th), atol=1e-6)
    assert np.isclose(float(yn), y + dt * lt * v * math.sin(th), atol=1e-6)
    assert np.isclose(float(tn), th + dt * at * v * math.tan(delta) / L,
                      atol=1e-6)


def _tiny_problem(model):
    K, M, T, H, W, B = 64, 4, 10, 7, 7, 6
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
        xgoal=jnp.asarray(np.array([4.0, 4.0], f32)),
        goal_tolerance=f32(0.5), v_post_rollout=f32(0.01),
        lambda_weight=f32(1.0),
        u_std=jnp.asarray(np.array([1.0, 0.5], f32)),
        vrange=jnp.asarray(np.array([0.0, 2.0], f32)),
        wrange=jnp.asarray(np.array([-0.5, 0.5], f32)),
        dt=f32(0.1), dist_weight=f32(1.0), obs_penalty=f32(1e5),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(1.0),
        xlim0=f32(-1.0), ylim0=f32(-1.0), lin_lb=f32(0.0), lin_ratio=f32(0.01),
        ang_lb=f32(0.0), ang_ratio=f32(0.01))
    static = SolverStatic(mode="tdm", num_steps=T, num_control_rollouts=K,
                          num_grid_samples=M, map_shape=(H, W),
                          num_obstacles=0, cvar_numel=M, num_opt=1,
                          num_vis_state_rollouts=1, model=model)
    return static, maps, task, jnp.zeros((T, 2), jnp.float32)


def test_solver_with_bicycle_model_runs_and_differs_from_unicycle():
    static_b, maps, task, u0 = _tiny_problem("bicycle")
    static_u = static_b._replace(model="unicycle") if hasattr(
        static_b, "_replace") else None
    key = jax.random.PRNGKey(0)

    assert resolve_backend(static_b) == "xla"
    u_b, aux_b = get_terrain_solver(static_b)(key, maps, task, u0)
    assert u_b.shape == (static_b.num_steps, 2)
    assert np.isfinite(np.asarray(u_b)).all()

    import dataclasses
    static_u = dataclasses.replace(static_b, model="unicycle")
    u_u, _ = get_terrain_solver(static_u)(key, maps, task,
                                          jnp.zeros_like(u0))
    # Same noise, different dynamics -> different optimized controls.
    assert not np.allclose(np.asarray(u_b), np.asarray(u_u))
