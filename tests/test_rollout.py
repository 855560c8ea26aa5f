"""Vectorized rollout cores vs the per-(k, m) NumPy oracle at matched noise
and matched sampled maps — the deterministic-pipeline parity gate
(SURVEY §6, BASELINE.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import pack_map_words
from mppi_numba_tpu.ops.rollout import (barebone_rollout_costs,
                                        control_coupling,
                                        terrain_rollout_costs)
from mppi_numba_tpu.ops.cvar import cvar_from_costs
from mppi_numba_tpu.types import BareboneTask, TerrainTask

import oracle


def random_problem(seed, K=6, M=4, T=15, H=8, W=7, speed_map=False):
    rng = np.random.RandomState(seed)
    lin_grids = rng.randint(0, 101, size=(M, H, W)).astype(np.int8)
    ang_grids = rng.randint(0, 101, size=(M, H, W)).astype(np.int8)
    obstacle = (rng.rand(H, W) < 0.1).astype(np.int8)
    unknown = (rng.rand(H, W) < 0.1).astype(np.int8)
    risk = rng.randint(1, 101, size=(H, W)).astype(np.int8)

    res = 0.5
    task = dict(
        x0=np.array([1.7, 1.3, 0.4], np.float32),
        xgoal=np.array([2.9, 2.6], np.float32),
        goal_tolerance=np.float32(0.3),
        v_post_rollout=np.float32(0.5),
        lambda_weight=np.float32(1.2),
        u_std=np.array([0.7, 1.1], np.float32),
        vrange=np.array([0.0, 2.0], np.float32),
        wrange=np.array([-2.5, 2.5], np.float32),
        dt=np.float32(0.1),
        dist_weight=np.float32(1.7),
        obs_penalty=np.float32(1e4),
        unknown_penalty=np.float32(1e2),
        alpha_dyn=np.float32(1.0),
        res=np.float32(res),
        xlim0=np.float32(0.0),
        ylim0=np.float32(0.0),
        lin_lb=np.float32(0.0),
        lin_ratio=np.float32(0.01),
        ang_lb=np.float32(0.0),
        ang_ratio=np.float32(0.01),
    )
    u_cur = rng.uniform(-0.5, 1.5, size=(T, 2)).astype(np.float32)
    noise = (rng.randn(K, T, 2) * task["u_std"]).astype(np.float32)
    return task, lin_grids, ang_grids, obstacle, unknown, risk, u_cur, noise


def to_task(d):
    return TerrainTask(**{k: jnp.asarray(v) for k, v in d.items()})


@pytest.mark.parametrize("speed_map", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_terrain_rollout_matches_oracle(seed, speed_map):
    task_d, ling, angg, obs, unk, risk, u_cur, noise = random_problem(seed)
    K, T, _ = noise.shape
    M, H, W = ling.shape

    packed = pack_map_words(jnp.asarray(ling), jnp.asarray(angg),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if speed_map else None)
    got = np.asarray(terrain_rollout_costs(packed, to_task(task_d),
                                           jnp.asarray(u_cur),
                                           jnp.asarray(noise),
                                           speed_map=speed_map))
    assert got.shape == (K, M)

    for k in range(K):
        for mi in range(M):
            expect = oracle.rollout_cost_single(
                ling[mi], angg[mi], obs, unk,
                task_d["lin_lb"], task_d["lin_ratio"],
                task_d["ang_lb"], task_d["ang_ratio"],
                task_d["res"], task_d["xlim0"], task_d["ylim0"],
                task_d["vrange"], task_d["wrange"], task_d["xgoal"],
                task_d["v_post_rollout"], task_d["obs_penalty"],
                task_d["unknown_penalty"], task_d["goal_tolerance"],
                task_d["lambda_weight"], task_d["u_std"],
                task_d["x0"], task_d["dt"], task_d["dist_weight"],
                noise[k], u_cur, risk_grid=risk if speed_map else None)
            # The oracle includes coupling; the vectorized core splits it out.
            coup = float(np.asarray(control_coupling(
                jnp.asarray(u_cur), jnp.asarray(noise[k:k + 1]),
                jnp.asarray(task_d["u_std"]),
                jnp.asarray(task_d["lambda_weight"])))[0])
            np.testing.assert_allclose(got[k, mi] + coup, expect,
                                       rtol=2e-4, atol=2e-3)


def test_early_goal_termination_freezes_cost():
    """A rollout that reaches the goal accrues no further stage/map cost but
    keeps the full coupling term (reference break semantics, SURVEY §2.6)."""
    task_d, ling, angg, obs, unk, risk, u_cur, noise = random_problem(4, T=30)
    # Put the goal right next to the start so some rollouts reach it.
    task_d["xgoal"] = np.array([1.9, 1.4], np.float32)
    task_d["goal_tolerance"] = np.float32(0.4)
    packed = pack_map_words(jnp.asarray(ling), jnp.asarray(angg),
                            jnp.asarray(obs), jnp.asarray(unk))
    got = np.asarray(terrain_rollout_costs(packed, to_task(task_d),
                                           jnp.asarray(u_cur),
                                           jnp.asarray(noise)))
    for k in range(noise.shape[0]):
        for mi in range(ling.shape[0]):
            expect = oracle.rollout_cost_single(
                ling[mi], angg[mi], obs, unk,
                task_d["lin_lb"], task_d["lin_ratio"],
                task_d["ang_lb"], task_d["ang_ratio"],
                task_d["res"], task_d["xlim0"], task_d["ylim0"],
                task_d["vrange"], task_d["wrange"], task_d["xgoal"],
                task_d["v_post_rollout"], task_d["obs_penalty"],
                task_d["unknown_penalty"], task_d["goal_tolerance"],
                task_d["lambda_weight"], task_d["u_std"],
                task_d["x0"], task_d["dt"], task_d["dist_weight"],
                noise[k], u_cur)
            coup = float(np.asarray(control_coupling(
                jnp.asarray(u_cur), jnp.asarray(noise[k:k + 1]),
                jnp.asarray(task_d["u_std"]),
                jnp.asarray(task_d["lambda_weight"])))[0])
            np.testing.assert_allclose(got[k, mi] + coup, expect,
                                       rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("alpha", [0.25, 0.5, 1.0])
def test_cvar_matches_sort_oracle(alpha):
    rng = np.random.RandomState(0)
    costs = rng.rand(7, 16).astype(np.float32) * 100
    import math
    numel = math.ceil(16 * alpha)
    got = np.asarray(cvar_from_costs(jnp.asarray(costs), numel))
    for k in range(7):
        np.testing.assert_allclose(got[k], oracle.cvar_reduce(costs[k], alpha),
                                   rtol=1e-6)


def test_barebone_rollout_matches_oracle():
    rng = np.random.RandomState(2)
    K, T = 8, 20
    task_d = dict(
        x0=np.array([0.0, 0.0, 0.7], np.float32),
        xgoal=np.array([3.0, 2.0], np.float32),
        goal_tolerance=np.float32(0.5),
        lambda_weight=np.float32(1.0),
        u_std=np.array([1.0, 1.0], np.float32),
        vrange=np.array([0.0, 2.0], np.float32),
        wrange=np.array([-3.14, 3.14], np.float32),
        dt=np.float32(0.1),
        dist_weight=np.float32(10.0),
        obs_penalty=np.float32(1e4),
        obs_pos=np.array([[1.5, 1.0], [0.5, 0.2]], np.float32),
        obs_r=np.array([0.5, 0.3], np.float32),
    )
    u_cur = rng.uniform(-0.5, 1.5, size=(T, 2)).astype(np.float32)
    noise = (rng.randn(K, T, 2)).astype(np.float32)

    task = BareboneTask(**{k: jnp.asarray(v) for k, v in task_d.items()})
    got = np.asarray(barebone_rollout_costs(task, jnp.asarray(u_cur),
                                            jnp.asarray(noise)))
    for k in range(K):
        expect = oracle.barebone_rollout_cost(
            task_d["vrange"], task_d["wrange"], task_d["xgoal"],
            task_d["obs_penalty"], task_d["obs_pos"], task_d["obs_r"],
            task_d["goal_tolerance"], task_d["lambda_weight"],
            task_d["u_std"], task_d["x0"], task_d["dt"],
            task_d["dist_weight"], noise[k], u_cur)
        coup = float(np.asarray(control_coupling(
            jnp.asarray(u_cur), jnp.asarray(noise[k:k + 1]),
            jnp.asarray(task_d["u_std"]),
            jnp.asarray(task_d["lambda_weight"])))[0])
        np.testing.assert_allclose(got[k] + coup, expect, rtol=2e-4, atol=2e-3)
