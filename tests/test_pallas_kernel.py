"""Pallas rollout kernel vs the XLA rollout core, in interpreter mode.

XLA functional semantics removes the reference's race-condition class;
the Pallas kernel is instead validated in interpret mode on CPU
(SURVEY §5.2) and against the same NumPy oracle chain as the XLA core.
On real TPU hardware the compiled kernel is additionally exercised by
bench.py and __graft_entry__.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import pack_map_words
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    build_task_vec, pallas_rollout_supported, terrain_rollout_costs_pallas)
from mppi_numba_tpu.ops.rollout import (_clipped_controls_tk,
                                        terrain_rollout_costs)
from mppi_numba_tpu.types import TerrainTask


def build_problem(seed=0, K=128, M=12, T=20, H=9, W=11):
    rng = np.random.RandomState(seed)
    lin = rng.randint(0, 101, (M, H, W)).astype(np.int8)
    ang = rng.randint(0, 101, (M, H, W)).astype(np.int8)
    obs = (rng.rand(H, W) < 0.1).astype(np.int8)
    unk = (rng.rand(H, W) < 0.1).astype(np.int8)
    risk = rng.randint(1, 101, (H, W)).astype(np.int8)
    f32 = np.float32
    task = TerrainTask(
        x0=jnp.asarray([1.7, 1.3, 0.4], jnp.float32),
        xgoal=jnp.asarray([2.9, 2.6], jnp.float32),
        goal_tolerance=f32(0.3), v_post_rollout=f32(0.5),
        lambda_weight=f32(1.2),
        u_std=jnp.asarray([0.7, 1.1], jnp.float32),
        vrange=jnp.asarray([0.0, 2.0], jnp.float32),
        wrange=jnp.asarray([-2.5, 2.5], jnp.float32),
        dt=f32(0.1), dist_weight=f32(1.7), obs_penalty=f32(1e4),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(0.5),
        xlim0=f32(0.0), ylim0=f32(0.0), lin_lb=f32(0.0), lin_ratio=f32(0.01),
        ang_lb=f32(0.0), ang_ratio=f32(0.01))
    u_cur = jnp.asarray(rng.uniform(-0.5, 1.5, (T, 2)).astype(np.float32))
    noise = jnp.asarray((rng.randn(K, T, 2) * np.array([0.7, 1.1])
                         ).astype(np.float32))
    return task, lin, ang, obs, unk, risk, u_cur, noise


@pytest.mark.parametrize("speed_map", [False, True])
def test_pallas_kernel_matches_xla_rollout(speed_map):
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem()
    T = u_cur.shape[0]
    H, W = lin.shape[1:]
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if speed_map else None)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=speed_map))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=T, speed_map=speed_map, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pallas_kernel_odd_shapes():
    """M not multiple of the sublane tile; map smaller than one lane chunk."""
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
        seed=3, K=128, M=5, T=10, H=4, W=6)
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk))
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=4, W=6, T=10, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_supported_predicate():
    assert pallas_rollout_supported(1024, 225)
    assert pallas_rollout_supported(32, 104 * 104)
    assert not pallas_rollout_supported(1024, 250 * 250)


def test_pallas_kernel_multichunk_map():
    """Map wider than one 128-lane chunk exercises the chunk-select path."""
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
        seed=5, K=128, M=8, T=15, H=13, W=15)   # 195 cells -> 2 chunks
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk))
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=13, W=15, T=15, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
