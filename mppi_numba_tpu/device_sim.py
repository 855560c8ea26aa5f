"""Device-resident closed-loop episodes: solve -> simulate -> shift on-chip.

The reference's benchmark loop crosses the host<->device boundary twice per
control step (solve D2H + shift H2D; reference: benchmark.ipynb[cell 4],
SURVEY §3.5).  On TPU the simulator itself — a ground-truth traction lookup
plus one Euler step — is trivially expressible on device, so an ENTIRE
episode becomes one ``lax.while_loop`` around the fused solve, and a batch
of episodes (different maps, realizations, or hyperparameters) becomes one
``vmap``: the 1,800-trial benchmark that takes the reference 2,421 s of
sequential GPU calls collapses into a handful of batched device programs.

Trials in this engine are independent (fresh warm start per trial); the
host engine in ``benchmark.py`` preserves the reference's exact sequencing
instead (including its carry-over of the warm start between realizations).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import SolverStatic
from .solver import get_terrain_solver
from .types import MapInputs, TerrainTask


class TrialResult(NamedTuple):
    """Per-trial metrics, matching the reference trial logger semantics."""
    steps: object          # int32 — steps taken (t+1 at reach, else max_steps)
    success: object        # bool
    dist_to_goal: object   # final dist - tolerance (even when reached)
    cum_dist_to_goal: object
    cum_obj: object


def _make_step_core(solve_fn):
    """The shared episode step: solve -> ground-truth Euler step -> shift.

    Returns ``step(x, u, key, maps, task, gt_lin, gt_ang, gt_meta) ->
    (x_new, u_shifted, key_new, dist_new)``.  Both episode engines (early-
    exit single trial, masked batch) wrap this one body so their closed-loop
    semantics cannot drift apart.
    """

    def gt_lookup(gt_lin, gt_ang, meta, x, y):
        Hg, Wg = gt_lin.shape
        xi = jnp.floor((x - meta[0]) * meta[2]).astype(jnp.int32)
        yi = jnp.floor((y - meta[1]) * meta[2]).astype(jnp.int32)
        inb = (xi >= 0) & (xi < Wg) & (yi >= 0) & (yi < Hg)
        xi = jnp.clip(xi, 0, Wg - 1)
        yi = jnp.clip(yi, 0, Hg - 1)
        lt = jnp.where(inb, gt_lin[yi, xi], 0.0)
        at = jnp.where(inb, gt_ang[yi, xi], 0.0)
        return lt, at

    def step(x, u, key, maps, task, gt_lin, gt_ang, gt_meta):
        key, sub = jax.random.split(key)
        task_t = task._replace(x0=x)
        u_new, _ = solve_fn(sub, maps, task_t, u)
        u0 = u_new[0]

        lt, at = gt_lookup(gt_lin, gt_ang, gt_meta, x[0], x[1])
        x_new = jnp.stack([
            x[0] + task.dt * lt * jnp.cos(x[2]) * u0[0],
            x[1] + task.dt * lt * jnp.sin(x[2]) * u0[0],
            x[2] + task.dt * at * u0[1],
        ])
        # Receding-horizon shift (reference: mppi_numba/mppi.py:539-542).
        u_shift = jnp.concatenate([u_new[1:], u_new[-1:]], axis=0)
        dist_new = (jnp.linalg.norm(x_new[:2] - task.xgoal)
                    - task.goal_tolerance)
        return x_new, u_shift, key, dist_new

    return step


def make_device_trial(static: SolverStatic, max_steps: int):
    """Build ``trial_fn(key, maps, task, gt_lin, gt_ang, gt_meta) ->
    TrialResult`` running one full closed-loop episode on device.

    ``gt_lin`` / ``gt_ang`` are the ground-truth realized traction grids
    (float32 ``(Hg, Wg)``, unpadded) and ``gt_meta`` is
    ``[xlim0, ylim0, inv_res]`` for the simulator's lookup, which returns
    zero traction outside bounds (reference: mppi_numba/terrain.py:775-782).
    Uses a ``while_loop`` so the episode EXITS EARLY at goal reach.
    """
    solve_fn = get_terrain_solver(static)
    step_core = _make_step_core(solve_fn)
    T = static.num_steps

    def trial_fn(key, maps, task, gt_lin, gt_ang, gt_meta):
        def cond(carry):
            t, x, u, key, reached, *_ = carry
            return jnp.logical_and(t < max_steps, jnp.logical_not(reached))

        def body(carry):
            t, x, u, key, reached, cum_obj, cum_dist, dist = carry
            x_new, u_shift, key, dist_new = step_core(
                x, u, key, maps, task, gt_lin, gt_ang, gt_meta)
            cum_obj = cum_obj + task.dt + dist_new
            cum_dist = cum_dist + dist_new
            reached = dist_new <= 0
            return (t + 1, x_new, u_shift, key, reached, cum_obj, cum_dist,
                    dist_new)

        init = (jnp.int32(0), task.x0, jnp.zeros((T, 2), jnp.float32), key,
                jnp.bool_(False), jnp.float32(0.0), jnp.float32(0.0),
                jnp.float32(np.nan))
        t, x, u, key, reached, cum_obj, cum_dist, dist = \
            jax.lax.while_loop(cond, body, init)
        # Timeout penalty (reference trial: cum_obj += dist / v_post).
        cum_obj = jnp.where(reached, cum_obj,
                            cum_obj + dist / task.v_post_rollout)
        return TrialResult(steps=t, success=reached, dist_to_goal=dist,
                           cum_dist_to_goal=cum_dist, cum_obj=cum_obj)

    return jax.jit(trial_fn)


def make_episode_fn(static: SolverStatic, max_steps: int):
    """One full masked-early-exit episode as a pure function (no jit/vmap).

    Building block for both the local batched engine below and the
    scenario-sharded multi-chip engine (``parallel.sharded``).
    """
    solve_fn = get_terrain_solver(static)
    step_core = _make_step_core(solve_fn)
    T = static.num_steps

    def one(key, maps, task, gt_lin, gt_ang, gt_meta):
        def body(t, carry):
            x, u, key, reached, steps, cum_obj, cum_dist, dist = carry
            x_new, u_shift, key, dist_new = step_core(
                x, u, key, maps, task, gt_lin, gt_ang, gt_meta)

            active = jnp.logical_not(reached)
            x = jnp.where(active, x_new, x)
            u = jnp.where(active, u_shift, u)
            cum_obj = cum_obj + jnp.where(active, task.dt + dist_new, 0.0)
            cum_dist = cum_dist + jnp.where(active, dist_new, 0.0)
            dist = jnp.where(active, dist_new, dist)
            steps = steps + active.astype(jnp.int32)
            reached = jnp.logical_or(reached, dist_new <= 0)
            return (x, u, key, reached, steps, cum_obj, cum_dist, dist)

        init = (task.x0, jnp.zeros((T, 2), jnp.float32), key,
                jnp.bool_(False), jnp.int32(0), jnp.float32(0.0),
                jnp.float32(0.0), jnp.float32(np.nan))
        x, u, key, reached, steps, cum_obj, cum_dist, dist = \
            jax.lax.fori_loop(0, max_steps, body, init)
        cum_obj = jnp.where(reached, cum_obj,
                            cum_obj + dist / task.v_post_rollout)
        return TrialResult(steps=steps, success=reached, dist_to_goal=dist,
                           cum_dist_to_goal=cum_dist, cum_obj=cum_obj)

    return one


@functools.lru_cache(maxsize=None)
def make_device_trial_batch(static: SolverStatic, max_steps: int):
    """vmapped trial engine: every argument gains a leading batch axis.

    Batched early exit uses a fixed ``fori_loop`` with per-trial masking so
    the batch stays SIMD; finished trials freeze their state.
    """
    return jax.jit(jax.vmap(make_episode_fn(static, max_steps)))
