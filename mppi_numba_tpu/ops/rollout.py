"""Batched rollout cores: the hot loop of the engine.

The reference evaluates K control sequences x M sampled traction maps with
one CUDA block per sequence and one thread per map, each thread running a
sequential T-step Euler loop with per-step int8 map reads
(reference: mppi_numba/mppi.py:613-756).  The TPU-native formulation keeps
the (inherently sequential) horizon as a ``lax.scan`` and makes BOTH batch
axes tensor axes: every step updates ``(K, M)`` state planes on the VPU and
issues a single bit-packed int32 gather per (k, m) (see ``ops/packing.py``).

Semantics preserved exactly (for matched noise / matched sampled maps):

* cell indices are computed from the PRE-update state and used for both the
  traction decode and the obstacle/unknown penalty
  (reference: mppi_numba/mppi.py:679-701);
* the step that reaches the goal still accrues its stage + map penalties,
  later steps accrue nothing ("break" becomes a ``reached`` mask — SURVEY
  §2.6 last bullet);
* the terminal cost uses the distance at the break/final step;
* the control-coupling term sums over ALL T steps regardless of early goal
  reach; it is constant across the M map samples, so it commutes with the
  CVaR reduction and is added per-k by the solver (reference adds it
  per-thread before the in-block sort, mppi.py:708-710 — same result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import unicycle_step
from .costs import stage_cost, term_cost, barebone_stage_cost, barebone_term_cost


def _clipped_controls_tk(u_cur, noise, vrange, wrange):
    """Pre-clip noisy controls for all steps: returns (T, K) v and w."""
    v = jnp.clip(u_cur[:, 0][:, None] + noise[:, :, 0].T, vrange[0], vrange[1])
    w = jnp.clip(u_cur[:, 1][:, None] + noise[:, :, 1].T, wrange[0], wrange[1])
    return v, w


def terrain_rollout_costs(packed_words, task, u_cur, noise, *, speed_map=False,
                          step_fn=unicycle_step):
    """Roll out K noisy control sequences over M sampled traction maps.

    Args:
      packed_words: int32 ``(M, H, W)`` packed map words.
      task: ``TerrainTask``.
      u_cur: float32 ``(T, 2)`` nominal control sequence.
      noise: float32 ``(K, T, 2)`` control perturbations.
      speed_map: static — scale the time cost by the CVaR speed map
        (reference: mppi_numba/mppi.py:1095-1096).
      step_fn: static dynamics step ``(x, y, th, v, w, lin_tr, ang_tr, dt)
        -> (x, y, th)`` (see ``models``); defaults to the reference's
        traction-scaled unicycle.

    Returns:
      float32 ``(K, M)`` rollout costs including the terminal cost but
      excluding the control-coupling term (see module docstring).
    """
    M, H, W = packed_words.shape
    K = noise.shape[0]
    f32 = jnp.float32
    packed_flat = packed_words.reshape(-1)

    inv_res = 1.0 / task.res
    xlim0, ylim0 = task.xlim0, task.ylim0
    gx, gy = task.xgoal[0], task.xgoal[1]
    tol2 = task.goal_tolerance * task.goal_tolerance
    dt = task.dt
    lin_lb, lin_ratio = task.lin_lb, task.lin_ratio
    ang_lb, ang_ratio = task.ang_lb, task.ang_ratio
    m_off = (jnp.arange(M, dtype=jnp.int32) * (H * W))[None, :]   # (1, M)

    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)

    def step(carry, inp):
        x, y, th, cost, reached, dist2 = carry
        v_t, w_t = inp                                            # (K,)
        xi = jnp.floor((x - xlim0) * inv_res).astype(jnp.int32)
        yi = jnp.floor((y - ylim0) * inv_res).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        words = jnp.take(packed_flat, yi * W + xi + m_off)        # (K, M)

        lin_tr = lin_lb + lin_ratio * (words & 0xFF).astype(f32)
        ang_tr = ang_lb + ang_ratio * ((words >> 8) & 0xFF).astype(f32)
        obs = ((words >> 16) & 1).astype(f32)
        unk = ((words >> 17) & 1).astype(f32)

        x_new, y_new, th_new = step_fn(x, y, th, v_t[:, None], w_t[:, None],
                                       lin_tr, ang_tr, dt)

        dist2_new = (gx - x_new) ** 2 + (gy - y_new) ** 2
        if speed_map:
            eff = lin_lb + lin_ratio * ((words >> 18) & 0xFF).astype(f32)
            dt_eff = dt / (eff + 1e-6)
        else:
            dt_eff = dt
        step_cost = (stage_cost(dist2_new, dt_eff, task.dist_weight)
                     + obs * task.obs_penalty + unk * task.unknown_penalty)

        # x/y/th need no post-reach freeze: all their consumers are masked by
        # ``active`` and the terminal cost reads the frozen dist2 only.
        active = jnp.logical_not(reached)
        cost = cost + jnp.where(active, step_cost, 0.0)
        dist2 = jnp.where(active, dist2_new, dist2)
        reached = jnp.logical_or(reached, jnp.logical_and(active, dist2_new <= tol2))
        return (x_new, y_new, th_new, cost, reached, dist2), None

    km = (K, M)
    carry0 = (jnp.broadcast_to(task.x0[0].astype(f32), km),
              jnp.broadcast_to(task.x0[1].astype(f32), km),
              jnp.broadcast_to(task.x0[2].astype(f32), km),
              jnp.zeros(km, f32),
              jnp.zeros(km, bool),
              jnp.full(km, 1e9, f32))
    (x, y, th, cost, reached, dist2), _ = jax.lax.scan(step, carry0, (v_all, w_all))
    cost = cost + term_cost(dist2, task.v_post_rollout, reached.astype(f32))
    return cost


def control_coupling(u_cur, noise, u_std, lambda_weight):
    """MPPI information-theoretic coupling: lambda * sum_t (u/sigma^2) . eps.

    Summed over all T steps regardless of early goal reach
    (reference: mppi_numba/mppi.py:708-710).  Returns ``(K,)``.
    """
    scaled = u_cur / (u_std * u_std)                              # (T, 2)
    return lambda_weight * jnp.sum(noise * scaled[None], axis=(1, 2))


def terrain_vis_states(packed_words, task, controls, *,
                       step_fn=unicycle_step):
    """Noise-free-dynamics state rollouts for visualization.

    Args:
      packed_words: int32 ``(V, H, W)`` — one packed map per rollout (the
        det modes pass the same map V times; broadcasting keeps this free).
      task: ``TerrainTask``.
      controls: float32 ``(V, T, 2)`` final per-rollout controls (callers
        pre-add noise / pre-clip to mirror the reference vis kernels,
        reference: mppi_numba/mppi.py:1194-1351).
      step_fn: static dynamics step (see ``terrain_rollout_costs``).

    Returns:
      float32 ``(V, T+1, 3)`` state trajectories (no goal break — the
      reference vis kernels roll the full horizon).
    """
    V, H, W = packed_words.shape
    f32 = jnp.float32
    packed_flat = packed_words.reshape(-1)
    v_off = (jnp.arange(V, dtype=jnp.int32) * (H * W))

    inv_res = 1.0 / task.res
    xlim0, ylim0 = task.xlim0, task.ylim0
    dt = task.dt
    lin_lb, lin_ratio = task.lin_lb, task.lin_ratio
    ang_lb, ang_ratio = task.ang_lb, task.ang_ratio

    vw = jnp.transpose(controls, (1, 0, 2))                       # (T, V, 2)

    def step(carry, u_t):
        x, y, th = carry
        xi = jnp.clip(jnp.floor((x - xlim0) * inv_res).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.floor((y - ylim0) * inv_res).astype(jnp.int32), 0, H - 1)
        words = jnp.take(packed_flat, yi * W + xi + v_off)        # (V,)
        lin_tr = lin_lb + lin_ratio * (words & 0xFF).astype(f32)
        ang_tr = ang_lb + ang_ratio * ((words >> 8) & 0xFF).astype(f32)
        x, y, th = step_fn(x, y, th, u_t[:, 0], u_t[:, 1], lin_tr, ang_tr, dt)
        return (x, y, th), jnp.stack([x, y, th], axis=-1)

    x0 = jnp.broadcast_to(task.x0[0].astype(f32), (V,))
    y0 = jnp.broadcast_to(task.x0[1].astype(f32), (V,))
    th0 = jnp.broadcast_to(task.x0[2].astype(f32), (V,))
    _, states = jax.lax.scan(step, (x0, y0, th0), vw)             # (T, V, 3)
    first = jnp.broadcast_to(task.x0.astype(f32), (V, 3))[None]
    return jnp.concatenate([first, states], axis=0).transpose(1, 0, 2)


def barebone_rollout_costs(task, u_cur, noise):
    """Terrain-free rollouts with analytic circular obstacles.

    Matches the standalone barebone engine (reference:
    barebone_mppi_numba.ipynb[cell 3]): nominal unicycle dynamics,
    ``stage = dist_weight * dist2`` (squared — no dt term, no sqrt),
    per-obstacle penalty ``(1 - (dist_diff > 0)) * obs_cost`` where
    ``dist_diff = (x-ox)^2 + (y-oy)^2 - r^2`` evaluated at the POST-update
    state, terminal ``(1 - reached) * dist2``.

    Returns float32 ``(K,)`` costs excluding the coupling term.
    """
    K = noise.shape[0]
    f32 = jnp.float32
    gx, gy = task.xgoal[0], task.xgoal[1]
    tol2 = task.goal_tolerance * task.goal_tolerance
    dt = task.dt
    ox = task.obs_pos[:, 0][None]                                 # (1, N)
    oy = task.obs_pos[:, 1][None]
    r2 = (task.obs_r * task.obs_r)[None]

    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)

    def step(carry, inp):
        x, y, th, cost, reached, dist2 = carry
        v_t, w_t = inp
        x_new = x + dt * v_t * jnp.cos(th)
        y_new = y + dt * v_t * jnp.sin(th)
        th_new = th + dt * w_t
        dist2_new = (gx - x_new) ** 2 + (gy - y_new) ** 2
        d2obs = (x_new[:, None] - ox) ** 2 + (y_new[:, None] - oy) ** 2
        n_hit = jnp.sum((d2obs <= r2).astype(f32), axis=1)        # (K,)
        step_cost = (barebone_stage_cost(dist2_new, task.dist_weight)
                     + n_hit * task.obs_penalty)

        active = jnp.logical_not(reached)
        cost = cost + jnp.where(active, step_cost, 0.0)
        dist2 = jnp.where(active, dist2_new, dist2)
        reached = jnp.logical_or(reached, jnp.logical_and(active, dist2_new <= tol2))
        return (x_new, y_new, th_new, cost, reached, dist2), None

    carry0 = (jnp.broadcast_to(task.x0[0].astype(f32), (K,)),
              jnp.broadcast_to(task.x0[1].astype(f32), (K,)),
              jnp.broadcast_to(task.x0[2].astype(f32), (K,)),
              jnp.zeros((K,), f32),
              jnp.zeros((K,), bool),
              jnp.full((K,), 1e9, f32))
    (x, y, th, cost, reached, dist2), _ = jax.lax.scan(step, carry0, (v_all, w_all))
    return cost + barebone_term_cost(dist2, reached.astype(f32))


def barebone_vis_states(task, controls):
    """Nominal-dynamics vis rollouts for the barebone engine: (V, T+1, 3)."""
    f32 = jnp.float32
    V = controls.shape[0]
    dt = task.dt
    vw = jnp.transpose(controls, (1, 0, 2))

    def step(carry, u_t):
        x, y, th = carry
        x = x + dt * u_t[:, 0] * jnp.cos(th)
        y = y + dt * u_t[:, 0] * jnp.sin(th)
        th = th + dt * u_t[:, 1]
        return (x, y, th), jnp.stack([x, y, th], axis=-1)

    x0 = jnp.broadcast_to(task.x0[0].astype(f32), (V,))
    y0 = jnp.broadcast_to(task.x0[1].astype(f32), (V,))
    th0 = jnp.broadcast_to(task.x0[2].astype(f32), (V,))
    _, states = jax.lax.scan(step, (x0, y0, th0), vw)
    first = jnp.broadcast_to(task.x0.astype(f32), (V, 3))[None]
    return jnp.concatenate([first, states], axis=0).transpose(1, 0, 2)
