"""Multi-chip MPPI: scenario-batched, rollout-sharded solves via shard_map.

One solve spans devices along the ``k`` (rollout) mesh axis; independent
planning scenarios batch along the ``scenario`` axis (BASELINE.json
north star; SURVEY §5.8).  Communication per optimization iteration is three
scalar-ish collectives over ICI — exactly the reductions the reference does
in block shared memory (reference: mppi_numba/mppi.py:1134-1171):

  beta  = pmin_k(local min cost)                       # softmax stabilizer
  eta   = psum_k(local sum of exp weights)             # normalizer
  du    = psum_k(local weighted noise sum, (T, 2))     # control update

plus nothing else: the (K_local, M) rollout and the CVaR-over-M reduction
are shard-local because M is kept on-chip.

Determinism/parity: every k-shard draws the FULL (K, T, 2) noise tensor from
the same key and uses only its slice, so the sharded solve evaluates exactly
the same rollouts as the single-device solve (differences are limited to
float reduction order).  Map sampling uses the same per-scenario key on all
shards, so all shards roll over identical sampled maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..config import SolverStatic
from ..models import get_step_fn
from ..ops.cvar import cvar_from_costs, cvar_from_costs_dynamic
from ..ops.packing import pack_map_words
from ..ops.rollout import control_coupling, terrain_rollout_costs
from ..ops.sampling import sample_noise, sample_traction_grids
from ..ops.update import update_useq
from .mesh import ROLLOUT_AXIS, SCENARIO_AXIS


def make_sharded_terrain_solver(static: SolverStatic, mesh,
                                scenario_axis=SCENARIO_AXIS,
                                rollout_axis=ROLLOUT_AXIS):
    """Build a jitted multi-scenario, rollout-sharded solve.

    Returned callable:
      ``(keys (S, 2) uint32, maps_batch, task_batch, u0 (S, T, 2))
        -> (u_new (S, T, 2), costs (S, K))``
    where ``maps_batch`` / ``task_batch`` are ``MapInputs`` / ``TerrainTask``
    pytrees with a leading scenario axis on every leaf.
    """
    K = static.num_control_rollouts
    T = static.num_steps
    M = static.num_grid_samples
    speed_map = static.mode == "speed_map"
    step_fn = get_step_fn(static.model)
    n_k = mesh.shape[rollout_axis]
    assert K % n_k == 0, f"K={K} must divide over {n_k} rollout shards"
    k_local = K // n_k

    def solve_one(key, maps, task, u0):
        """One scenario on one k-shard; collectives bind ``rollout_axis``."""
        my_k = jax.lax.axis_index(rollout_axis)
        kmap, knoise = jax.random.split(key)
        lin_grids = sample_traction_grids(kmap, maps.lin_pmf, maps.lin_qbins,
                                          task.alpha_dyn, M)
        ang_grids = sample_traction_grids(kmap, maps.ang_pmf, maps.ang_qbins,
                                          task.alpha_dyn, M)
        packed = pack_map_words(lin_grids, ang_grids, maps.obstacle,
                                maps.unknown,
                                maps.risk if speed_map else None)

        u = u0
        costs = None
        for i in range(static.num_opt):
            # Full draw, local slice: bit-identical rollouts vs single-chip.
            noise_full = sample_noise(jax.random.fold_in(knoise, i),
                                      task.u_std, K, T)
            noise = jax.lax.dynamic_slice_in_dim(noise_full, my_k * k_local,
                                                 k_local, axis=0)
            costs_km = terrain_rollout_costs(packed, task, u, noise,
                                             speed_map=speed_map,
                                             step_fn=step_fn)
            if static.cvar_numel == -1:          # DYNAMIC_CVAR sentinel
                cvar = cvar_from_costs_dynamic(costs_km, task.cvar_alpha)
            else:
                cvar = cvar_from_costs(costs_km, static.cvar_numel)
            costs = cvar + control_coupling(u, noise, task.u_std,
                                            task.lambda_weight)

            # Distributed softmax update (reference: mppi.py:1134-1191):
            # same math as the single-device update, reductions bound to the
            # rollout mesh axis.
            u, _ = update_useq(costs, noise, u, task.lambda_weight,
                               task.vrange, task.wrange,
                               axis_name=rollout_axis)
        return u, costs

    def shard_body(keys, maps, task, u0):
        return jax.vmap(solve_one)(keys, maps, task, u0)

    smap = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(scenario_axis),            # keys (S, 2)
                  P(scenario_axis),            # maps leaves (S, ...)
                  P(scenario_axis),            # task leaves (S, ...)
                  P(scenario_axis)),           # u0 (S, T, 2)
        out_specs=(P(scenario_axis),                       # u (replicated over k)
                   P(scenario_axis, rollout_axis)),        # costs (S, K)
        check_vma=False)

    return jax.jit(smap)


def make_sharded_trial_batch(static: SolverStatic, max_steps: int, mesh,
                             scenario_axis=SCENARIO_AXIS,
                             rollout_axis=ROLLOUT_AXIS):
    """Scenario-sharded device-resident episodes: the benchmark engine at
    pod scale.

    Episodes are fully independent (SURVEY §2.4: scenario batching is pure
    data parallelism with ZERO cross-chip traffic), so the batch axis is
    sharded over ALL mesh devices — both named axes — and each device runs
    its slice of closed-loop trials with the local fused solver.  The batch
    size must divide the device count.

    Returned callable has the ``make_device_trial_batch`` signature: every
    argument carries a leading batch axis.
    """
    from ..device_sim import make_episode_fn

    body = jax.vmap(make_episode_fn(static, max_steps))
    both = (scenario_axis, rollout_axis)
    smap = shard_map(body, mesh=mesh,
                     in_specs=(P(both),) * 6,
                     out_specs=P(both),
                     check_vma=False)
    return jax.jit(smap)


@functools.lru_cache(maxsize=None)
def _cached_sharded_solver(static, mesh_key, mesh):
    return make_sharded_terrain_solver(static, mesh)


def get_sharded_terrain_solver(static: SolverStatic, mesh):
    """Cache per (static signature, mesh devices/axes)."""
    mesh_key = (tuple(mesh.shape.items()),
                tuple(d.id for d in mesh.devices.flat))
    return _cached_sharded_solver(static, mesh_key, mesh)
