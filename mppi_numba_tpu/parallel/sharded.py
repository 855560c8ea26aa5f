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

Determinism/parity AND shard-local work: draws are counter-addressable
(ops/sampling.py), so each k-shard generates only ITS noise rows
(``sample_noise_slice``) and only ITS 1/n_k slice of the M traction-map
samples (``m_window``), then all-gathers the int8 grids over ICI — per-shard
sampling FLOPs scale as 1/n_k while remaining BIT-IDENTICAL to the
single-device full draw.  The gathered maps are identical on every shard
(each shard rolls its K-slice over all M maps), so the sharded solve
evaluates exactly the same rollouts as the single-device solve
(differences are limited to float reduction order in psum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..config import SolverStatic
from ..ops.cvar import (cvar_from_costs, cvar_from_costs_distributed,
                        cvar_from_costs_dynamic,
                        cvar_from_costs_dynamic_distributed)
from ..ops.rollout import control_coupling
from ..ops.sampling import (decode_bins, sample_noise_slice,
                            sample_traction_bins)
from ..ops.update import update_useq
from ..solver import (DYNAMIC_CVAR, _crop_maps, _roi_start,
                      _shift_task_limits, make_rollout_backend,
                      solver_map_shape)
from .mesh import MAP_AXIS, ROLLOUT_AXIS, SCENARIO_AXIS


def make_sharded_terrain_solver(static: SolverStatic, mesh,
                                scenario_axis=SCENARIO_AXIS,
                                rollout_axis=ROLLOUT_AXIS,
                                map_axis=MAP_AXIS):
    """Build a jitted multi-scenario, rollout-(and map-)sharded solve.

    Returned callable:
      ``(keys (S, 2) uint32, maps_batch, task_batch, u0 (S, T, 2))
        -> (u_new (S, T, 2), costs (S, K))``
    where ``maps_batch`` / ``task_batch`` are ``MapInputs`` / ``TerrainTask``
    pytrees with a leading scenario axis on every leaf.

    If the mesh carries a ``map_axis`` (see ``mesh.make_mesh`` with
    ``num_map_shards``), the M map samples are sharded over it: each chip
    rolls ``(K/n_k, M/n_m)`` and the CVaR reduction runs as a two-phase
    distributed top-k over ICI (``ops/cvar.py``) — per-chip rollout work,
    sampled-map memory, AND CVaR sort work all shrink with chip count
    (SURVEY §7 "CVaR across shards").
    """
    K = static.num_control_rollouts
    T = static.num_steps
    M = static.num_grid_samples
    n_k = mesh.shape[rollout_axis]
    n_m = dict(mesh.shape).get(map_axis, 1)
    assert K % n_k == 0, f"K={K} must divide over {n_k} rollout shards"
    if M % n_m != 0:
        # Indivisible M (notably the det modes' M=1): replicate over the
        # map axis instead of sharding it — correct, just duplicated work.
        n_m = 1
    k_local = K // n_k
    m_local = M // n_m
    rH, rW = solver_map_shape(static)
    # The same backend selection as the single-device solver: per-shard
    # rollouts run on the fused Pallas kernels on TPU (the payload/rollout
    # pair handles shard-local K slices).
    _, pack_payload, rollout_local = make_rollout_backend(static)

    def sample_bins_local(kmap, maps, task, my_k, my_m, window):
        """This shard's (m_local, H, W) PMF bin-index slices, generated with
        counter-addressable draws so the UNION over m-shards equals the
        single-device M-sample batch bit-identically; the n_k rollout
        shards of one m-index split the generation work and all-gather."""
        base = my_m * m_local

        # Bin indices travel over ICI as int8 to quarter the all-gather
        # payload; int8 only holds indices <= 127 (the Pallas kernels cap at
        # 16 bins, but the XLA backend accepts arbitrary bin counts).
        gather_dtype = (jnp.int8 if 0 < static.num_pmf_bins <= 127
                        else jnp.int32)     # 0 = bin count unknown

        def one(pmf):
            if n_k > 1 and m_local % n_k == 0:
                rows = m_local // n_k
                part = sample_traction_bins(
                    kmap, pmf, task.alpha_dyn, rows, window=window,
                    m_window=(M, base + my_k * rows))
                return jax.lax.all_gather(part.astype(gather_dtype),
                                          rollout_axis, axis=0, tiled=True)
            if n_m > 1 or window is not None:
                return sample_traction_bins(kmap, pmf, task.alpha_dyn,
                                            m_local, window=window,
                                            m_window=(M, base))
            return sample_traction_bins(kmap, pmf, task.alpha_dyn, m_local)

        return one(maps.lin_pmf), one(maps.ang_pmf)

    def solve_one(key, maps, task, u0):
        """One scenario on one (k, m)-shard; collectives bind the axes."""
        my_k = jax.lax.axis_index(rollout_axis)
        my_m = jax.lax.axis_index(map_axis) if n_m > 1 else 0
        kmap, knoise = jax.random.split(key)
        if static.roi_shape:
            oy, ox = _roi_start(task, static.map_shape, static.roi_shape)
            maps = _crop_maps(maps, oy, ox, rH, rW)
            task = _shift_task_limits(task, oy, ox)
            window = (static.map_shape, oy, ox)
        else:
            window = None
        lin_bins, ang_bins = sample_bins_local(kmap, maps, task, my_k, my_m,
                                               window)
        lin_grids = decode_bins(maps.lin_qbins, lin_bins)
        ang_grids = decode_bins(maps.ang_qbins, ang_bins)
        packed = pack_payload(lin_bins, ang_bins, lin_grids, ang_grids,
                              maps, task)

        u = u0
        costs = None
        for i in range(static.num_opt):
            # Shard-local noise rows, bit-identical to the full draw.
            noise = sample_noise_slice(jax.random.fold_in(knoise, i),
                                       task.u_std, K, T,
                                       my_k * k_local, k_local)
            costs_km = rollout_local(packed, task, u, noise)
            if static.cvar_numel == DYNAMIC_CVAR:
                if n_m > 1:
                    cvar = cvar_from_costs_dynamic_distributed(
                        costs_km, task.cvar_alpha, map_axis)
                else:
                    cvar = cvar_from_costs_dynamic(costs_km, task.cvar_alpha)
            elif n_m > 1:
                cvar = cvar_from_costs_distributed(costs_km,
                                                   static.cvar_numel, M,
                                                   map_axis)
            else:
                cvar = cvar_from_costs(costs_km, static.cvar_numel)
            costs = cvar + control_coupling(u, noise, task.u_std,
                                            task.lambda_weight)

            # Distributed softmax update (reference: mppi.py:1134-1191):
            # same math as the single-device update, reductions bound to the
            # rollout mesh axis (m-shards hold identical reduced costs and
            # compute identical replicated updates).
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
        out_specs=(P(scenario_axis),                       # u (replicated over k, m)
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
