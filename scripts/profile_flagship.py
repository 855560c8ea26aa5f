#!/usr/bin/env python3
"""Stage-by-stage latency breakdown of the flagship stochastic solve.

Times each stage of the fused solve program in isolation with the same
chained-on-device methodology as bench.py (the full solve is ONE XLA
program in production; this decomposition is for optimization guidance
only).  Stages:

  sample   — 2x inverse-CDF traction-map sampling (M, H, W) + bit-packing
  noise    — (K, T, 2) normal draw + control clipping
  rollout  — fused Pallas (K, M, T) rollout kernel
  cvar     — top-k / sort CVaR reduction over M
  update   — coupling + softmax weights + weighted noise contraction
  solve    — the whole fused program (cross-check; < sum of parts because
             XLA overlaps stages)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_flagship
from mppi_numba_tpu.ops.cvar import cvar_from_costs
from mppi_numba_tpu.ops.packing import pack_map_words
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    LANES, build_task_vec, terrain_rollout_costs_pallas)
from mppi_numba_tpu.ops.rollout import _clipped_controls_tk, control_coupling
from mppi_numba_tpu.ops.sampling import sample_noise, sample_traction_grids
from mppi_numba_tpu.ops.update import update_useq
from mppi_numba_tpu.solver import get_terrain_solver
from mppi_numba_tpu.profiling import measure_fetch_rtt


def chain_time(fn, n, *args):
    """Run fn n times in one jitted loop (key-folded), fetch once."""
    @jax.jit
    def chain(key):
        def body(i, acc):
            out = fn(jax.random.fold_in(key, i), *args)
            return acc + out
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    rtt = measure_fetch_rtt()
    np.asarray(chain(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    np.asarray(chain(jax.random.PRNGKey(1)))
    return (time.perf_counter() - t0 - rtt) / n


def main():
    from _bench_common import require_live_tpu
    require_live_tpu()
    static, maps, task = build_flagship()
    K, M, T = (static.num_control_rollouts, static.num_grid_samples,
               static.num_steps)
    H, W = static.map_shape
    N = 50

    # Fixed inputs for stage isolation.
    key0 = jax.random.PRNGKey(0)
    lin = sample_traction_grids(key0, maps.lin_pmf, maps.lin_qbins,
                                task.alpha_dyn, M)
    ang = sample_traction_grids(key0, maps.ang_pmf, maps.ang_qbins,
                                task.alpha_dyn, M)
    packed = pack_map_words(lin, ang, maps.obstacle, maps.unknown)
    noise = sample_noise(key0, task.u_std, K, T)
    u0 = jnp.zeros((T, 2), jnp.float32)
    v_all, w_all = _clipped_controls_tk(u0, noise, task.vrange, task.wrange)
    tvec = build_task_vec(task)
    costs_km = terrain_rollout_costs_pallas(
        packed, tvec, v_all, w_all, H=H, W=W, T=T,
        fast_trig=static.fast_trig)
    costs_k = cvar_from_costs(costs_km, static.cvar_numel)

    def stage_sample(key):
        l = sample_traction_grids(key, maps.lin_pmf, maps.lin_qbins,
                                  task.alpha_dyn, M)
        a = sample_traction_grids(key, maps.ang_pmf, maps.ang_qbins,
                                  task.alpha_dyn, M)
        p = pack_map_words(l, a, maps.obstacle, maps.unknown)
        return jnp.float32(p.sum())

    def stage_noise(key):
        n = sample_noise(key, task.u_std, K, T)
        v, w = _clipped_controls_tk(u0, n, task.vrange, task.wrange)
        return v.sum() + w.sum()

    def stage_rollout(key):
        v = v_all + 1e-9 * jax.random.uniform(key, ())   # defeat CSE
        c = terrain_rollout_costs_pallas(packed, tvec, v, w_all, H=H, W=W,
                                         T=T, fast_trig=static.fast_trig)
        return c.sum()

    def stage_cvar(key):
        c = costs_km + jax.random.uniform(key, ())
        return cvar_from_costs(c, static.cvar_numel).sum()

    def stage_update(key):
        n = noise * (1.0 + 1e-9 * jax.random.uniform(key, ()))
        c = (costs_k
             + control_coupling(u0, n, task.u_std, task.lambda_weight))
        u, wts = update_useq(c, n, u0, task.lambda_weight, task.vrange,
                             task.wrange)
        return u.sum() + wts.sum()

    solve_fn = get_terrain_solver(static)

    def stage_solve(key):
        u, _ = solve_fn(key, maps, task, jnp.zeros((T, 2), jnp.float32))
        return u.sum()

    stages = [("sample", stage_sample), ("noise", stage_noise),
              ("rollout", stage_rollout), ("cvar", stage_cvar),
              ("update", stage_update), ("solve", stage_solve)]
    print(f"flagship: K={K} M={M} T={T} map={H}x{W} "
          f"cvar_numel={static.cvar_numel} backend={jax.default_backend()}")
    for name, fn in stages:
        ms = 1000.0 * chain_time(fn, N, )
        print(f"  {name:8s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
