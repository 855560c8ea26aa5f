#!/usr/bin/env python3
"""Multi-device scaling-efficiency harness (SURVEY §7 PR5, BASELINE.json).

Measures solves/s of the (scenario, k)-sharded solver at 1..N devices.
On a multi-chip TPU slice this exercises real ICI collectives; on a single
host it can be run against virtual CPU devices for functional scaling:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --scenarios 8 --k 2048

Efficiency(N) = throughput(N) / (N * throughput(1)).
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.parallel.mesh import make_mesh
from mppi_numba_tpu.parallel.sharded import get_sharded_terrain_solver
from mppi_numba_tpu.types import MapInputs, TerrainTask


def build_case(S, K, M, T, H, W, B=22):
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 100, size=(S, B, H, W)).astype(float)
    pmf = (raw / raw.sum(1, keepdims=True) * 100).astype(np.int8)
    pmf[:, -1] = 100 - pmf[:, :-1].sum(1)
    qbins = np.linspace(0, 100, B).astype(np.int8)
    maps = MapInputs(
        jnp.asarray(pmf), jnp.asarray(pmf),
        jnp.broadcast_to(jnp.asarray(qbins), (S, B)),
        jnp.broadcast_to(jnp.asarray(qbins), (S, B)),
        jnp.zeros((S, H, W), jnp.int8), jnp.zeros((S, H, W), jnp.int8),
        jnp.zeros((S, H, W), jnp.int8))
    f32 = np.float32

    def batch(x):
        x = np.asarray(x, f32)
        return jnp.broadcast_to(jnp.asarray(x), (S,) + x.shape)

    task = TerrainTask(
        x0=batch([2.0, 2.0, 0.3]), xgoal=batch([6.0, 6.0]),
        goal_tolerance=batch(0.4), v_post_rollout=batch(0.3),
        lambda_weight=batch(1.0), u_std=batch([1.0, 1.5]),
        vrange=batch([0.0, 2.0]), wrange=batch([-3.0, 3.0]),
        dt=batch(0.1), dist_weight=batch(1.5), obs_penalty=batch(1e4),
        unknown_penalty=batch(1e2), alpha_dyn=batch(1.0), res=batch(1.0),
        xlim0=batch(0.0), ylim0=batch(0.0), lin_lb=batch(0.0),
        lin_ratio=batch(0.01), ang_lb=batch(0.0), ang_ratio=batch(0.01))
    static = SolverStatic(mode="tdm", num_steps=T, num_control_rollouts=K,
                          num_grid_samples=M, map_shape=(H, W),
                          num_obstacles=0, cvar_numel=max(1, M // 3),
                          num_opt=1, num_vis_state_rollouts=1)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))
    u0 = jnp.zeros((S, T, 2), jnp.float32)
    return static, maps, task, u0, keys


def measure(n_devices, args):
    devices = jax.devices()[:n_devices]
    n_s = 1
    for cand in (4, 2, 1):
        if n_devices % cand == 0 and args.scenarios % cand == 0 and cand <= n_devices:
            n_s = cand
            break
    mesh = make_mesh(n_s, n_devices // n_s, devices=devices)
    static, maps, task, u0, keys = build_case(
        args.scenarios, args.k, args.m, args.t, args.map_dim, args.map_dim)
    solver = get_sharded_terrain_solver(static, mesh)

    u, costs = solver(keys, maps, task, u0)
    np.asarray(u)  # compile
    t0 = time.perf_counter()
    for i in range(args.iters):
        u, costs = solver(jax.vmap(jax.random.fold_in, (0, None))(keys, i),
                          maps, task, u0)
    np.asarray(u)
    dt = (time.perf_counter() - t0) / args.iters
    solves_per_s = args.scenarios / dt
    return solves_per_s, mesh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenarios", type=int, default=8)
    p.add_argument("--tpu", action="store_true",
                   help="run on the real accelerator devices.  DEFAULT is "
                        "the CPU backend with 8 virtual devices: the "
                        "environment force-sets JAX_PLATFORMS, so the "
                        "env-var recipe silently lands on the tethered TPU "
                        "— which must never happen while another TPU "
                        "process runs (CLAUDE.md); jax.config is the "
                        "authoritative override.")
    p.add_argument("--k", type=int, default=2048)
    p.add_argument("--m", type=int, default=64)
    p.add_argument("--t", type=int, default=50)
    p.add_argument("--map-dim", type=int, default=15)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    if not args.tpu:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")

    n_avail = len(jax.devices())
    base = None
    for n in [x for x in (1, 2, 4, 8, 16, 32) if x <= n_avail]:
        sps, mesh = measure(n, args)
        if base is None:
            base = sps
        eff = sps / (n * base)
        print("devices={:3d} mesh={} solves/s={:9.2f} efficiency={:5.1%}".format(
            n, dict(mesh.shape), sps, eff))


if __name__ == "__main__":
    main()
