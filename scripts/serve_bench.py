#!/usr/bin/env python3
"""Serving-scale benchmark: batched device-resident episodes on the
REALISTIC forest-size map (real TPU).

A planning service runs many closed-loop episodes concurrently (fleets,
Monte-Carlo evaluation, parallel what-ifs).  This measures that mode at
flagship fidelity — B independent episodes of K=1024 x M=1024 x T=100
stochastic solves on the 140x84 map (the planner's honest choice: since
the round-5 crossover fix its ROI threshold crops this shape again) —
entirely on device (one executable, zero host crossings inside episodes).

For contrast, the HOST-DRIVEN loop through this environment's tunneled
link costs ~0.7 s/step (examples/confidence_planning.py on TPU: 258 s for
359 steps — dominated by the ~30 ms host RTT, not compute).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

import bigmap_bench as bb
from mppi_numba_tpu.device_sim import make_device_trial_batch

B = 16          # concurrent episodes
MAX_STEPS = 150  # the reference benchmark's episode cap
H, W = 140, 84


def main():
    from _bench_common import require_live_tpu
    require_live_tpu()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Full map, no ROI crop: the planner's backend-aware threshold
    # (mppi.py::_roi_shape) keeps the full 140x84 solve on TPU — the
    # exact-occupancy banded walk makes it faster than the cropped one
    # (8.6 vs 11.1 ms, BENCH_BIGMAP.jsonl round 4).
    static, maps, task = bb.build(H, W, None, "auto")
    # Mean-over-samples objective (alpha=1) for the serving demo episodes.
    static = dataclasses.replace(static, cvar_numel=bb.M)
    rng = np.random.RandomState(0)

    def batch(x):
        x = np.asarray(x)
        return jnp.asarray(np.broadcast_to(x, (B,) + x.shape).copy())

    maps_b = jax.tree.map(batch, maps)
    task_b = jax.tree.map(batch, task)
    # Per-episode start/goal spread across the map.
    x0 = np.stack([rng.uniform(16, W * bb.RES - 16, B),
                   rng.uniform(16, H * bb.RES - 16, B),
                   rng.uniform(-3, 3, B)], axis=1).astype(np.float32)
    # Goals 8-13 m out (reachable inside the 10 s horizon at these speeds).
    ang = rng.uniform(0, 2 * np.pi, B)
    dist = rng.uniform(8, 13, B)
    goal = np.stack([
        np.clip(x0[:, 0] + dist * np.cos(ang), 2, W * bb.RES - 2),
        np.clip(x0[:, 1] + dist * np.sin(ang), 2, H * bb.RES - 2),
    ], axis=1).astype(np.float32)
    task_b = task_b._replace(x0=jnp.asarray(x0), xgoal=jnp.asarray(goal))

    gt = jnp.asarray(rng.uniform(0.5, 1.0, (B, H, W)).astype(np.float32))
    meta = jnp.asarray(np.tile(np.array([0.0, 0.0, 1.0 / bb.RES], np.float32),
                               (B, 1)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))

    trial_batch = make_device_trial_batch(static, MAX_STEPS)
    res = trial_batch(keys, maps_b, task_b, gt, gt, meta)
    jax.block_until_ready(res)           # compile + warm

    t0 = time.perf_counter()
    res = trial_batch(jax.vmap(jax.random.PRNGKey)(jnp.arange(B, 2 * B)),
                      maps_b, task_b, gt, gt, meta)
    jax.block_until_ready(res)
    wall = time.perf_counter() - t0 - 0.03

    solves = B * MAX_STEPS
    print(json.dumps({
        "scenario": "forest_140x84_batched_episodes",
        "episodes": B, "steps_per_episode": MAX_STEPS,
        "wall_s": round(wall, 2),
        "flagship_solves_per_s": round(solves / wall, 1),
        "episode_throughput_per_s": round(B / wall, 3),
        "success_rate": float(np.asarray(res.success).mean()),
        "host_driven_equiv_s": round(solves * 0.72, 0),
    }, ), flush=True)


if __name__ == "__main__":
    main()
