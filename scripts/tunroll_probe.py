#!/usr/bin/env python3
"""Sweep t_unroll (horizon steps per fori_loop iteration) on real TPU.

Shapes: flagship byte kernel (11x11-world, K=1024 M=1024 T=100) and the
forest-size binned kernel (140x84). Chained on-device timing per
CLAUDE.md (subtract ~30 ms RTT).
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import (pack_bin_nibbles, pack_map_words,
                                        pack_mask_nibbles)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    build_bin_luts, build_task_vec, pallas_rollout_binned_supported,
    terrain_rollout_costs_pallas, terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.types import TerrainTask

K, M, T = 1024, 1024, 100
VMAX, RES = 2.0, 0.5

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu"


def make_task(H, W):
    f32 = np.float32
    return TerrainTask(
        x0=jnp.asarray(np.array([W * RES / 2, H * RES / 2, 0.7], f32)),
        xgoal=jnp.asarray(np.array([W * RES - 2, H * RES - 2], f32)),
        goal_tolerance=f32(0.5), v_post_rollout=f32(0.01),
        lambda_weight=f32(1.0),
        u_std=jnp.asarray(np.array([2.0, 3.0], f32)),
        vrange=jnp.asarray(np.array([0.0, VMAX], f32)),
        wrange=jnp.asarray(np.array([-3.14, 3.14], f32)),
        dt=f32(0.1), dist_weight=f32(1.0), obs_penalty=f32(1e5),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(RES),
        xlim0=f32(0.0), ylim0=f32(0.0), lin_lb=f32(0.0), lin_ratio=f32(0.01),
        ang_lb=f32(0.0), ang_ratio=f32(0.01))


def controls(seed=1):
    rng = np.random.RandomState(seed)
    u = rng.uniform(0, 1.5, (T, 2)).astype(np.float32)
    noise = rng.normal(0, 1, (K, T, 2)).astype(np.float32)
    v = jnp.asarray(np.clip(u[:, 0][:, None] + noise[:, :, 0].T, 0, VMAX))
    w = jnp.asarray(np.clip(u[:, 1][:, None] + noise[:, :, 1].T, -3.14, 3.14))
    return v, w


def chain_time(fn, v_all, n=20):
    @jax.jit
    def chain(v0):
        def body(i, v):
            return v + jnp.min(fn(v)) * 1e-30
        return jax.lax.fori_loop(0, n, body, v0)
    np.asarray(chain(v_all))
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(v_all + np.float32(1e-6 * rep)))
        best = min(best, (time.perf_counter() - t0 - 0.03) / n)
    return 1000.0 * best


def byte_case(H, W):
    rng = np.random.RandomState(0)
    lin = jnp.asarray(rng.randint(0, 101, (M, H, W)).astype(np.int8))
    ang = jnp.asarray(rng.randint(0, 101, (M, H, W)).astype(np.int8))
    obs = jnp.zeros((H, W), jnp.int8)
    packed = pack_map_words(lin, ang, obs, obs, None)
    task = make_task(H, W)
    tv = build_task_vec(task)
    v_all, w_all = controls()
    for tu in (1, 2, 4, 5):
        ms = chain_time(lambda v, tu=tu: terrain_rollout_costs_pallas(
            packed, tv, v, w_all, H=H, W=W, T=T, fast_trig=True,
            t_unroll=tu), v_all)
        print(json.dumps({"kernel": "byte", "shape": [H, W],
                          "t_unroll": tu, "ms": round(ms, 3)}), flush=True)


def binned_case(H, W, B=12):
    rng = np.random.RandomState(0)
    lin_bins = jnp.asarray(rng.randint(0, B, (M, H, W)))
    ang_bins = jnp.asarray(rng.randint(0, B, (M, H, W)))
    obs = jnp.zeros((H, W), jnp.int8)
    qbins = jnp.asarray(np.linspace(0, 100, B).astype(np.int8))
    task = make_task(H, W)
    nib = pack_bin_nibbles(lin_bins, ang_bins)
    maskw = pack_mask_nibbles(obs, obs)
    lut = build_bin_luts(task, qbins, qbins)
    tv = build_task_vec(task)
    v_all, w_all = controls()
    for tu in (1, 2, 4):
        ms = chain_time(lambda v, tu=tu: terrain_rollout_costs_pallas_binned(
            nib, maskw, lut, tv, v, w_all, H=H, W=W, T=T, fast_trig=True,
            t_unroll=tu), v_all)
        print(json.dumps({"kernel": "binned", "shape": [H, W],
                          "t_unroll": tu, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    byte_case(9, 11)          # flagship benchmark world (padded)
    binned_case(140, 84)      # forest-size, banded regime
    binned_case(250, 250)     # max_map_dim, banded regime
