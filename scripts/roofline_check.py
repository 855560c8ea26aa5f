#!/usr/bin/env python3
"""Gather-roofline accounting for the bin-packed rollout kernel (real TPU).

VERDICT round-2 weak item 5: README claims the fused rollout is
gather-bound, but nothing computed "gathers/solve x measured gather cost"
vs achieved time, so the headroom (if any) was unknown.  MFU is the wrong
metric for a gather/VPU-bound kernel; the right roofline is the chunk-walk
cost itself:

1. Measure the production kernel at a ladder of map sizes whose UNROLLED
   chunk-walk lengths differ (1, 4, 8, 15 chunks at fixed K/M/T): the
   per-(chunk . step . program) slope IS the measured gather+select cost,
   and the intercept is the per-step non-walk work (dynamics, LUT decodes,
   mask walk, cost math).
2. Predict banded-walk scenarios from that slope: the reachability cone
   covers avg_chunks(t) = f(max_cells_per_step, T, H) chunks per step;
   predicted time = intercept + slope * avg_chunks.  Since round 3 the
   kernel walks the EXACT per-step occupancy band (min/max reduction of
   the visited cells), which is a subset of the cone — so the prediction
   is an upper bound on the walk work, and achieved/predicted < 1 means
   the exact band beats the cone model by more than the dynamic-loop
   overhead costs.

Run on the real TPU, no other TPU process:
    python scripts/roofline_check.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import pack_bin_nibbles, pack_mask_nibbles
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    LANES, NIB_CELLS_PER_CHUNK, build_bin_luts, build_task_vec,
    pallas_rollout_binned_supported, terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.types import TerrainTask

K, M, T, B = 1024, 1024, 100, 12
VMAX, RES = 2.0, 0.5


def build(H, W, seed=0):
    rng = np.random.RandomState(seed)
    lin_bins = jnp.asarray(rng.randint(0, B, (M, H, W)))
    ang_bins = jnp.asarray(rng.randint(0, B, (M, H, W)))
    obs = jnp.zeros((H, W), jnp.int8)
    qbins = jnp.asarray(np.linspace(0, 100, B).astype(np.int8))
    f32 = np.float32
    task = TerrainTask(
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
    nib = pack_bin_nibbles(lin_bins, ang_bins)
    maskw = pack_mask_nibbles(obs, obs)
    lut = build_bin_luts(task, qbins, qbins)
    rng2 = np.random.RandomState(1)
    u = jnp.asarray(rng2.uniform(0, 1.5, (T, 2)).astype(f32))
    noise = rng2.normal(0, 1, (K, T, 2)).astype(f32)
    v_all = jnp.asarray(np.clip(u[:, 0][:, None] + noise[:, :, 0].T, 0, VMAX))
    w_all = jnp.asarray(np.clip(u[:, 1][:, None] + noise[:, :, 1].T,
                                -3.14, 3.14))
    return nib, maskw, lut, task, v_all, w_all


def measure(H, W, banded, n=20):
    import time

    nib, maskw, lut, task, v_all, w_all = build(H, W)
    m_tile = pallas_rollout_binned_supported(M, H * W, T, B)
    assert m_tile, (H, W)
    tv = build_task_vec(task)

    @jax.jit
    def chain(v0):
        # Kernel-only chained timing (CLAUDE.md rule: never trust naive
        # block_until_ready through the tunnel): each iteration's controls
        # depend infinitesimally on the previous costs, forcing serial
        # execution; one fetch at the end.
        def body(i, v):
            costs = terrain_rollout_costs_pallas_binned(
                nib, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, banded=banded)
            return v + jnp.min(costs) * 1e-30
        return jax.lax.fori_loop(0, n, body, v0)

    np.asarray(chain(v_all))     # compile + warm
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(v_all + np.float32(1e-6 * rep)))
        best = min(best, (time.perf_counter() - t0 - 0.03) / n)
    n_chunks = -(-(H * W) // NIB_CELLS_PER_CHUNK)
    m_pad = -(-max(M, 8) // 8) * 8
    m_tile = min(m_pad, m_tile)
    programs = (-(-m_pad // m_tile) * (K // LANES))
    return 1000.0 * best, n_chunks, programs, m_tile


def avg_band_chunks(H, W, n_chunks):
    """Average chunks/step of the round-2 reachability cone — an upper
    bound on the exact occupancy band the kernel walks since round 3."""
    mcps = VMAX * 1.0 * 0.1 / RES      # max decoded traction = 1.0
    cpc = NIB_CELLS_PER_CHUNK
    tot = 0.0
    for t in range(T):
        reach = t * mcps + 2.0
        lo = max(H / 2 - reach, 0.0)
        hi = min(H / 2 + reach, H - 1.0)
        c_lo = int(lo * W) // cpc
        c_hi = min(int((hi + 1) * W) // cpc + 1, n_chunks)
        tot += c_hi - c_lo
    return tot / T


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.default_backend() == "tpu", jax.default_backend()

    # 1. Unrolled-walk ladder -> per-(chunk.step.program) slope.
    ladder = [(9, 11), (40, 40), (64, 64), (85, 85)]
    pts = []
    for H, W in ladder:
        ms, c, progs, m_tile = measure(H, W, banded=True)  # <=16 -> unrolled
        pts.append((c, progs, ms))
        print(json.dumps({"shape": [H, W], "chunks": c, "programs": progs,
                          "m_tile": m_tile, "ms": round(ms, 3)}), flush=True)
    # Normalize: ms = a * programs * T + slope * chunks * programs * T
    # (all ladder points share programs when m_tile saturates; fit on
    # per-program-step cost).
    xs = np.array([c for c, _, _ in pts], float)
    ys = np.array([ms / (progs * T) * 1e6 for c, progs, ms in pts])  # ns
    slope, intercept = np.polyfit(xs, ys, 1)
    print(json.dumps({"fit_ns_per_chunk_step_program": round(slope, 1),
                      "fit_intercept_ns_per_step_program":
                          round(intercept, 1)}), flush=True)

    # 2. Banded scenarios: achieved vs slope-predicted.  The ladder fit is
    # at m_tile=256; per-program walk/elementwise work scales ~linearly
    # with the sublane tile, so scale the per-program-step cost by
    # m_tile/256 when a VMEM-constrained shape runs a smaller tile
    # (round-3 review fix: the unscaled prediction over-counted the
    # m_tile=64 250x250 config 4x and made overhead_x read as 0.48).
    # The scaled bound is optimistic (fixed per-program overhead does NOT
    # shrink with m_tile), so overhead_x is an upper bound on real slack.
    for H, W in ((140, 84), (250, 250)):
        ms, c, progs, m_tile = measure(H, W, banded=True)
        avg_c = avg_band_chunks(H, W, c)
        pred = ((intercept + slope * avg_c) * (m_tile / 256.0)
                * progs * T / 1e6)
        print(json.dumps({
            "shape": [H, W], "chunks_total": c,
            "avg_band_chunks": round(avg_c, 1), "programs": progs,
            "m_tile": m_tile, "achieved_ms": round(ms, 3),
            "roofline_ms": round(pred, 3),
            "banded_overhead_x": round(ms / pred, 2)}), flush=True)


if __name__ == "__main__":
    main()
