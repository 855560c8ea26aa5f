"""Shared synthetic-problem builders for the kernel-level TPU probes.

scripts/roofline_check.py and scripts/tunroll_probe.py time the rollout
KERNELS in isolation (no solver) on the same synthetic flagship-scale
problem; this module is the single source of that problem so the timing
protocol and the 20-field TerrainTask literal cannot drift apart between
probes.  The chained-loop timer itself lives in
``mppi_numba_tpu.profiling.chained_kernel_time`` (CLAUDE.md timing rule).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import (pack_bin_crumbs, pack_bin_nibbles,
                                        pack_mask_nibbles, pack_map_words)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (build_bin_luts,
                                                      build_task_vec)
from mppi_numba_tpu.types import TerrainTask

K, M, T, B = 1024, 1024, 100, 12
VMAX, RES = 2.0, 0.5


def require_live_tpu(deadline_s=75.0):
    """Fail fast (rc=4, named stderr line) when the tethered worker is in
    its wedge mode, BEFORE this process touches the device — a wedged JAX
    client blocks forever with no recovery.  Call at the top of every
    real-TPU script's main()."""
    if float(os.environ.get("MPPI_BENCH_PROBE_S", deadline_s)) <= 0:
        return
    from mppi_numba_tpu.profiling import device_liveness_probe
    alive, detail = device_liveness_probe(
        float(os.environ.get("MPPI_BENCH_PROBE_S", deadline_s)))
    if not alive:
        print("TPU worker unresponsive ({}); environment outage, not a "
              "code hang".format(detail), file=sys.stderr)
        sys.stderr.flush()
        os._exit(4)


def synth_task(H, W):
    """Flagship-scale synthetic task centered on an H x W map."""
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


def synth_controls(task, seed=1):
    """Pre-clipped noisy control planes ``(v_all, w_all)`` of shape (T, K)."""
    rng = np.random.RandomState(seed)
    u = rng.uniform(0, 1.5, (T, 2)).astype(np.float32)
    noise = rng.normal(0, 1, (K, T, 2)).astype(np.float32)
    v = jnp.asarray(np.clip(u[:, 0][:, None] + noise[:, :, 0].T, 0, VMAX))
    w = jnp.asarray(np.clip(u[:, 1][:, None] + noise[:, :, 1].T, -3.14, 3.14))
    return v, w


def build_binned_problem(H, W, num_bins=B, seed=0):
    """Everything the bin-packed kernel call needs at flagship K/M/T.

    Returns ``(nib, maskw, lut, task_vec, v_all, w_all)``.
    """
    rng = np.random.RandomState(seed)
    lin_bins = jnp.asarray(rng.randint(0, num_bins, (M, H, W)))
    ang_bins = jnp.asarray(rng.randint(0, num_bins, (M, H, W)))
    obs = jnp.zeros((H, W), jnp.int8)
    qbins = jnp.asarray(np.linspace(0, 100, num_bins).astype(np.int8))
    task = synth_task(H, W)
    nib = pack_bin_nibbles(lin_bins, ang_bins)
    maskw = pack_mask_nibbles(obs, obs)
    lut = build_bin_luts(task, qbins, qbins)
    v_all, w_all = synth_controls(task)
    return nib, maskw, lut, build_task_vec(task), v_all, w_all


def build_crumb_problem(H, W, num_bins=4, seed=0):
    """Crumb-packed (cell_bits=2, <=4-bin) problem at flagship K/M/T.

    Returns ``(crumbs, maskw, lut, task_vec, v_all, w_all)``.
    """
    assert num_bins <= 4
    rng = np.random.RandomState(seed)
    lin_bins = jnp.asarray(rng.randint(0, num_bins, (M, H, W)))
    ang_bins = jnp.asarray(rng.randint(0, num_bins, (M, H, W)))
    obs = jnp.zeros((H, W), jnp.int8)
    qbins = jnp.asarray(np.linspace(0, 100, num_bins).astype(np.int8))
    task = synth_task(H, W)
    crumbs = pack_bin_crumbs(lin_bins, ang_bins)
    maskw = pack_mask_nibbles(obs, obs)
    lut = build_bin_luts(task, qbins, qbins)
    v_all, w_all = synth_controls(task)
    return crumbs, maskw, lut, build_task_vec(task), v_all, w_all


def build_byte_problem(H, W, seed=0):
    """Packed-word problem for the byte kernel at flagship K/M/T.

    Returns ``(packed, task_vec, v_all, w_all)``.
    """
    rng = np.random.RandomState(seed)
    lin = jnp.asarray(rng.randint(0, 101, (M, H, W)).astype(np.int8))
    ang = jnp.asarray(rng.randint(0, 101, (M, H, W)).astype(np.int8))
    obs = jnp.zeros((H, W), jnp.int8)
    packed = pack_map_words(lin, ang, obs, obs, None)
    task = synth_task(H, W)
    v_all, w_all = synth_controls(task)
    return packed, build_task_vec(task), v_all, w_all
