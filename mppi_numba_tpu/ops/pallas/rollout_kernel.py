"""Fused Pallas TPU rollout kernel — the speed-of-light hot loop.

Replaces the reference's K-block x M-thread CUDA rollout kernel
(reference: mppi_numba/mppi.py:613-756) with a single Mosaic kernel whose
grid tiles (map-samples, rollouts) as (M_TILE sublanes, 128 lanes):

* Rollout state (x, y, theta, cost, dist2, reached) lives in VMEM for the
  whole horizon — zero HBM traffic inside the time loop.
* The per-step traction lookup is the crux: CUDA threads do a cached random
  load; the TPU equivalent is ``tpu.dynamic_gather`` along the 128-lane
  axis.  The packed map (``ops/packing.py``) is laid out as lane-chunks
  ``(C, M, 128)`` int32, one chunk per 128 cells, so each step does C
  lane-gathers + selects — measured ~1.4 us per (1024, 128) gather on
  v5e, ~100x faster than XLA's generic gather lowering for this shape.
* Controls are pre-clipped outside (v/w of shape (T, K)) and read one row
  per step; each program handles one 128-wide k-tile so the control row
  broadcasts across the M sublanes — the same "all threads in a block share
  the control sequence" structure as the reference, transposed.

The kernel computes stage costs, obstacle/unknown penalties, masked early
goal termination, and the terminal cost (identical semantics to
``ops/rollout.py``; the XLA implementation doubles as its oracle in tests).
CVaR reduction, coupling, and the softmax update stay in XLA where they are
already fused reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128          # k-tile width (hardware lane count)
# Sublane tile: measured on v5e at K=1024/M=1024/T=100, 256 beats 1024 by
# ~13% (2.66 vs 3.06 ms rollout) — smaller state planes pipeline better;
# gather cost is per-element either way.
MAX_M_TILE = 256
VMEM_BUDGET = 12 * 1024 * 1024  # conservative slice of ~16 MB/core

# Default horizon-loop unrolling per kernel (steps per fori_loop iteration;
# semantics-identical for any value — see _run_time_loop).  Winners of the
# round-4 on-device sweep (scripts/tunroll_probe.py, BENCH_TUNROLL.jsonl,
# v5e): byte 9x11 flagship 3.05 -> 2.33 ms at 4 (2.59 at 2, 2.35 at 5);
# nibble 140x84 8.33 -> 7.42 ms and 250x250 14.75 -> 14.13 ms at 4; crumb
# 250x250 10.0 -> 9.2 ms at 2 (4 unswept, semantics-identical either way).
DEFAULT_T_UNROLL_BYTE = 4
# 4-vs-5 re-swept with the group-anchored band (3 reps each, round 5,
# BENCH_WALK.jsonl): forest 6.84/6.78, 250x250 12.28/12.47 — a split
# decision inside run noise; 4 kept.
DEFAULT_T_UNROLL_BINNED = 4


def _ceil_to(x, m):
    return -(-x // m) * m


def _run_time_loop(T, step, init, t_unroll):
    """Run the horizon loop, processing ``t_unroll`` steps per fori_loop
    iteration (static remainder tail).  Semantics-identical to a plain
    ``fori_loop(0, T, step, init)`` for any ``t_unroll``; amortizes Mosaic
    loop overhead and exposes cross-step ILP to the scheduler."""
    if t_unroll <= 1:
        return jax.lax.fori_loop(0, T, step, init)

    def body(i, carry):
        t0 = i * t_unroll
        for j in range(t_unroll):
            carry = step(t0 + j, carry)
        return carry

    n_main = T // t_unroll
    carry = jax.lax.fori_loop(0, n_main, body, init)
    for t in range(n_main * t_unroll, T):
        carry = step(t, carry)
    return carry


def pallas_rollout_supported(num_grid_samples, map_hw, num_steps=128,
                             vmem_budget=VMEM_BUDGET):
    """Whether the fused kernel fits: chunked map + state tiles in VMEM.

    Mosaic double-buffers the grid-varying input blocks (map chunks and the
    two (T, LANES) control buffers), so those count twice; state planes
    (x, y, heading x2, cost, dist2, reached) and the output tile live once.
    """
    hw_pad = _ceil_to(map_hw, LANES)
    n_chunks = hw_pad // LANES
    m_pad = _ceil_to(max(num_grid_samples, 8), 8)
    m_tile = min(m_pad, MAX_M_TILE)
    words = (2 * n_chunks * m_tile * LANES      # map chunks, double-buffered
             + 2 * 2 * num_steps * LANES        # v + w controls, double-buffered
             + 8 * m_tile * LANES)              # state planes + output tile
    return words * 4 <= vmem_budget


def _rollout_kernel(task_ref, chunks_ref, v_ref, w_ref, cost_ref,
                    *, T, H, W, n_chunks, speed_map, fast_trig, step_fn,
                    t_unroll=1):
    f32 = jnp.float32
    # Task scalars live in row 0 of an (8, 128) VMEM tile — 2D so the kernel
    # batches cleanly under vmap (device-resident episode batches).
    x0x, x0y, x0th = task_ref[0, 0], task_ref[0, 1], task_ref[0, 2]
    gx, gy = task_ref[0, 3], task_ref[0, 4]
    tol = task_ref[0, 5]
    v_post = task_ref[0, 6]
    dt = task_ref[0, 7]
    dist_w = task_ref[0, 8]
    obs_pen = task_ref[0, 9]
    unk_pen = task_ref[0, 10]
    inv_res = task_ref[0, 11]
    xlim0, ylim0 = task_ref[0, 12], task_ref[0, 13]
    lin_lb, lin_ratio = task_ref[0, 14], task_ref[0, 15]
    ang_lb, ang_ratio = task_ref[0, 16], task_ref[0, 17]
    tol2 = tol * tol

    m_tile = cost_ref.shape[0]
    shape = (m_tile, LANES)

    def step(t, carry):
        # ``hd`` is the heading: theta itself in exact mode, (cos, sin) in
        # fast-trig mode (the heading only ever enters through cos/sin, so
        # the rotation form needs no inverse).
        x, y, hd, cost, dist2, reachedf = carry
        v_t = v_ref[t, :].reshape(1, LANES)
        w_t = w_ref[t, :].reshape(1, LANES)

        xi = jnp.clip(jnp.floor((x - xlim0) * inv_res).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.floor((y - ylim0) * inv_res).astype(jnp.int32), 0, H - 1)
        cell = yi * W + xi

        if n_chunks == 1:
            # Map fits in one 128-lane chunk (e.g. the benchmark's 11x11
            # padded world): one gather, no select masking.
            words = jnp.take_along_axis(chunks_ref[0], cell, axis=1,
                                        mode="promise_in_bounds")
        else:
            words = jnp.zeros(shape, jnp.int32)
            for c in range(n_chunks):
                local = cell - c * LANES
                g = jnp.take_along_axis(chunks_ref[c],
                                        jnp.clip(local, 0, LANES - 1), axis=1,
                                        mode="promise_in_bounds")
                words = jnp.where((local >= 0) & (local < LANES), g, words)

        lin_tr = lin_lb + lin_ratio * (words & 0xFF).astype(f32)
        ang_tr = ang_lb + ang_ratio * ((words >> 8) & 0xFF).astype(f32)
        obs = ((words >> 16) & 1).astype(f32)
        unk = ((words >> 17) & 1).astype(f32)

        if fast_trig:
            # Unicycle-only fast path: per-step heading increments are small
            # (|dth| <= dt*wmax), so a degree-4/5 Maclaurin rotation replaces
            # two full-range transcendentals — the TPU analog of the
            # reference's CUDA fastmath sin/cos (reference:
            # mppi_numba/mppi.py:614 fastmath=True).  Accuracy: cost error
            # vs exact trig is ~1e-6 on smooth terrain
            # (scripts/tpu_parity_check.py).  On per-cell maps the usual
            # caveat of ANY trig approximation applies: a 1e-6 trajectory
            # perturbation can relocate individual rollouts across cell /
            # penalty / goal boundaries — statistically neutral (benchmark
            # success rates unchanged), exactly like the reference's
            # fastmath.
            dth = dt * ang_tr * w_t
            cth, sth = hd
            z2 = dth * dth
            cd = 1.0 - z2 * (0.5 - z2 * (1.0 / 24.0))
            sd = dth * (1.0 - z2 * ((1.0 / 6.0) - z2 * (1.0 / 120.0)))
            hd_new = (cth * cd - sth * sd, sth * cd + cth * sd)
            x_new = x + dt * lin_tr * v_t * cth
            y_new = y + dt * lin_tr * v_t * sth
        else:
            # Generic pluggable dynamics: the registered step fn is pure
            # elementwise jnp, so it traces directly into the kernel on the
            # (m_tile, LANES) state tiles.
            x_new, y_new, hd_new = step_fn(x, y, hd, v_t, w_t, lin_tr,
                                           ang_tr, dt)

        dist2_new = (gx - x_new) ** 2 + (gy - y_new) ** 2
        if speed_map:
            eff = lin_lb + lin_ratio * ((words >> 18) & 0xFF).astype(f32)
            dt_eff = dt / (eff + 1e-6)
        else:
            dt_eff = dt
        step_cost = (dt_eff + dist_w * jnp.sqrt(dist2_new)
                     + obs * obs_pen + unk * unk_pen)

        # Post-reach, the state may keep evolving freely: every consumer of
        # it (stage cost, map penalties, dist2) is masked by ``active``, and
        # the terminal cost reads only the FROZEN dist2 — so freezing x/y/hd
        # would buy nothing but 3-4 extra vector blends per step.
        active = 1.0 - reachedf
        cost = cost + active * step_cost
        dist2 = dist2 + active * (dist2_new - dist2)
        reachedf = jnp.maximum(reachedf,
                               active * (dist2_new <= tol2).astype(f32))
        return x_new, y_new, hd_new, cost, dist2, reachedf

    if fast_trig:
        hd0 = (jnp.full(shape, jnp.cos(x0th), f32),
               jnp.full(shape, jnp.sin(x0th), f32))
    else:
        hd0 = jnp.full(shape, x0th, f32)
    init = (jnp.full(shape, x0x, f32), jnp.full(shape, x0y, f32),
            hd0, jnp.zeros(shape, f32),
            jnp.full(shape, 1e9, f32), jnp.zeros(shape, f32))
    x, y, hd, cost, dist2, reachedf = _run_time_loop(T, step, init, t_unroll)
    cost_ref[:] = cost + (1.0 - reachedf) * jnp.sqrt(dist2) / (v_post + 1e-6)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "T", "speed_map", "fast_trig",
                                    "interpret", "m_tile", "step_fn",
                                    "t_unroll"))
def terrain_rollout_costs_pallas(packed_words, task_vec, v_all, w_all,
                                 *, H, W, T, speed_map=False, fast_trig=False,
                                 interpret=False, m_tile=None, step_fn=None,
                                 t_unroll=1):
    """Fused rollout on TPU.

    Args:
      packed_words: int32 ``(M, H, W)`` packed map words.
      task_vec: float32 ``(8, 128)`` scalar tile (see ``_rollout_kernel``).
      v_all / w_all: float32 ``(T, K)`` pre-clipped noisy controls, K a
        multiple of 128 (solver pads + masks).

    Returns:
      float32 ``(K, M)`` rollout costs incl. terminal, excl. coupling —
      identical semantics to ``ops.rollout.terrain_rollout_costs``.
    """
    M = packed_words.shape[0]
    K = v_all.shape[1]
    assert K % LANES == 0, K
    hw = H * W
    hw_pad = _ceil_to(hw, LANES)
    n_chunks = hw_pad // LANES
    m_pad = _ceil_to(max(M, 8), 8)
    m_tile = min(m_pad, MAX_M_TILE if m_tile is None else m_tile)
    m_pad = _ceil_to(m_pad, m_tile)

    flat = packed_words.reshape(M, hw)
    flat = jnp.pad(flat, ((0, m_pad - M), (0, hw_pad - hw)))
    chunks = flat.reshape(m_pad, n_chunks, LANES).transpose(1, 0, 2)

    if step_fn is None:
        from ...models import unicycle_step
        step_fn = unicycle_step
    assert not (fast_trig and step_fn.__name__ != "unicycle_step"), \
        "fast_trig hard-codes the unicycle rotation update"
    grid = (m_pad // m_tile, K // LANES)
    kernel = functools.partial(_rollout_kernel, T=T, H=H, W=W,
                               n_chunks=n_chunks, speed_map=speed_map,
                               fast_trig=fast_trig, step_fn=step_fn,
                               t_unroll=t_unroll)
    costs_mk = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((m_pad, K), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda mi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, m_tile, LANES),
                         lambda mi, ki: (0, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda mi, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda mi, ki: (0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, LANES), lambda mi, ki: (mi, ki),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(task_vec, chunks, v_all, w_all)
    return costs_mk[:M].T


# ---------------------------------------------------------------------------
# Bin-packed variant: 4-bit PMF bin indices, 4 cells per int32 word.
#
# Mosaic's hardware gather is single-vreg along the gather dimension
# (measured: scripts/gather_probe.py), so any lookup table larger than 128
# words per tile row is a chunk walk of gather+select ops — O(map area) per
# step.  The byte-packed kernel above covers 128 CELLS per chunk; packing
# 4-bit bin indices instead covers 512 cells per chunk (plus a shared
# 16-cells/word obstacle/unknown walk at 2048 cells per chunk), cutting the
# walk ~4x.  Traction decode happens through a per-bin LUT gather (exactly
# ``lb + ratio * float(qbin)``, bit-identical to the XLA core's decode).
# This is what keeps the fused kernel engaged at flagship M on realistic
# maps (the 138x82 forest TDM, reference max_map_dim=(250,250) with ROI
# cropping) where the byte layout blows the VMEM budget.
# ---------------------------------------------------------------------------

NIB_CELLS_PER_CHUNK = 4 * LANES     # 512
BYTE2_CELLS_PER_CHUNK = 2 * LANES   # 256 (cell_bits=8: >16-bin TDMs)
CRUMB_CELLS_PER_CHUNK = 8 * LANES   # 1024 (cell_bits=2: <=4-bin TDMs)
MASK_CELLS_PER_CHUNK = 16 * LANES   # 2048
# Walk strategy threshold: a statically unrolled chunk walk pipelines better
# while it is short; the EXACT-OCCUPANCY banded walk's cost is nearly flat
# in total chunk count (it only ever walks the occupied band, ~7.9 ms on
# v5e at M=256/T=50 for 10-15 chunk maps), so it wins much earlier than the
# round-2 reachability-cone band did.  Round-5 on-device crossover sweep
# (scripts/walk_probe.py, BENCH_WALK.jsonl, v5e): unrolled/banded ms =
# 4.8/5.7 @4ch, 6.0/7.9 @6ch, 7.0/7.9 @8ch, 9.4/7.9 @10ch(crumb),
# 11.0/7.9 @12ch(crumb), 11.2/7.8 @15ch -> crossover between 8 and 10.
MAX_UNROLLED_CHUNKS = 8
# The BYTE kernel has no banded walk, so its routing cutoff (solver.py) is
# not a banded-vs-unrolled choice but a byte-vs-binned8 one; its 128-cell
# chunks are a different walk granularity than the probe above measured.
# Keep the round-2 measured value for that decision.
MAX_UNROLLED_CHUNKS_BYTE = 16


def pallas_rollout_binned_supported(num_grid_samples, map_hw, num_steps=128,
                                    num_pmf_bins=16, speed_map=True,
                                    cell_bits=4, vmem_budget=VMEM_BUDGET,
                                    stream=False, stream_band=None,
                                    stream_slots=2):
    """The sublane tile size to use, or None when the kernel cannot run.

    ``speed_map`` charges the shared risk-byte plane; callers that know the
    mode pass ``False`` to avoid over-reserving (default True for safety).
    ``cell_bits=8`` is the byte-pair layout (``pack_byte_pairs``): 256
    cells per chunk and NO bin-count limit — the cell plane carries decoded
    int8 traction values instead of nibble bin indices.  ``cell_bits=2`` is
    the crumb layout (``pack_bin_crumbs``): 1024 cells per chunk, needs
    <= 4 PMF bins.  ``stream=True`` keeps the cell plane in HBM and only
    charges the ``STREAM_BAND``-chunk DMA window, so huge maps can still
    run at MAX_M_TILE.
    """
    if cell_bits == 4 and not (0 < num_pmf_bins <= 16):
        return None
    if cell_bits == 2 and not (0 < num_pmf_bins <= 4):
        return None
    cpc = {2: CRUMB_CELLS_PER_CHUNK, 4: NIB_CELLS_PER_CHUNK,
           8: BYTE2_CELLS_PER_CHUNK}[cell_bits]
    n_cell_chunks = -(-map_hw // cpc)
    n_mask_chunks = max(8, -(-map_hw // MASK_CELLS_PER_CHUNK))
    # The shared risk plane always packs 4 cells/word (pack_risk_bytes),
    # independent of the cell plane's layout.
    n_risk_chunks = -(-map_hw // NIB_CELLS_PER_CHUNK)
    if stream_band is None:
        stream_band = STREAM_BAND
    # ``stream_slots``: per-step streaming double-buffers 2 window slots;
    # group-resident streaming (stream_group) holds stream_slots windows —
    # callers sizing a tile for that mode must pass the real slot count or
    # the chosen tile blows VMEM at compile time (round-5 review finding).
    cell_resident = (stream_slots * stream_band if stream
                     else 2 * n_cell_chunks)
    m_pad = _ceil_to(max(num_grid_samples, 8), 8)
    for m_tile in (MAX_M_TILE, 128, 64, 32):
        mt = min(m_pad, m_tile)
        words = (cell_resident * mt * LANES       # cell chunks (dbl-buffered
                                                  # resident, or DMA window)
                 + 2 * 2 * num_steps * LANES      # v + w controls
                 + (n_mask_chunks + 8) * LANES    # shared masks + LUT
                 + (n_risk_chunks * LANES if speed_map else 0)  # risk plane
                 + 10 * mt * LANES)               # state planes + out + scratch
        if words * 4 <= vmem_budget:
            return mt
    return None


DEFAULT_BAND_UNROLL = 4   # chunks per banded-walk iteration (confirmed by
                          # the r4 sweep: 4 beats 2 and 8 at both 140x84
                          # (8.32 vs 8.58/10.0 ms) and 250x250 (14.58 vs
                          # 15.15/16.41 ms) — BENCH_TUNROLL.jsonl)

# HBM-streaming cell plane (``stream=True``): chunks DMA'd per band window.
# Window size trades DMA count against over-fetch past the band edge;
# overridable per call via ``stream_band`` (swept by scripts/tunroll_probe.py).
# r4 sweep: 4 beats 8 by ~30% at both 250x250 (12.76 vs 18.11 ms) and
# 140x84 (12.71 vs 18.69 ms); 16 is 2.5x worse (32.2 ms) — narrow windows
# track the band tighter and the doubled DMA count pipelines fine.
# r5 extension at 250x250 nibble: 2 beats 4 by ~9% (10.5-10.8 vs
# 11.6 ms) and 1 gives it back (11.2 ms — per-window overhead); byte2
# agrees (sb=2 13.9 vs sb=4 14.6 ms).  BENCH_WALK.jsonl.
STREAM_BAND = 2
# Group-resident streaming (opt-in stream_group=True): windows held across
# an anchor group (+1 spill slot).  16 resident windows x STREAM_BAND(2)
# chunks cover a 32-chunk occupancy band — wider than any measured band
# (250x250 nibble averages ~23+margin) — before the serial spill path
# engages.  Re-derive if STREAM_BAND changes: coverage = (slots-1) * band.
DEFAULT_STREAM_SLOTS = 17


def _rollout_kernel_binned(task_ref, nib_ref, mask_ref, *refs, T, H, W,
                           n_cell_chunks, n_mask_chunks, n_risk_chunks,
                           fast_trig, step_fn, banded, speed_map,
                           cell_bits=4, t_unroll=1,
                           band_unroll=DEFAULT_BAND_UNROLL, band_anchor=1,
                           stream=False, stream_band=STREAM_BAND,
                           stream_slots=2, stream_group=False,
                           max_unrolled=MAX_UNROLLED_CHUNKS):
    refs = list(refs)
    if stream:
        # HBM-streaming layout: nib_ref is the FULL (n_cell_chunks, m_pad,
        # LANES) plane in ANY/HBM; the per-step band window is DMA'd into
        # cell_scratch (scratch refs trail the output in pallas_call order).
        cell_scratch, dma_sem = refs[-2], refs[-1]
        refs = refs[:-2]
    if speed_map:
        risk_ref, lut_ref, v_ref, w_ref, cost_ref = refs
    else:
        risk_ref = None
        lut_ref, v_ref, w_ref, cost_ref = refs
    f32 = jnp.float32
    x0x, x0y, x0th = task_ref[0, 0], task_ref[0, 1], task_ref[0, 2]
    gx, gy = task_ref[0, 3], task_ref[0, 4]
    tol = task_ref[0, 5]
    v_post = task_ref[0, 6]
    dt = task_ref[0, 7]
    dist_w = task_ref[0, 8]
    obs_pen = task_ref[0, 9]
    unk_pen = task_ref[0, 10]
    inv_res = task_ref[0, 11]
    xlim0, ylim0 = task_ref[0, 12], task_ref[0, 13]
    lin_lb, lin_ratio = task_ref[0, 14], task_ref[0, 15]
    ang_lb, ang_ratio = task_ref[0, 16], task_ref[0, 17]
    tol2 = tol * tol
    # Cell-plane layout: 2/4-bit bin indices (LUT decode) or 8-bit decoded
    # value pairs (inline lb + ratio * value decode — same arithmetic).
    cell_cpc = {2: CRUMB_CELLS_PER_CHUNK, 4: NIB_CELLS_PER_CHUNK,
                8: BYTE2_CELLS_PER_CHUNK}[cell_bits]
    cell_shift = {2: 3, 4: 2, 8: 1}[cell_bits]

    m_tile = cost_ref.shape[0]
    shape = (m_tile, LANES)
    lut_lin = jnp.broadcast_to(lut_ref[0:1, :], shape)
    lut_ang = jnp.broadcast_to(lut_ref[1:2, :], shape)
    def mask_tile(c):
        return jnp.broadcast_to(mask_ref[c], shape)

    def risk_tile(c):
        return jnp.broadcast_to(risk_ref[c], shape)

    def unrolled_walk(cell, table_at, cells_per_chunk, idx_shift, n_data):
        words = jnp.zeros(shape, jnp.int32)
        for c in range(n_data):
            local = cell - c * cells_per_chunk
            inb = (local >= 0) & (local < cells_per_chunk)
            g = jnp.take_along_axis(table_at(c),
                                    (local >> idx_shift) & (LANES - 1),
                                    axis=1, mode="promise_in_bounds")
            words = jnp.where(inb, g, words)
        return words

    # Exact-occupancy-banded chunk walk: the cell ids visited at step t are
    # known EXACTLY at step t (``cell`` is already computed), so a scalar
    # min/max reduction over the (m_tile, LANES) tile gives the precise
    # contiguous chunk range the walk must cover — always a subset of the
    # reachability cone (round-2's band grew as t*max_cells_per_step around
    # x0's row and averaged ~36% of the 250x250 walk; the occupancy band is
    # tight by construction and needs NO displacement-bound assumption, so
    # it is correct for arbitrary registered dynamics models).  The two
    # reductions per step are shared by the nibble / mask / risk walks.
    def banded_walk(cell_lo, cell_hi, cell, table3, cells_per_chunk,
                    idx_shift, n_data, unroll=band_unroll):
        # Clamp before dividing: margin-widened group bands (band_anchor>1)
        # may extend past the map; over-walked chunks mask to zero, but the
        # bounds themselves must stay inside the chunk table.
        c_lo = jnp.maximum(cell_lo, 0) // cells_per_chunk
        c_hi = (jnp.minimum(cell_hi, n_data * cells_per_chunk - 1)
                // cells_per_chunk + 1)

        def one(c, words):
            tab = table3[c]
            if tab.shape[0] != m_tile:
                tab = jnp.broadcast_to(tab[0:1, :], shape)
            local = cell - c * cells_per_chunk
            inb = (local >= 0) & (local < cells_per_chunk)
            g = jnp.take_along_axis(tab, (local >> idx_shift) & (LANES - 1),
                                    axis=1, mode="promise_in_bounds")
            return words | jnp.where(inb, g, 0)

        # The dynamic loop costs ~3x per chunk vs the static unrolled walk
        # (measured round 2: 51.6 ms banded/123 chunks vs 10.7 ms
        # unrolled/13 chunks at the same per-chunk gather cost) — loop
        # overhead + serialized dynamic-major-dim loads.  Processing
        # ``unroll`` chunks per iteration amortizes the overhead and gives
        # Mosaic ILP across the gathers.  Chunks past c_hi are processed
        # clamped-and-masked: cells past the band have local < 0 there, so
        # they contribute zero — correctness does not depend on the bounds
        # being tight, only on them covering [min cell, max cell], which
        # they do by construction.
        def body(i, words):
            base = c_lo + i * unroll
            for j in range(unroll):
                words = one(jnp.minimum(base + j, n_data - 1), words)
            return words

        n_iters = (c_hi - c_lo + unroll - 1) // unroll
        return jax.lax.fori_loop(0, n_iters, body,
                                 jnp.zeros(shape, jnp.int32))

    n_mask_data = min(n_mask_chunks, -(-(H * W) // MASK_CELLS_PER_CHUNK))
    # The risk plane packs 4 cells/word regardless of cell_bits, so with the
    # 2-bit crumb layout it has 2x the cell plane's chunk count — it can be
    # the only plane that needs the band (e.g. 100x100: 10 cell chunks,
    # 20 risk chunks).  Gate on all three walks or the risk banded_walk
    # would read cell_lo/cell_hi that were never assigned.  The HBM-stream
    # path always needs the band: it bounds the DMA windows.
    use_band = stream or (banded and (n_cell_chunks > max_unrolled
                                      or n_mask_data > max_unrolled
                                      or (speed_map and n_risk_chunks
                                          > max_unrolled)))

    if stream:
        m0 = pl.program_id(0) * m_tile
        max_base = max(n_cell_chunks - stream_band, 0)

        def stream_dma(base, slot):
            return pltpu.make_async_copy(
                nib_ref.at[pl.ds(base, stream_band), pl.ds(m0, m_tile), :],
                cell_scratch.at[slot], dma_sem.at[slot])

        def win_base(c_lo, wi):
            # Clamped to the plane tail: over-walked chunks contribute zero
            # via the validity mask, so overlap between windows is benign.
            return jnp.minimum(c_lo + wi * stream_band, max_base)

        def band_windows(cell_lo, cell_hi):
            """(first chunk window, window count) covering a cell band.
            Clamp before dividing: margin-widened group bands may extend
            past the plane; window DMAs additionally clamp to max_base."""
            c_lo = jnp.maximum(cell_lo, 0) // cell_cpc
            c_hi = (jnp.minimum(cell_hi, n_cell_chunks * cell_cpc - 1)
                    // cell_cpc + 1)
            return c_lo, (c_hi - c_lo + stream_band - 1) // stream_band

        def stream_start(c_lo, wi, slot):
            stream_dma(win_base(c_lo, wi), slot).start()

        def walk_slot(c_lo, n_win, cell, wi, slot, words):
            base = win_base(c_lo, wi)
            valid = wi < n_win
            for j in range(stream_band):
                local = cell - (base + j) * cell_cpc
                inb = (local >= 0) & (local < cell_cpc) & valid
                g = jnp.take_along_axis(
                    cell_scratch[slot, j],
                    (local >> cell_shift) & (LANES - 1),
                    axis=1, mode="promise_in_bounds")
                words = words | jnp.where(inb, g, 0)
            return words

        def stream_walk(c_lo, n_win, cell):
            """Walk the banded chunk range in STREAM_BAND-chunk DMA windows,
            DOUBLE-BUFFERED over two static scratch slots: windows 0/1 are
            already in flight (started before the mask/risk walks, hiding
            their latency behind that work); each pair iteration waits a
            slot, walks it, and immediately refills it with the window two
            ahead — so the next window's transfer always overlaps the
            current window's gathers.  Static slot indices keep every
            scratch read statically addressed (no dynamic-major-dim VMEM
            loads, the exact cost the resident banded walk pays).  A
            window's contribution is additionally gated on ``wi < n_win``:
            a stale slot from a previous step must never be walked."""
            def pair(i, words):
                w0 = 2 * i
                # Slot 0: window w0 always exists for i < n_pairs.
                stream_dma(win_base(c_lo, w0), 0).wait()
                words = walk_slot(c_lo, n_win, cell, w0, 0, words)

                @pl.when(w0 + 2 < n_win)
                def _():
                    stream_start(c_lo, w0 + 2, 0)

                # Slot 1: window w0+1 only on non-final odd tails; its wait
                # must be predicated — the matching start was too.
                @pl.when(w0 + 1 < n_win)
                def _():
                    stream_dma(win_base(c_lo, w0 + 1), 1).wait()
                words = walk_slot(c_lo, n_win, cell, w0 + 1, 1, words)

                @pl.when(w0 + 3 < n_win)
                def _():
                    stream_start(c_lo, w0 + 3, 1)
                return words

            n_pairs = (n_win + 1) // 2
            return jax.lax.fori_loop(0, n_pairs, pair,
                                     jnp.zeros(shape, jnp.int32))

        # Group-resident streaming (stream + band_anchor > 1): the anchor
        # band is FIXED across the unrolled group, so its DMA windows are
        # identical for every in-group step — transfer each window ONCE per
        # group (into its own static slot; started at group entry, waited
        # on the group's first step) and let all ``band_anchor`` steps walk
        # the resident copies: HBM traffic drops ~band_anchor-fold.  The
        # first ``stream_slots - 1`` windows are resident; rare wider bands
        # spill through the LAST slot with a serial per-step DMA (masked to
        # zero iterations when the band fits).
        n_resident = stream_slots - 1

        def group_stream_start(c_lo_g, n_win_g):
            for wi in range(n_resident):
                @pl.when(wi < n_win_g)
                def _(wi=wi):
                    stream_start(c_lo_g, wi, wi)

        def group_stream_walk(c_lo_g, n_win_g, cell, first):
            words = jnp.zeros(shape, jnp.int32)
            for wi in range(n_resident):
                if first:
                    # The matching start was predicated on wi < n_win_g;
                    # the wait must be too (sems must balance exactly).
                    @pl.when(wi < n_win_g)
                    def _(wi=wi):
                        stream_dma(win_base(c_lo_g, wi), wi).wait()
                words = walk_slot(c_lo_g, n_win_g, cell, wi, wi, words)

            def spill(i, words):
                wi = n_resident + i
                stream_dma(win_base(c_lo_g, wi), n_resident).start()
                stream_dma(win_base(c_lo_g, wi), n_resident).wait()
                return walk_slot(c_lo_g, n_win_g, cell, wi, n_resident,
                                 words)

            return jax.lax.fori_loop(
                0, jnp.maximum(n_win_g - n_resident, 0), spill, words)

    def cell_of(x, y):
        xi = jnp.clip(jnp.floor((x - xlim0) * inv_res).astype(jnp.int32),
                      0, W - 1)
        yi = jnp.clip(jnp.floor((y - ylim0) * inv_res).astype(jnp.int32),
                      0, H - 1)
        return yi * W + xi

    def step(t, carry, band=None, stream_ctx=None):
        x, y, hd, cost, dist2, reachedf = carry
        v_t = v_ref[t, :].reshape(1, LANES)
        w_t = w_ref[t, :].reshape(1, LANES)

        cell = cell_of(x, y)
        if use_band:
            if band is None:
                cell_lo, cell_hi = jnp.min(cell), jnp.max(cell)
            else:
                # Margin-anchored group band (band_anchor > 1): the scalar
                # bounds were derived from an exact reduction at the
                # group's first step plus the per-step displacement margin
                # — no vector->scalar sync on this step.
                cell_lo, cell_hi = band
        if stream and stream_ctx is None:
            c_lo, n_win = band_windows(cell_lo, cell_hi)
            stream_start(c_lo, 0, 0)

            @pl.when(n_win > 1)
            def _():
                stream_start(c_lo, 1, 1)

        # Mask (and risk) walks run BEFORE the cell-plane walk: they do not
        # depend on the cell words, so under ``stream`` the window-0 DMA
        # overlaps them (pure-op reorder; semantics unchanged).
        if n_mask_data <= 1:
            mwords = jnp.take_along_axis(mask_tile(0), cell >> 4, axis=1,
                                         mode="promise_in_bounds")
        elif n_mask_data <= max_unrolled or not banded:
            mwords = unrolled_walk(cell, mask_tile, MASK_CELLS_PER_CHUNK, 4,
                                   n_mask_data)
        else:
            mwords = banded_walk(cell_lo, cell_hi, cell, mask_ref,
                                 MASK_CELLS_PER_CHUNK, 4, n_mask_data)
        mcode = mwords >> ((cell & 15) << 1)
        obs = (mcode & 1).astype(f32)
        unk = ((mcode >> 1) & 1).astype(f32)

        if stream and stream_ctx is not None:
            c_lo_g, n_win_g, first = stream_ctx
            words = group_stream_walk(c_lo_g, n_win_g, cell, first)
        elif stream:
            words = stream_walk(c_lo, n_win, cell)
        elif n_cell_chunks == 1:
            words = jnp.take_along_axis(nib_ref[0], cell >> cell_shift,
                                        axis=1, mode="promise_in_bounds")
        elif n_cell_chunks <= max_unrolled or not banded:
            words = unrolled_walk(cell, lambda c: nib_ref[c],
                                  cell_cpc, cell_shift, n_cell_chunks)
        else:
            words = banded_walk(cell_lo, cell_hi, cell, nib_ref,
                                cell_cpc, cell_shift, n_cell_chunks)
        if cell_bits == 4:
            byte = words >> ((cell & 3) << 3)
            lin_tr = jnp.take_along_axis(lut_lin, byte & 0xF, axis=1,
                                         mode="promise_in_bounds")
            ang_tr = jnp.take_along_axis(lut_ang, (byte >> 4) & 0xF, axis=1,
                                         mode="promise_in_bounds")
        elif cell_bits == 2:
            code = words >> ((cell & 7) << 2)
            lin_tr = jnp.take_along_axis(lut_lin, code & 0x3, axis=1,
                                         mode="promise_in_bounds")
            ang_tr = jnp.take_along_axis(lut_ang, (code >> 2) & 0x3, axis=1,
                                         mode="promise_in_bounds")
        else:
            # Inline value decode (exactly the oracle's expression).  An
            # XLA-built value->traction LUT gather was tried in round 4 and
            # produced BIT-IDENTICAL results, so the two decodes agree on
            # hardware; the rare knife-edge parity outliers (2/131k
            # rollouts, one +-unknown_penalty step each) come from
            # Mosaic-vs-XLA transcendental ulps, not the decode — see
            # scripts/debug_byte2.py and PARITY.md.
            half = words >> ((cell & 1) << 4)
            lin_tr = lin_lb + lin_ratio * (half & 0xFF).astype(f32)
            ang_tr = ang_lb + ang_ratio * ((half >> 8) & 0xFF).astype(f32)

        if speed_map:
            # Fifth map read of speed-map mode (reference:
            # mppi_numba/mppi.py:1095-1096): the shared risk byte walks the
            # same 512-cells/chunk layout (and band) as the nibble plane on
            # a single broadcast sublane.
            if n_risk_chunks == 1:
                rwords = jnp.take_along_axis(risk_tile(0), cell >> 2, axis=1,
                                             mode="promise_in_bounds")
            elif n_risk_chunks <= max_unrolled or not banded:
                rwords = unrolled_walk(cell, risk_tile, NIB_CELLS_PER_CHUNK,
                                       2, n_risk_chunks)
            else:
                rwords = banded_walk(cell_lo, cell_hi, cell, risk_ref,
                                     NIB_CELLS_PER_CHUNK, 2, n_risk_chunks)
            rbyte = ((rwords >> ((cell & 3) << 3)) & 0xFF).astype(f32)
            eff = lin_lb + lin_ratio * rbyte
            dt_eff = dt / (eff + 1e-6)
        else:
            dt_eff = dt

        if fast_trig:
            # Unicycle-only Maclaurin rotation; see the byte-packed kernel.
            dth = dt * ang_tr * w_t
            cth, sth = hd
            z2 = dth * dth
            cd = 1.0 - z2 * (0.5 - z2 * (1.0 / 24.0))
            sd = dth * (1.0 - z2 * ((1.0 / 6.0) - z2 * (1.0 / 120.0)))
            hd_new = (cth * cd - sth * sd, sth * cd + cth * sd)
            x_new = x + dt * lin_tr * v_t * cth
            y_new = y + dt * lin_tr * v_t * sth
        else:
            x_new, y_new, hd_new = step_fn(x, y, hd, v_t, w_t, lin_tr,
                                           ang_tr, dt)

        dist2_new = (gx - x_new) ** 2 + (gy - y_new) ** 2
        step_cost = (dt_eff + dist_w * jnp.sqrt(dist2_new)
                     + obs * obs_pen + unk * unk_pen)

        active = 1.0 - reachedf
        cost = cost + active * step_cost
        dist2 = dist2 + active * (dist2_new - dist2)
        reachedf = jnp.maximum(reachedf,
                               active * (dist2_new <= tol2).astype(f32))
        return x_new, y_new, hd_new, cost, dist2, reachedf

    if fast_trig:
        hd0 = (jnp.full(shape, jnp.cos(x0th), f32),
               jnp.full(shape, jnp.sin(x0th), f32))
    else:
        hd0 = jnp.full(shape, x0th, f32)
    init = (jnp.full(shape, x0x, f32), jnp.full(shape, x0y, f32),
            hd0, jnp.zeros(shape, f32),
            jnp.full(shape, 1e9, f32), jnp.zeros(shape, f32))
    if band_anchor > 1 and use_band and (not stream or stream_group):
        # Group-banded walk: one exact (min, max) vector->scalar reduction
        # per ``band_anchor`` steps instead of per step; steps inside the
        # group widen the anchor band by the per-step displacement bound
        # the host already computes for ROI sizing (build_task_vec idx 18,
        # = max|v| * traction_ub * dt / res cells).  The scalar dependency
        # between the occupancy reduction and the walk's dynamic loop
        # bounds stalls the pipeline each step; anchoring amortizes it
        # band_anchor-fold for ~(j * margin) extra masked-to-zero chunk
        # walks.  Under ``stream`` this runs only when ``stream_group``
        # is EXPLICITLY requested: the group-resident window scheme (each
        # window DMA'd once per group into its own static slot) cuts HBM
        # traffic ~band_anchor-fold but its statically-unrolled
        # all-resident-slots walk costs (stream_slots-1)*stream_band chunk
        # walks per step regardless of the actual band, and measured 2x
        # WORSE than per-step streaming on the uncropped 250x250 (21.1 vs
        # 11.3 ms, round-5 probe; wider slot counts OOM VMEM) — the walk,
        # not the DMA, is this kernel's bottleneck.  Simply reusing the
        # per-step 2-slot rotation with anchor bands also measured worse
        # (10.8 -> 12.9 ms at forest: it re-DMAs the widened band every
        # step).  Only valid for
        # displacement-bounded models (the solver gates on
        # models.has_displacement_bound, the ROI crop's contract).
        # 1.01: fast_trig's Maclaurin rotation may overshoot |cos|,|sin|
        # by ~1e-4 over the horizon.
        mcell = ((jnp.floor(task_ref[0, 18] * 1.01).astype(jnp.int32) + 1)
                 * (W + 1))

        def group(i, carry):
            t0 = i * band_anchor
            cell0 = cell_of(carry[0], carry[1])
            lo0, hi0 = jnp.min(cell0), jnp.max(cell0)
            if stream:
                # One fixed union band for the whole group: windows are
                # started here, waited on the first step, walked by all.
                g_lo = lo0 - (band_anchor - 1) * mcell
                g_hi = hi0 + (band_anchor - 1) * mcell
                c_lo_g, n_win_g = band_windows(g_lo, g_hi)
                group_stream_start(c_lo_g, n_win_g)
                for j in range(band_anchor):
                    carry = step(t0 + j, carry, band=(g_lo, g_hi),
                                 stream_ctx=(c_lo_g, n_win_g, j == 0))
                return carry
            for j in range(band_anchor):
                carry = step(t0 + j, carry,
                             band=(lo0 - j * mcell, hi0 + j * mcell))
            return carry

        carry = jax.lax.fori_loop(0, T // band_anchor, group, init)
        for t in range((T // band_anchor) * band_anchor, T):
            carry = step(t, carry)
        x, y, hd, cost, dist2, reachedf = carry
    else:
        x, y, hd, cost, dist2, reachedf = _run_time_loop(T, step, init,
                                                         t_unroll)
    cost_ref[:] = cost + (1.0 - reachedf) * jnp.sqrt(dist2) / (v_post + 1e-6)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "T", "fast_trig", "interpret",
                                    "m_tile", "step_fn", "banded",
                                    "cell_bits", "t_unroll", "band_unroll",
                                    "band_anchor", "stream", "stream_band",
                                    "stream_slots", "stream_group",
                                    "max_unrolled"))
def terrain_rollout_costs_pallas_binned(nib_words, mask_words, lut, task_vec,
                                        v_all, w_all, risk_words=None,
                                        *, H, W, T,
                                        fast_trig=False, interpret=False,
                                        m_tile=None, step_fn=None,
                                        banded=True, cell_bits=4, t_unroll=1,
                                        band_unroll=DEFAULT_BAND_UNROLL,
                                        band_anchor=1,
                                        stream=False,
                                        stream_band=STREAM_BAND,
                                        stream_slots=DEFAULT_STREAM_SLOTS,
                                        stream_group=False,
                                        max_unrolled=MAX_UNROLLED_CHUNKS):
    """Fused rollout with packed cell-plane maps.

    Args:
      nib_words: the cell plane — int32 ``(M, ceil(H*W/4))`` of 4-bit bin
        indices from ``pack_bin_nibbles`` (``cell_bits=4``, needs <= 16
        PMF bins), int32 ``(M, ceil(H*W/8))`` of 2-bit bin indices from
        ``pack_bin_crumbs`` (``cell_bits=2``, needs <= 4 PMF bins, walks
        half the nibble layout's chunks), or int32 ``(M, ceil(H*W/2))``
        of decoded traction value byte pairs from ``pack_byte_pairs``
        (``cell_bits=8``, any bin count — e.g. the reference benchmark
        world's 22 bins).
      mask_words: int32 ``(ceil(H*W/16),)`` from ``pack_mask_nibbles``.
      lut: float32 ``(8, 128)`` — rows 0/1 hold per-bin linear/angular
        traction (``build_bin_luts``).  Unused (may be None) when
        ``cell_bits=8``: the value plane decodes inline via
        ``lb + ratio * value`` — the identical arithmetic.
      task_vec / v_all / w_all: as in ``terrain_rollout_costs_pallas``.
      risk_words: optional int32 ``(ceil(H*W/4),)`` from
        ``pack_risk_bytes`` — enables speed-map mode (the stage time cost
        becomes ``dt / (decoded risk speed)``, reference:
        mppi_numba/mppi.py:1095-1096).

    Returns:
      float32 ``(K, M)`` rollout costs, identical semantics to
      ``ops.rollout.terrain_rollout_costs`` with
      ``speed_map=(risk_words is not None)``.
    """
    assert cell_bits in (2, 4, 8), cell_bits
    M, n_words = nib_words.shape
    K = v_all.shape[1]
    assert K % LANES == 0, K
    n_cell_chunks = -(-n_words // LANES)
    n_risk_chunks = -(-(H * W) // NIB_CELLS_PER_CHUNK)
    n_mask_chunks_data = -(-mask_words.shape[0] // LANES)
    n_mask_chunks = max(8, n_mask_chunks_data)
    m_pad = _ceil_to(max(M, 8), 8)
    if m_tile is None:
        # num_pmf_bins only gates layout eligibility (the caller already
        # chose cell_bits); pass a value that passes so the call sizes the
        # sublane tile.
        m_tile = pallas_rollout_binned_supported(
            M, H * W, T, num_pmf_bins=4 if cell_bits == 2 else 16,
            speed_map=risk_words is not None,
            cell_bits=cell_bits, stream=stream,
            stream_band=stream_band,
            stream_slots=(stream_slots if (stream and band_anchor > 1
                                           and stream_group) else 2)) \
            or MAX_M_TILE
    m_tile = min(m_pad, m_tile)
    m_pad = _ceil_to(m_pad, m_tile)
    if lut is None:
        lut = jnp.zeros((8, LANES), jnp.float32)

    if stream:
        # DMA windows are ``stream_band`` chunks wide and clamped to the
        # plane tail; pad the chunk axis so even the smallest map has one
        # full window (over-walked chunks mask to zero in-kernel).
        n_cell_chunks = max(n_cell_chunks, stream_band)
    nib = jnp.pad(nib_words, ((0, m_pad - M),
                              (0, n_cell_chunks * LANES - n_words)))
    chunks = nib.reshape(m_pad, n_cell_chunks, LANES).transpose(1, 0, 2)
    masks = jnp.pad(mask_words,
                    (0, n_mask_chunks * LANES - mask_words.shape[0]))
    masks = masks.reshape(n_mask_chunks, 1, LANES)

    if step_fn is None:
        from ...models import unicycle_step
        step_fn = unicycle_step
    assert not (fast_trig and step_fn.__name__ != "unicycle_step"), \
        "fast_trig hard-codes the unicycle rotation update"
    speed_map = risk_words is not None
    grid = (m_pad // m_tile, K // LANES)
    kernel = functools.partial(_rollout_kernel_binned, T=T, H=H, W=W,
                               n_cell_chunks=n_cell_chunks,
                               n_mask_chunks=n_mask_chunks,
                               n_risk_chunks=n_risk_chunks,
                               fast_trig=fast_trig, step_fn=step_fn,
                               banded=banded, speed_map=speed_map,
                               cell_bits=cell_bits, t_unroll=t_unroll,
                               band_unroll=band_unroll,
                               band_anchor=band_anchor, stream=stream,
                               stream_band=stream_band,
                               stream_slots=stream_slots,
                               stream_group=stream_group,
                               max_unrolled=max_unrolled)
    if stream:
        # Full cell plane stays in HBM; the kernel DMAs band windows into
        # VMEM scratch itself (m_tile passed via the scratch shape below).
        cell_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        cell_spec = pl.BlockSpec((n_cell_chunks, m_tile, LANES),
                                 lambda mi, ki: (0, mi, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((8, LANES), lambda mi, ki: (0, 0),
                     memory_space=pltpu.VMEM),
        cell_spec,
        pl.BlockSpec((n_mask_chunks, 1, LANES), lambda mi, ki: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [task_vec, chunks, masks]
    if speed_map:
        risk = jnp.pad(risk_words,
                       (0, n_risk_chunks * LANES - risk_words.shape[0]))
        operands.append(risk.reshape(n_risk_chunks, 1, LANES))
        in_specs.append(pl.BlockSpec((n_risk_chunks, 1, LANES),
                                     lambda mi, ki: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    operands += [lut, v_all, w_all]
    in_specs += [
        pl.BlockSpec((8, LANES), lambda mi, ki: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, LANES), lambda mi, ki: (0, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, LANES), lambda mi, ki: (0, ki),
                     memory_space=pltpu.VMEM),
    ]
    scratch_shapes = []
    if stream:
        # Per-step streaming double-buffers 2 slots; group-resident
        # streaming (band_anchor > 1) holds ``stream_slots - 1`` windows
        # resident across the group plus one serial spill slot.
        n_slots = stream_slots if (band_anchor > 1 and stream_group) else 2
        scratch_shapes = [
            pltpu.VMEM((n_slots, stream_band, m_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ]
    costs_mk = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((m_pad, K), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_tile, LANES), lambda mi, ki: (mi, ki),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)
    return costs_mk[:M].T


def build_bin_luts(task, lin_qbins, ang_qbins):
    """Per-bin effective traction LUT: exactly the XLA core's decode
    ``lb + ratio * float(qbin_int8)`` so kernel and oracle agree bitwise.
    The lin and ang tables may have different bin counts."""
    lin = task.lin_lb + task.lin_ratio * lin_qbins.astype(jnp.float32)
    ang = task.ang_lb + task.ang_ratio * ang_qbins.astype(jnp.float32)
    lut = jnp.zeros((8, LANES), jnp.float32)
    return (lut.at[0, :lin_qbins.shape[0]].set(lin)
               .at[1, :ang_qbins.shape[0]].set(ang))


def build_task_vec(task):
    """Pack the TerrainTask scalars the kernel needs into an (8, 128) tile."""
    # Index 18: upper bound on per-step cell displacement.  Read by the
    # group-anchored banded walk (band_anchor > 1) to widen the in-group
    # margin, so it must bound EVERY decodable traction: cell values are
    # int8, so 127 (not the nominal 0..100 quantization range) is the
    # hard decode ceiling ``lb + ratio * value`` can reach — a PMF grid
    # whose quantized bin values exceeded 100 would otherwise let rollouts
    # outrun the margin band and silently decode zero traction.  The same
    # bound (from the TDM's actual value bounds) gates ROI sizing on the
    # host (mppi.py::MPPIPlanner._roi_shape).
    vmax = jnp.maximum(jnp.abs(task.vrange[0]), jnp.abs(task.vrange[1]))
    tr_ub = jnp.maximum(task.lin_lb,
                        task.lin_lb + task.lin_ratio * 127.0)
    max_cells_per_step = vmax * tr_ub * task.dt / task.res
    vec = jnp.stack([
        task.x0[0], task.x0[1], task.x0[2],
        task.xgoal[0], task.xgoal[1],
        task.goal_tolerance, task.v_post_rollout, task.dt,
        task.dist_weight, task.obs_penalty, task.unknown_penalty,
        1.0 / task.res, task.xlim0, task.ylim0,
        task.lin_lb, task.lin_ratio, task.ang_lb, task.ang_ratio,
        max_cells_per_step,
    ]).astype(jnp.float32)
    tile = jnp.zeros((8, LANES), jnp.float32)
    return jax.lax.dynamic_update_slice(tile, vec[None], (0, 0))
