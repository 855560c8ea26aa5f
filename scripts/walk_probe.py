#!/usr/bin/env python3
"""Probe the banded-vs-unrolled chunk-walk crossover on real TPU (round 4).

The round-2 threshold MAX_UNROLLED_CHUNKS=16 was measured against the old
reachability-CONE band; the round-3 exact-occupancy band walks far fewer
chunks per step (forest avg 8.3 of 23; crumb-forest 4.7 of 12), so banded
may now win well below 16 chunks — the r4 roofline flagged crumb-forest
(12 chunks, unrolled) at 2.0x its banded prediction.  Sweep max_unrolled
at shapes whose chunk counts straddle the old threshold.

Run on the real TPU, no other TPU process:
    python scripts/walk_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from _bench_common import (T, build_binned_problem, build_crumb_problem)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    CRUMB_CELLS_PER_CHUNK, NIB_CELLS_PER_CHUNK,
    terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.profiling import chained_kernel_time


def case(kernel, H, W):
    if kernel == "crumb":
        cells, maskw, lut, tv, v_all, w_all = build_crumb_problem(H, W)
        cell_bits, cpc = 2, CRUMB_CELLS_PER_CHUNK
    else:
        cells, maskw, lut, tv, v_all, w_all = build_binned_problem(H, W)
        cell_bits, cpc = 4, NIB_CELLS_PER_CHUNK
    n_chunks = -(-(H * W) // cpc)
    # max_unrolled=0 forces the banded walk; a value >= n_chunks forces the
    # static unrolled walk.
    for mu, label in ((64, "unrolled"), (0, "banded")):
        ms = chained_kernel_time(
            lambda v, mu=mu: terrain_rollout_costs_pallas_binned(
                cells, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, cell_bits=cell_bits, max_unrolled=mu),
            v_all)
        print(json.dumps({"kernel": kernel, "shape": [H, W],
                          "chunks": n_chunks, "walk": label,
                          "ms": round(ms, 3)}), flush=True)


def anchor_case(kernel, H, W, t_unroll=4):
    """Round-5 group-band probe: one occupancy (min,max) reduction per
    ``band_anchor`` steps (margin-widened within the group) vs per-step.
    The hypothesis is the per-step vector->scalar sync on the walk's loop
    bounds is the flat ~7.9 ms floor BENCH_WALK.jsonl shows for the banded
    walk regardless of band size."""
    if kernel == "crumb":
        cells, maskw, lut, tv, v_all, w_all = build_crumb_problem(H, W)
        cell_bits, cpc = 2, CRUMB_CELLS_PER_CHUNK
    else:
        cells, maskw, lut, tv, v_all, w_all = build_binned_problem(H, W)
        cell_bits, cpc = 4, NIB_CELLS_PER_CHUNK
    n_chunks = -(-(H * W) // cpc)
    for ba in (1, 2, t_unroll):
        ms = chained_kernel_time(
            lambda v, ba=ba: terrain_rollout_costs_pallas_binned(
                cells, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, cell_bits=cell_bits, max_unrolled=0,
                t_unroll=t_unroll, band_anchor=ba),
            v_all)
        print(json.dumps({"kernel": kernel, "shape": [H, W],
                          "chunks": n_chunks, "walk": "banded",
                          "band_anchor": ba, "t_unroll": t_unroll,
                          "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    from _bench_common import require_live_tpu
    require_live_tpu()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.default_backend() == "tpu", jax.default_backend()
    if "--anchor" in sys.argv:
        anchor_case("nibble", 140, 84)   # forest: 23 chunks, always banded
        anchor_case("nibble", 85, 85)    # ROI flagship: 15 chunks
        anchor_case("nibble", 250, 250)  # 123 chunks
        anchor_case("crumb", 250, 250)   # 62 chunks
        anchor_case("crumb", 140, 84)    # 12 chunks
        sys.exit(0)
    case("crumb", 140, 84)    # 12 chunks — the roofline's 2.0x outlier
    case("nibble", 85, 85)    # 15 chunks — the ROI flagship shape
    case("nibble", 64, 64)    # 8 chunks
    case("nibble", 52, 52)    # 6 chunks
    case("crumb", 100, 100)   # 10 chunks
    case("nibble", 40, 40)    # 4 chunks
