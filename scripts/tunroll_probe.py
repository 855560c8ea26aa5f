#!/usr/bin/env python3
"""Sweep t_unroll (horizon steps per fori_loop iteration) on real TPU.

Shapes: flagship byte kernel (9x11 benchmark world) and the binned kernel
at forest (140x84) and max_map_dim (250x250) scale.  Feeds the
DEFAULT_T_UNROLL_* constants in ops/pallas/rollout_kernel.py.

Run on the real TPU, no other TPU process:
    python scripts/tunroll_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from _bench_common import (T, build_binned_problem, build_byte_problem,
                           build_crumb_problem)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    terrain_rollout_costs_pallas, terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.profiling import chained_kernel_time


def byte_case(H, W):
    packed, tv, v_all, w_all = build_byte_problem(H, W)
    for tu in (1, 2, 4, 5):
        ms = chained_kernel_time(
            lambda v, tu=tu: terrain_rollout_costs_pallas(
                packed, tv, v, w_all, H=H, W=W, T=T, fast_trig=True,
                t_unroll=tu), v_all)
        print(json.dumps({"kernel": "byte", "shape": [H, W],
                          "t_unroll": tu, "ms": round(ms, 3)}), flush=True)


def binned_case(H, W):
    nib, maskw, lut, tv, v_all, w_all = build_binned_problem(H, W)
    for tu in (1, 2, 4):
        ms = chained_kernel_time(
            lambda v, tu=tu: terrain_rollout_costs_pallas_binned(
                nib, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, t_unroll=tu), v_all)
        print(json.dumps({"kernel": "binned", "shape": [H, W],
                          "t_unroll": tu, "ms": round(ms, 3)}), flush=True)
    # Banded-walk chunk unroll (DEFAULT_BAND_UNROLL; only reachable in the
    # banded regime, i.e. the realistic shapes below).
    for bu in (2, 4, 8):
        ms = chained_kernel_time(
            lambda v, bu=bu: terrain_rollout_costs_pallas_binned(
                nib, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, band_unroll=bu), v_all)
        print(json.dumps({"kernel": "binned", "shape": [H, W],
                          "band_unroll": bu, "ms": round(ms, 3)}),
              flush=True)
    # Sublane tile sweep: supported() returns the LARGEST tile that fits,
    # but the byte kernel measured 256 beating 1024 by 13% — smaller tiles
    # may pipeline the chunk walk better here too.
    from mppi_numba_tpu.ops.pallas.rollout_kernel import (
        pallas_rollout_binned_supported)
    mt_max = pallas_rollout_binned_supported(1024, H * W, T, 12,
                                             speed_map=False)
    for mt in (32, 64, 128, 256):
        if mt > mt_max:
            continue
        ms = chained_kernel_time(
            lambda v, mt=mt: terrain_rollout_costs_pallas_binned(
                nib, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, m_tile=mt), v_all)
        print(json.dumps({"kernel": "binned", "shape": [H, W],
                          "m_tile": mt, "ms": round(ms, 3)}), flush=True)


def stream_case(H, W, full=True):
    """HBM-streaming cell plane: sweep m_tile (streaming frees the VMEM
    that capped it at 64), t_unroll, and the DMA window width
    (``stream_band``: window count vs over-fetch past the band edge)."""
    nib, maskw, lut, tv, v_all, w_all = build_binned_problem(H, W)
    configs = [(None, 1, 8), (None, 2, 8), (None, 4, 8), (128, 1, 8),
               (64, 1, 8), (None, 1, 4), (None, 1, 16)]
    if not full:            # secondary shape: just the window/tile corners
        configs = [(None, 1, 8), (None, 1, 4), (128, 1, 8)]
    for mt, tu, sb in configs:
        ms = chained_kernel_time(
            lambda v, mt=mt, tu=tu, sb=sb: terrain_rollout_costs_pallas_binned(
                nib, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, stream=True, m_tile=mt, t_unroll=tu,
                stream_band=sb),
            v_all)
        print(json.dumps({"kernel": "binned_stream", "shape": [H, W],
                          "m_tile": mt, "t_unroll": tu, "stream_band": sb,
                          "ms": round(ms, 3)}), flush=True)


def crumb_case(H, W):
    """2-bit cell plane (<=4-bin TDMs) at the long-walk shape it targets."""
    crumbs, maskw, lut, tv, v_all, w_all = build_crumb_problem(H, W)
    for tu, bu in ((1, 4), (2, 4), (1, 8), (1, 2)):
        ms = chained_kernel_time(
            lambda v, tu=tu, bu=bu: terrain_rollout_costs_pallas_binned(
                crumbs, maskw, lut, tv, v, w_all, H=H, W=W, T=T,
                fast_trig=True, cell_bits=2, t_unroll=tu, band_unroll=bu),
            v_all)
        print(json.dumps({"kernel": "crumb", "shape": [H, W],
                          "t_unroll": tu, "band_unroll": bu,
                          "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    from _bench_common import require_live_tpu
    require_live_tpu()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.default_backend() == "tpu", jax.default_backend()
    byte_case(9, 11)          # flagship benchmark world (padded)
    binned_case(140, 84)      # forest-size, banded regime
    binned_case(250, 250)     # max_map_dim, banded regime
    crumb_case(250, 250)      # <=4-bin crumb plane, banded regime
    stream_case(250, 250)     # HBM-streaming cell plane, huge-walk regime
    # Forest scale: VMEM-resident fits here, but the static-slot scratch
    # reads may still beat the resident banded walk's dynamic-major-dim
    # loads (the measured 1.44x forest overhead) — decision data for
    # resolve_backend routing.
    stream_case(140, 84, full=False)
