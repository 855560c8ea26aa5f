#!/usr/bin/env python3
"""Flagship-shape solve latency on REALISTIC map sizes (real TPU).

Round-1 state: the byte-packed Pallas kernel only fit VMEM up to ~40x40
maps at M=1024, so the 138x82 forest TDM and the reference's
max_map_dim=(250,250) regime (reference: mppi_numba/config.py:28) fell back
to XLA's generic gather.  This script measures the round-2 fixes:

* bin-packed kernel (4 cells/word nibble layout, ops/pallas/rollout_kernel)
* reachable-window ROI cropping (SolverStatic.roi_shape)
* the XLA fallback, for the record

Each scenario runs the FULL solve (sampling + packing + rollout + CVaR +
update) chained on device.  Run on the real TPU, no other TPU process:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bigmap_bench.py
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.solver import get_terrain_solver, resolve_backend
from mppi_numba_tpu.types import MapInputs, TerrainTask

K, M, T = 1024, 1024, 100
B = 12                      # forest-TDM bin count; nibble-packable
RES = 0.5
VMAX = 2.0
CVAR_ALPHA = 0.2


def build(H, W, roi, backend="auto", mode="tdm", B=B):
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 100, size=(B, H, W)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    qbins = np.linspace(0, 100, B).astype(np.int8)
    maps = MapInputs(
        lin_pmf=jnp.asarray(pmf), ang_pmf=jnp.asarray(pmf),
        lin_qbins=jnp.asarray(qbins), ang_qbins=jnp.asarray(qbins),
        obstacle=jnp.zeros((H, W), jnp.int8),
        unknown=jnp.zeros((H, W), jnp.int8),
        risk=jnp.asarray(rng.randint(30, 101, (H, W)).astype(np.int8)))
    x0 = [W * RES / 2, H * RES / 2, 0.785]
    goal = [W * RES - 2, H * RES - 2]
    flat = np.concatenate([
        x0, goal, [2.0, 3.0], [0.0, VMAX], [-3.14, 3.14],
        [0.5, 0.01, 1.0, 0.1, 1.0, 1e5, 1e2, 1.0, RES, 0.0, 0.0,
         0.0, 0.01, 0.0, 0.01]]).astype(np.float32)
    fl = jnp.asarray(flat)
    task = TerrainTask(fl[0:3], fl[3:5], fl[11], fl[12], fl[13], fl[5:7],
                       fl[7:9], fl[9:11], fl[14], fl[15], fl[16], fl[17],
                       fl[18], fl[19], fl[20], fl[21], fl[22], fl[23],
                       fl[24], fl[25])
    m = M if mode == "tdm" else 1      # det modes roll one condensed map
    static = SolverStatic(mode=mode, num_steps=T, num_control_rollouts=K,
                          num_grid_samples=m, map_shape=(H, W),
                          num_obstacles=0,
                          cvar_numel=math.ceil(m * CVAR_ALPHA) if m > 1 else 1,
                          num_opt=1,
                          num_vis_state_rollouts=1, fast_trig=True,
                          backend=backend, roi_shape=roi, num_pmf_bins=B)
    return static, maps, task


def roi_for(H, W):
    """The planner's honest reachable-window size (mppi.py::_roi_shape)."""
    cells = int(math.ceil(VMAX * T * 0.1 / RES)) + 2
    r = 2 * cells + 1
    return (min(H, r), min(W, r))


def measure(static, maps, task, n=30):
    """Best-of-3 chained on-device solves via the shared timing helper
    (mppi_numba_tpu/profiling.py; CLAUDE.md's timing rule)."""
    from mppi_numba_tpu.profiling import chained_solve_time

    fn = get_terrain_solver(static)
    u0 = jnp.zeros((T, 2), jnp.float32)
    best = min(chained_solve_time(fn, maps, task, u0, num_iters=n,
                                  key=jax.random.PRNGKey(1 + rep),
                                  fetch_rtt_s=0.03)
               for rep in range(3))
    return 1000.0 * best


def main():
    from _bench_common import require_live_tpu
    require_live_tpu()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    scenarios = [
        # (label, H, W, roi, backend, mode, n_chain)
        ("forest_140x84_binned", 140, 84, None, "auto", "tdm", 30),
        ("forest_140x84_binned_roi", 140, 84, roi_for(140, 84), "auto",
         "tdm", 30),
        ("max_250x250_binned_roi", 250, 250, roi_for(250, 250), "auto",
         "tdm", 30),
        ("max_250x250_binned_full", 250, 250, None, "auto", "tdm", 10),
        # det_dyn / speed_map (the IROS-22 risk-dyn and speed-map methods;
        # M=1) on the same realistic maps — round-3 VERDICT item 1.
        ("forest_140x84_det", 140, 84, None, "auto", "det_dyn", 30),
        ("max_250x250_det_full", 250, 250, None, "auto", "det_dyn", 30),
        ("forest_140x84_speed", 140, 84, None, "auto", "speed_map", 30),
        ("max_250x250_speed_full", 250, 250, None, "auto", "speed_map", 30),
        ("max_250x250_speed_roi", 250, 250, roi_for(250, 250), "auto",
         "speed_map", 30),
        ("forest_140x84_xla", 140, 84, None, "xla", "tdm", 5),
        # >16-bin TDMs (the reference benchmark world quantizes to 22 bins)
        # route to the 8-bit value-pair cell plane — round-3 addition; the
        # pre-round-3 behavior on these shapes was the XLA fallback.
        ("forest_140x84_byte2_22bin", 140, 84, None, "auto", "tdm", 10),
        ("max_250x250_byte2_22bin_roi", 250, 250, roi_for(250, 250),
         "auto", "tdm", 10),
        # 22-bin UNCROPPED 250x250 at M=1024: no resident layout holds the
        # byte-pair plane at a usable tile, so auto streams it from HBM
        # (round 5) — the pre-round-5 behavior was the ~40x XLA fallback.
        ("max_250x250_byte2_22bin_full", 250, 250, None, "auto", "tdm", 5),
        # <=4-bin TDMs route to the 2-bit crumb cell plane (1024
        # cells/chunk — half the nibble walk): the headline uncropped
        # 250x250 regime at a practical few-support-point PMF.
        ("max_250x250_crumb_4bin_full", 250, 250, None, "auto", "tdm", 10),
        ("forest_140x84_crumb_4bin", 140, 84, None, "auto", "tdm", 30),
        # Compact-PMF routing check (round-4 VERDICT item 2): the planner's
        # support compaction hands det/speed/costmap solves 2-4 effective
        # bins, so "auto" routes them to the crumb kernel — these paired
        # rows measure that against the nibble kernel the round-3 det/speed
        # rows above actually ran, at the same effective bin count.  If
        # crumb loses, flip cfg.compact_pmf_support or the routing
        # threshold (solver.py::resolve_backend).
        ("forest_140x84_speed_2bin_crumb", 140, 84, None, "auto",
         "speed_map", 30),
        ("forest_140x84_speed_2bin_nibble", 140, 84, None, "pallas_binned",
         "speed_map", 30),
        ("max_250x250_speed_2bin_crumb", 250, 250, None, "auto",
         "speed_map", 30),
        ("max_250x250_speed_2bin_nibble", 250, 250, None, "pallas_binned",
         "speed_map", 30),
        ("max_250x250_det_4bin_crumb", 250, 250, None, "auto", "det_dyn", 30),
        ("max_250x250_det_4bin_nibble", 250, 250, None, "pallas_binned",
         "det_dyn", 30),
        # HBM-streaming cell plane (round-4 VERDICT item 6): the full
        # uncropped 250x250 walk DMA'd per exact-occupancy band window
        # instead of held VMEM-resident at m_tile=64 — keep only if it
        # beats the resident rows above.
        ("max_250x250_stream_full", 250, 250, None, "pallas_binned_stream",
         "tdm", 10),
        ("forest_140x84_stream", 140, 84, None, "pallas_binned_stream",
         "tdm", 30),
        ("max_250x250_stream_speed", 250, 250, None,
         "pallas_binned_stream", "speed_map", 30),
    ]
    pats = sys.argv[1:]
    if pats:
        scenarios = [s for s in scenarios
                     if any(p in s[0] for p in pats)]
    for label, H, W, roi, backend, mode, n in scenarios:
        bins = (22 if "22bin" in label else
                4 if "4bin" in label else
                2 if "2bin" in label else B)
        static, maps, task = build(H, W, roi, backend, mode, B=bins)
        be = resolve_backend(static)
        try:
            ms = measure(static, maps, task, n)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"scenario": label, "backend": be,
                              "error": str(e).splitlines()[0][:120]}))
            continue
        print(json.dumps({
            "scenario": label, "backend": be, "mode": mode,
            "roi": list(roi) if roi else None,
            "ms_per_solve": round(ms, 3),
            "budget_50ms": ms <= 50.0,
        }), flush=True)


if __name__ == "__main__":
    main()
