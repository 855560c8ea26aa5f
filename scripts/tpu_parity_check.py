#!/usr/bin/env python3
"""On-device Pallas-vs-XLA rollout parity check.

The CPU test suite validates the Pallas kernel in interpret mode
(tests/test_pallas_kernel.py); this script runs the SAME comparisons on the
real TPU, catching Mosaic lowering bugs interpret mode cannot see.  Run it
after any kernel change:

    python scripts/tpu_parity_check.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu.ops.packing import (pack_bin_nibbles, pack_map_words,
                                        pack_mask_nibbles)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    build_bin_luts, build_task_vec, terrain_rollout_costs_pallas,
    terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.ops.rollout import (_clipped_controls_tk,
                                        terrain_rollout_costs)
from mppi_numba_tpu.types import TerrainTask


def build_problem(seed, K, M, T, H, W, cliffs=True):
    """``cliffs=False`` removes every discontinuity — obstacle/unknown
    penalties, the early goal break, AND per-cell traction variation (a
    piecewise-constant dynamics field chaotically amplifies any trajectory
    perturbation) — so an APPROXIMATE trig variant can be compared on a
    smooth cost surface.  With cliffs, even a 1e-6/step perturbation flips
    discrete outcomes on a few of the 10^5+ rollouts."""
    rng = np.random.RandomState(seed)
    if cliffs:
        lin = rng.randint(0, 101, (M, H, W)).astype(np.int8)
        ang = rng.randint(0, 101, (M, H, W)).astype(np.int8)
    else:
        lin = np.full((M, H, W), 80, np.int8)
        ang = np.full((M, H, W), 90, np.int8)
    density = 0.08 if cliffs else 0.0
    obs = (rng.rand(H, W) < density).astype(np.int8)
    unk = (rng.rand(H, W) < density).astype(np.int8)
    risk = rng.randint(1, 101, (H, W)).astype(np.int8)
    f32 = np.float32
    task = TerrainTask(
        x0=jnp.asarray(np.array([2.0, 2.0, 0.4], f32)),
        xgoal=jnp.asarray(np.array([W * 0.7, H * 0.7], f32)),
        goal_tolerance=f32(0.6 if cliffs else 0.0),
        v_post_rollout=f32(0.02),
        lambda_weight=f32(1.0),
        u_std=jnp.asarray(np.array([1.5, 2.0], f32)),
        vrange=jnp.asarray(np.array([0.0, 2.5], f32)),
        wrange=jnp.asarray(np.array([-3.0, 3.0], f32)),
        dt=f32(0.1), dist_weight=f32(1.0), obs_penalty=f32(1e4),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(1.0),
        xlim0=f32(-1.0), ylim0=f32(-1.0), lin_lb=f32(0.0),
        lin_ratio=f32(0.01), ang_lb=f32(0.0), ang_ratio=f32(0.01))
    u_cur = jnp.asarray(rng.uniform(-0.5, 1.5, (T, 2)).astype(f32))
    noise = jnp.asarray(rng.normal(0, 1.0, (K, T, 2)).astype(f32))
    return task, lin, ang, obs, unk, risk, u_cur, noise


# fast_trig cases run cliff-free (no obstacles, no early goal break): a
# trajectory perturbed by ~1e-6/step (the approximation's whole point, like
# the reference's CUDA fastmath) can flip a binary penalty cell or cross the
# goal a step earlier, which says nothing about kernel parity.
CASES = [
    # (name, K, M, T, H, W, speed_map, fast_trig)
    ("flagship-ish", 1024, 256, 50, 11, 11, False, True),
    ("flagship-obs", 1024, 256, 50, 11, 11, False, False),
    ("multichunk", 256, 64, 40, 13, 15, False, False),
    ("speed-map", 512, 1, 60, 11, 11, True, False),
    ("large-map", 256, 32, 30, 52, 52, False, True),
]

BINNED_CASES = [
    # (name, K, M, T, H, W, B, speed_map, fast_trig, cell_bits) — the
    # bin-packed kernel on the realistic shapes it was built for (forest
    # TDM / ROI windows).
    ("bin-small", 256, 64, 40, 13, 15, 12, False, False, 4),
    ("bin-forest", 512, 256, 50, 140, 84, 12, False, False, 4),
    ("bin-roi", 1024, 256, 50, 85, 85, 12, False, False, 4),
    ("bin-smooth-ft", 512, 64, 50, 85, 85, 1, False, True, 4),
    # Speed-map mode (M=1, shared risk-byte walk) incl. the banded regime.
    ("bin-speed-sm", 512, 1, 40, 13, 15, 12, True, False, 4),
    ("bin-speed-forest", 1024, 1, 50, 140, 84, 12, True, False, 4),
    ("bin-speed-250", 1024, 1, 60, 250, 250, 12, True, False, 4),
    # 8-bit value-pair cell plane (>16-bin TDMs, e.g. the reference
    # benchmark world's 22 bins): single-chunk, banded, and speed-map
    # (different cell/risk chunk counts) regimes.
    ("byte2-small", 256, 64, 40, 13, 15, 22, False, False, 8),
    ("byte2-forest", 512, 256, 50, 140, 84, 22, False, False, 8),
    ("byte2-speed-forest", 1024, 1, 50, 140, 84, 22, True, False, 8),
    # 2-bit crumb cell plane (<=4-bin TDMs): unrolled, banded (250x250 =
    # 62 chunks), and speed-map (risk plane walks 2x the cell chunks).
    ("crumb-small", 256, 64, 40, 13, 15, 4, False, False, 2),
    ("crumb-250", 512, 256, 50, 250, 250, 4, False, False, 2),
    ("crumb-speed-250", 1024, 1, 60, 250, 250, 4, True, False, 2),
]

STREAM_CASES = [
    # HBM-streaming cell plane (stream=True): Mosaic lowering of the
    # per-step dynamic-slice DMA is the on-device risk to pin.
    # (name, K, M, T, H, W, B, speed_map, cell_bits)
    ("stream-forest", 512, 256, 50, 140, 84, 12, False, 4),
    ("stream-crumb-250", 512, 256, 50, 250, 250, 4, False, 2),
    ("stream-speed-250", 1024, 1, 60, 250, 250, 12, True, 4),
]


def run_binned_case(name, K, M, T, H, W, B, speed_map, fast_trig,
                    t_unroll=1, cell_bits=4, stream=False,
                    band_anchor=1):
    from mppi_numba_tpu.ops.packing import pack_byte_pairs, pack_risk_bytes

    task, _, _, obs, unk, risk, u_cur, noise = build_problem(
        11, K, M, T, H, W, cliffs=not fast_trig)
    rng = np.random.RandomState(42)
    qbins = np.sort(rng.choice(101, size=B, replace=False)).astype(np.int8) \
        if B > 1 else np.array([80], np.int8)
    lin_bins = rng.randint(0, B, (M, H, W))
    ang_bins = rng.randint(0, B, (M, H, W))
    packed = pack_map_words(jnp.asarray(qbins[lin_bins]),
                            jnp.asarray(qbins[ang_bins]),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if speed_map else None)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=speed_map))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                        task.wrange)
    if cell_bits == 8:
        cell_plane = pack_byte_pairs(jnp.asarray(qbins[lin_bins]),
                                     jnp.asarray(qbins[ang_bins]))
        lut = None
    else:
        from mppi_numba_tpu.ops.packing import pack_bin_crumbs
        pack_cells = pack_bin_nibbles if cell_bits == 4 else pack_bin_crumbs
        cell_plane = pack_cells(jnp.asarray(lin_bins), jnp.asarray(ang_bins))
        lut = build_bin_luts(task, jnp.asarray(qbins), jnp.asarray(qbins))
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        cell_plane,
        pack_mask_nibbles(jnp.asarray(obs), jnp.asarray(unk)),
        lut, build_task_vec(task), v_all, w_all,
        pack_risk_bytes(jnp.asarray(risk)) if speed_map else None,
        H=H, W=W, T=T, fast_trig=fast_trig, cell_bits=cell_bits,
        t_unroll=t_unroll, stream=stream, band_anchor=band_anchor))
    return ref, got


# Knife-edge allowance for cliff worlds: Mosaic and XLA transcendentals
# differ by ulps, and on a piecewise-constant map with binary penalties a
# 1-ulp heading difference can move a single rollout across one cell
# boundary (round-4 investigation, scripts/debug_byte2.py: 2 of 131k
# rollouts off by exactly +-one unknown_penalty step, direction-symmetric,
# stable across m_tile/banded/t_unroll; an actual addressing bug produces
# thousands of bad entries).  Accept at most KNIFE_EDGE_MAX outliers and
# at most KNIFE_EDGE_FRAC of all entries, every other entry within tol.
KNIFE_EDGE_MAX = 3
KNIFE_EDGE_FRAC = 5e-5


def judge(rel, tol):
    """(passed, label) under the knife-edge allowance."""
    n_out = int((rel > tol).sum())
    if n_out == 0:
        return True, "OK "
    if n_out <= KNIFE_EDGE_MAX and n_out <= KNIFE_EDGE_FRAC * rel.size:
        return True, f"OK~({n_out} knife-edge)"
    return False, "FAIL"


def main():
    from _bench_common import require_live_tpu
    require_live_tpu()
    assert jax.default_backend() == "tpu", jax.default_backend()
    worst = 0.0
    # Collect failures and keep going: one broken layout must not hide the
    # verdict on the others (round-4 lesson — the byte2-forest failure
    # aborted the run before the crumb/stream cases ever executed).
    failures = []
    for name, K, M, T, H, W, speed_map, fast_trig in CASES:
        task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
            7, K, M, T, H, W, cliffs=not fast_trig)
        packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                                jnp.asarray(obs), jnp.asarray(unk),
                                jnp.asarray(risk) if speed_map else None)
        ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                               speed_map=speed_map))
        v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                            task.wrange)
        got = np.asarray(terrain_rollout_costs_pallas(
            packed, build_task_vec(task), v_all, w_all, H=H, W=W, T=T,
            speed_map=speed_map, fast_trig=fast_trig))
        scale = np.maximum(np.abs(ref), 1.0)
        rel = float((np.abs(got - ref) / scale).max())
        worst = max(worst, rel)
        # fast_trig is an approximation by design; exact mode must be tight.
        tol = 5e-3 if fast_trig else 1e-4
        relmap = np.abs(got - ref) / scale
        passed, status = judge(relmap, tol)
        print(f"{status} {name:12s} K={K:5d} M={M:4d} T={T:3d} map={H}x{W} "
              f"speed_map={int(speed_map)} fast_trig={int(fast_trig)} "
              f"max rel err {rel:.2e} (tol {tol:.0e})")
        if not passed:
            failures.append(name)
    for name, K, M, T, H, W, B, speed_map, fast_trig, cell_bits \
            in BINNED_CASES:
        ref, got = run_binned_case(name, K, M, T, H, W, B, speed_map,
                                   fast_trig, cell_bits=cell_bits)
        scale = np.maximum(np.abs(ref), 1.0)
        rel = float((np.abs(got - ref) / scale).max())
        worst = max(worst, rel)
        tol = 5e-3 if fast_trig else 1e-4
        relmap = np.abs(got - ref) / scale
        passed, status = judge(relmap, tol)
        print(f"{status} {name:16s} K={K:5d} M={M:4d} T={T:3d} map={H}x{W} "
              f"bins={B} speed_map={int(speed_map)} "
              f"fast_trig={int(fast_trig)} cell_bits={cell_bits} "
              f"max rel err {rel:.2e} (tol {tol:.0e})")
        if not passed:
            failures.append(name)
    for name, K, M, T, H, W, B, speed_map, cell_bits in STREAM_CASES:
        ref, got = run_binned_case(name, K, M, T, H, W, B, speed_map,
                                   False, cell_bits=cell_bits, stream=True)
        scale = np.maximum(np.abs(ref), 1.0)
        rel = float((np.abs(got - ref) / scale).max())
        worst = max(worst, rel)
        relmap = np.abs(got - ref) / scale
        passed, status = judge(relmap, 1e-4)
        print(f"{status} {name:16s} K={K:5d} M={M:4d} T={T:3d} map={H}x{W} "
              f"bins={B} speed_map={int(speed_map)} cell_bits={cell_bits} "
              f"stream=1 max rel err {rel:.2e} (tol 1e-04)")
        if not passed:
            failures.append(name)
    # Horizon-loop unrolling must be semantics-identical on hardware for
    # every T % t_unroll (static remainder tail); exercised on the banded
    # 140x84 regime and a byte-kernel case.
    for tu in (2, 4, 7):
        ref, got = run_binned_case("bin-forest", 512, 256, 50, 140, 84, 12,
                                   False, False, t_unroll=tu)
        relmap = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
        rel = float(relmap.max())
        worst = max(worst, rel)
        passed, status = judge(relmap, 1e-4)
        print(f"{status} bin-forest t_unroll={tu} max rel err {rel:.2e} "
              f"(tol 1e-04)")
        if not passed:
            failures.append(f"bin-forest t_unroll={tu}")
    # Group-banded walk (band_anchor > 1, round 5): the margin-widened
    # anchor band must cover every visited cell ON HARDWARE — a Mosaic
    # scalar-arithmetic divergence from the interpret-mode tests would
    # show up as cells decoding to zero traction.  Production config is
    # anchor = t_unroll = 4; T=50 % 4 exercises the per-step-band tail.
    # (The stream path ignores band_anchor by design — no stream case
    # here; the STREAM_CASES above already pin that path on hardware.)
    for name, M, HH, WW, bits in (
            ("bin-forest", 256, 140, 84, 4),
            ("crumb-250", 256, 250, 250, 2),
            ("bin-speed-250", 1, 250, 250, 4)):
        ref, got = run_binned_case(name, 512, M, 50, HH, WW,
                                   12 if bits == 4 else 4,
                                   name.startswith("bin-speed"), False,
                                   t_unroll=4, cell_bits=bits,
                                   band_anchor=4)
        relmap = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
        rel = float(relmap.max())
        worst = max(worst, rel)
        passed, status = judge(relmap, 1e-4)
        print(f"{status} {name} band_anchor=4 max rel err {rel:.2e} "
              f"(tol 1e-04)")
        if not passed:
            failures.append(f"{name} band_anchor=4")
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
        7, 1024, 256, 50, 11, 11, cliffs=True)
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk), None)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                        task.wrange)
    for tu in (2, 5):
        got = np.asarray(terrain_rollout_costs_pallas(
            packed, build_task_vec(task), v_all, w_all, H=11, W=11, T=50,
            t_unroll=tu))
        relmap = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
        rel = float(relmap.max())
        worst = max(worst, rel)
        passed, status = judge(relmap, 1e-4)
        print(f"{status} byte t_unroll={tu} max rel err {rel:.2e} "
              f"(tol 1e-04)")
        if not passed:
            failures.append(f"byte t_unroll={tu}")
    if failures:
        print(f"{len(failures)} FAILURES: {', '.join(failures)}; "
              f"worst rel err {worst:.2e}")
        raise SystemExit(1)
    print(f"all cases pass; worst rel err {worst:.2e}")


if __name__ == "__main__":
    main()
