#!/usr/bin/env python3
"""Bisect the byte2-forest on-device parity outliers (round 4).

Observed: the 8-bit value-pair layout failed Pallas-vs-XLA parity on real
TPU (max rel err 8.5e-3) at 140x84/22 bins while the SAME config passes in
interpret mode.  This script localizes the error along every axis
(m_tile, banded, per-(m,k) error map).

CONCLUSION (round 4, v5e): exactly 2 of 131k rollouts differ, by exactly
+-one unknown_penalty step each (one up, one down), identical across
m_tile 64/128, banded on/off, and t_unroll 1/2; byte2 and nibble are
bit-identical to each other on a shared 12-bin world, and byte2 matches
the oracle to 5e-7 on a cliff-free surface.  So the layout/walk/decode are
correct — the outliers are knife-edge cell-boundary flips from
Mosaic-vs-XLA transcendental ulps (the same class as the reference's CUDA
fastmath), accepted by the parity gate's knife-edge allowance
(scripts/tpu_parity_check.py::judge).

Run on the real TPU, no other TPU process:
    python scripts/debug_byte2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import (pack_bin_nibbles, pack_byte_pairs,
                                        pack_map_words, pack_mask_nibbles)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    build_bin_luts, build_task_vec, terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.ops.rollout import (_clipped_controls_tk,
                                        terrain_rollout_costs)
from tpu_parity_check import build_problem

K, M, T, H, W, B = 512, 256, 50, 140, 84, 22


def build(cell_bits):
    task, _, _, obs, unk, risk, u_cur, noise = build_problem(
        11, K, M, T, H, W, cliffs=True)
    rng = np.random.RandomState(42)
    # The nibble plane holds 4-bit bin INDICES — cap the bin count or the
    # pack silently truncates indices >= 16 (round-4 lesson: the original
    # sweep packed 22-bin indices into nibbles and read garbage).
    nbins = B if cell_bits == 8 else 12
    qbins = np.sort(rng.choice(101, size=nbins,
                               replace=False)).astype(np.int8)
    lin_bins = rng.randint(0, nbins, (M, H, W))
    ang_bins = rng.randint(0, nbins, (M, H, W))
    packed = pack_map_words(jnp.asarray(qbins[lin_bins]),
                            jnp.asarray(qbins[ang_bins]),
                            jnp.asarray(obs), jnp.asarray(unk), None)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                        task.wrange)
    if cell_bits == 8:
        cell_plane = pack_byte_pairs(jnp.asarray(qbins[lin_bins]),
                                     jnp.asarray(qbins[ang_bins]))
        lut = None
    else:
        cell_plane = pack_bin_nibbles(jnp.asarray(lin_bins),
                                      jnp.asarray(ang_bins))
        lut = build_bin_luts(task, jnp.asarray(qbins), jnp.asarray(qbins))
    masks = pack_mask_nibbles(jnp.asarray(obs), jnp.asarray(unk))
    tv = build_task_vec(task)
    return ref, cell_plane, masks, lut, tv, v_all, w_all


def check(label, ref, got):
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)  # (K, M)
    bad = rel > 1e-4
    worst = float(rel.max())
    if not bad.any():
        print(f"OK   {label}: max rel err {worst:.2e}")
        return
    bk, bm = np.nonzero(bad)
    print(f"FAIL {label}: max rel err {worst:.2e}; {bad.sum()} bad entries; "
          f"k in [{bk.min()},{bk.max()}] (k-prog {bk.min()//128}-"
          f"{bk.max()//128}), m in [{bm.min()},{bm.max()}] "
          f"(m rows per 64: {sorted(set(bm // 64))})")


def main():
    from _bench_common import require_live_tpu
    require_live_tpu()
    assert jax.default_backend() == "tpu", jax.default_backend()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ref8, cells8, masks, lut8, tv, v_all, w_all = build(8)
    for m_tile, banded in ((128, True), (64, True), (128, False)):
        got = np.asarray(terrain_rollout_costs_pallas_binned(
            cells8, masks, lut8, tv, v_all, w_all, H=H, W=W, T=T,
            cell_bits=8, m_tile=m_tile, banded=banded))
        check(f"byte2 m_tile={m_tile} banded={int(banded)}", ref8, got)

    ref4, cells4, masks4, lut4, tv4, v4, w4 = build(4)
    for m_tile in (256, 128):
        got = np.asarray(terrain_rollout_costs_pallas_binned(
            cells4, masks4, lut4, tv4, v4, w4, H=H, W=W, T=T,
            cell_bits=4, m_tile=m_tile, banded=True))
        check(f"nibble m_tile={m_tile} banded=1", ref4, got)


if __name__ == "__main__":
    main()
