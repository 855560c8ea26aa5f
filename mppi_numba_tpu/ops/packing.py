"""Bit-packed per-cell map words: one gather per rollout step.

The reference performs four independent int8 map reads per rollout step —
linear traction, angular traction, obstacle mask, unknown mask (plus a fifth
risk-speed read in speed-map mode; reference: mppi_numba/mppi.py:682-701,
1095).  Random-access loads are the scarcest resource in the TPU rollout
loop, so we pack everything a step needs into ONE int32 word per
``(map_sample, cell)``:

    bits  0-7   linear traction     (0..100)
    bits  8-15  angular traction    (0..100)
    bit   16    obstacle indicator
    bit   17    unknown indicator
    bits 18-25  risk traction/speed (0..100, speed-map mode; else 0)

Packing runs once per solve as a fused elementwise op over ``(M, H, W)``;
the rollout then issues a single gather per (k, m, t) instead of 4-5.
"""

from __future__ import annotations

import jax.numpy as jnp

LIN_SHIFT = 0
ANG_SHIFT = 8
OBS_SHIFT = 16
UNK_SHIFT = 17
RISK_SHIFT = 18


def pack_map_words(lin_grids, ang_grids, obstacle_map, unknown_map,
                   risk_map=None):
    """Pack sampled traction grids + static masks into int32 words.

    Args:
      lin_grids / ang_grids: int8 ``(M, H, W)`` sampled traction (0..100).
      obstacle_map / unknown_map: int8 ``(H, W)`` indicator masks.
      risk_map: optional int8 ``(H, W)`` CVaR speed map (0..100).

    Returns:
      int32 ``(M, H, W)``.
    """
    w = lin_grids.astype(jnp.int32) | (ang_grids.astype(jnp.int32) << ANG_SHIFT)
    masks = (obstacle_map.astype(jnp.int32) << OBS_SHIFT) | \
            (unknown_map.astype(jnp.int32) << UNK_SHIFT)
    if risk_map is not None:
        masks = masks | (risk_map.astype(jnp.int32) << RISK_SHIFT)
    return w | masks[None]


def unpack_lin(words):
    return words & 0xFF


def unpack_ang(words):
    return (words >> ANG_SHIFT) & 0xFF


def unpack_cell_penalty_mask(words):
    """Returns (obstacle, unknown) 0/1 int32 indicators."""
    return (words >> OBS_SHIFT) & 1, (words >> UNK_SHIFT) & 1


def unpack_risk(words):
    return (words >> RISK_SHIFT) & 0xFF
