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


def pack_bin_nibbles(lin_bins, ang_bins):
    """Pack PMF bin indices 4 cells per int32 word for the binned kernel.

    Each cell contributes one byte ``lin_bin | ang_bin << 4`` (requires
    <= 16 PMF bins); four consecutive cells share a word, so one 128-word
    vector register covers 512 cells — a 4x shorter chunk walk per rollout
    step than the byte-packed layout (see ops/pallas/rollout_kernel.py).

    Args:
      lin_bins / ang_bins: int32 ``(M, H, W)`` bin indices (0..15).

    Returns:
      int32 ``(M, ceil(H*W/4))``.
    """
    M = lin_bins.shape[0]
    byte = (lin_bins.astype(jnp.int32)
            | (ang_bins.astype(jnp.int32) << 4)).reshape(M, -1)
    pad = (-byte.shape[1]) % 4
    byte = jnp.pad(byte, ((0, 0), (0, pad)))
    b = byte.reshape(M, -1, 4)
    return (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
            | (b[..., 3] << 24))


def pack_bin_crumbs(lin_bins, ang_bins):
    """Pack PMF bin indices 8 cells per int32 word for the binned kernel.

    The 2-bit sibling of ``pack_bin_nibbles`` for TDMs with at most 4 PMF
    bins (e.g. det-dynamics condensations of few-terrain worlds, or binary
    traversable/blocked PMFs — reference: terrain.py:419-448 collapses to
    one-hot, and many deployed PMF grids carry 2-4 support points): each
    cell contributes a 4-bit code ``lin_bin | ang_bin << 2``, eight
    consecutive cells share a word, so one 128-word vector register covers
    1024 cells — a 2x shorter chunk walk per rollout step than the nibble
    layout (and 8x shorter than the byte-packed layout).

    Args:
      lin_bins / ang_bins: int32 ``(M, H, W)`` bin indices (0..3).

    Returns:
      int32 ``(M, ceil(H*W/8))``.
    """
    M = lin_bins.shape[0]
    code = (lin_bins.astype(jnp.int32)
            | (ang_bins.astype(jnp.int32) << 2)).reshape(M, -1)
    pad = (-code.shape[1]) % 8
    code = jnp.pad(code, ((0, 0), (0, pad)))
    c = code.reshape(M, -1, 8)
    word = c[..., 0]
    for q in range(1, 8):
        word = word | (c[..., q] << (4 * q))
    return word


def pack_byte_pairs(lin_grids, ang_grids):
    """Pack decoded int8 traction VALUES 2 cells per int32 word.

    The 8-bit sibling of ``pack_bin_nibbles`` for TDMs with MORE than 16
    PMF bins (e.g. the reference benchmark world's 22 bins — reference:
    benchmark.ipynb[cell 2], terrain.py:380-508 quantizes any PMF support
    to int8 values 0..100): bin indices no longer fit a nibble, so the
    cell plane carries the decoded value byte pair ``lin | ang << 8``
    directly and the kernel decodes ``lb + ratio * value`` inline — the
    identical arithmetic to the XLA core / the nibble LUT, with no bin
    count limit at all.  Two cells share a word, so a 128-word vector
    register covers 256 cells — half the nibble layout's span (twice the
    walk), still 2x shorter than the one-cell-per-word byte layout.

    Args:
      lin_grids / ang_grids: int8 ``(M, H, W)`` decoded traction (0..100).

    Returns:
      int32 ``(M, ceil(H*W/2))``.
    """
    M = lin_grids.shape[0]
    half = (lin_grids.astype(jnp.int32)
            | (ang_grids.astype(jnp.int32) << 8)).reshape(M, -1)
    pad = (-half.shape[1]) % 2
    half = jnp.pad(half, ((0, 0), (0, pad)))
    h = half.reshape(M, -1, 2)
    return h[..., 0] | (h[..., 1] << 16)


def pack_mask_nibbles(obstacle_map, unknown_map):
    """Pack the shared obstacle/unknown masks 16 cells per int32 word.

    Per cell a 2-bit code ``obstacle | unknown << 1``; one 128-word vector
    register covers 2048 cells, so the per-step mask walk is ~1 chunk for
    realistic maps.

    Args:
      obstacle_map / unknown_map: int8 ``(H, W)`` indicators.

    Returns:
      int32 ``(ceil(H*W/16),)``.
    """
    code = (obstacle_map.astype(jnp.int32)
            | (unknown_map.astype(jnp.int32) << 1)).reshape(-1)
    pad = (-code.shape[0]) % 16
    code = jnp.pad(code, (0, pad)).reshape(-1, 16)
    word = code[:, 0]
    for q in range(1, 16):
        word = word | (code[:, q] << (2 * q))
    return word


def pack_risk_bytes(risk_map):
    """Pack the shared CVaR risk/speed byte map 4 cells per int32 word.

    Speed-map mode's fifth per-step map read (reference:
    mppi_numba/mppi.py:1095-1096) for the bin-packed kernel: the risk byte
    (0..100) is per-CELL but shared across the M map samples, so it packs
    like the nibble plane (4 cells/word, 512 cells per 128-word chunk) but
    occupies a single broadcast sublane — the risk walk reuses the nibble
    walk's banding with ~zero extra VMEM.

    Args:
      risk_map: int8 ``(H, W)`` CVaR speed map (0..100).

    Returns:
      int32 ``(ceil(H*W/4),)``.
    """
    b = risk_map.astype(jnp.int32).reshape(-1)
    pad = (-b.shape[0]) % 4
    b = jnp.pad(b, (0, pad)).reshape(-1, 4)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def unpack_lin(words):
    return words & 0xFF


def unpack_ang(words):
    return (words >> ANG_SHIFT) & 0xFF


def unpack_cell_penalty_mask(words):
    """Returns (obstacle, unknown) 0/1 int32 indicators."""
    return (words >> OBS_SHIFT) & 1, (words >> UNK_SHIFT) & 1


def unpack_risk(words):
    return (words >> RISK_SHIFT) & 0xFF
