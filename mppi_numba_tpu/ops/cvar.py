"""CVaR-over-map-samples reduction.

The reference computes CVaR per control sequence with an O(M^2) odd-even
transposition sort in block shared memory followed by a tree sum of the
worst ``ceil(M * alpha)`` entries (reference: mppi_numba/mppi.py:719-755).
The semantics are simply "mean of the worst alpha-fraction of the M costs",
which on TPU is one fused ``lax.top_k`` + mean — O(M log M) work and no
synchronization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cvar_from_costs(costs_km, cvar_numel):
    """Reduce per-(rollout, map-sample) costs to per-rollout CVaR.

    Args:
      costs_km: float32 ``(K, M)``.
      cvar_numel: static ``ceil(M * cvar_alpha)``; ``M`` yields the plain mean
        (the reference's alpha == 1 path skips the sort entirely,
        reference: mppi_numba/mppi.py:719,744).

    Returns:
      float32 ``(K,)`` — mean of the ``cvar_numel`` largest costs per row.
    """
    M = costs_km.shape[-1]
    if cvar_numel >= M:
        return jnp.mean(costs_km, axis=-1)
    worst, _ = jax.lax.top_k(costs_km, cvar_numel)
    return jnp.mean(worst, axis=-1)


def cvar_from_costs_distributed(costs_km, cvar_numel, m_total, axis_name):
    """CVaR when the M map-sample axis is SHARDED over ``axis_name``.

    Two-phase distributed top-k (SURVEY §7 "CVaR across shards"): each shard
    keeps its ``min(cvar_numel, M_local)`` worst costs, shards all-gather
    only those candidates, and the global worst ``cvar_numel`` are selected
    from the candidate pool — correct because at most ``cvar_numel``
    members of the global worst set can live on any one shard.  The
    ``alpha == 1`` path needs no candidates at all: a ``psum`` of local
    sums (reference semantics: mean over all M,
    reference: mppi_numba/mppi.py:744-755).

    Args:
      costs_km: float32 ``(K_local, M_local)`` — this shard's slice.
      cvar_numel: static global ``ceil(M_total * alpha)``.
      m_total: static global M.
      axis_name: mesh axis the M dimension is sharded over.

    Returns:
      float32 ``(K_local,)`` — identical (up to psum float order) to the
      single-device reduction over the full ``(K_local, M_total)``.
    """
    m_local = costs_km.shape[-1]
    if cvar_numel >= m_total:
        return jax.lax.psum(jnp.sum(costs_km, axis=-1), axis_name) / m_total
    keep = min(cvar_numel, m_local)
    local_top, _ = jax.lax.top_k(costs_km, keep)
    cand = jax.lax.all_gather(local_top, axis_name, axis=-1, tiled=True)
    worst, _ = jax.lax.top_k(cand, cvar_numel)
    return jnp.mean(worst, axis=-1)


def cvar_from_costs_dynamic_distributed(costs_km, cvar_alpha, axis_name):
    """Traced-alpha CVaR over a sharded M axis.

    The dynamic threshold prevents a static candidate count, so shards
    exchange their full cost slices (M floats per k — still small) and
    reduce with the single-device dynamic path.
    """
    cand = jax.lax.all_gather(costs_km, axis_name, axis=-1, tiled=True)
    return cvar_from_costs_dynamic(cand, cvar_alpha)


def cvar_from_costs_dynamic(costs_km, cvar_alpha):
    """CVaR with a TRACED alpha: sort descending + masked mean.

    One compiled executable then serves every alpha in a sweep (the
    benchmark sweeps 5 alphas; reference recompiles nothing because it is
    interpreted, we avoid 5 XLA compiles).  Slightly more work than top_k
    (full sort), identical semantics: mean of the worst ceil(M * alpha).
    """
    M = costs_km.shape[-1]
    srt = -jnp.sort(-costs_km, axis=-1)                  # descending
    numel = jnp.ceil(M * cvar_alpha).astype(jnp.int32)
    mask = (jnp.arange(M) < numel).astype(costs_km.dtype)
    return (srt * mask).sum(-1) / numel.astype(costs_km.dtype)
