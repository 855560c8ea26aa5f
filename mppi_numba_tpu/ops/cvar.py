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
