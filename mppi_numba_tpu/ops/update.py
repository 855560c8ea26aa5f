"""Softmax-weighted control update (information-theoretic MPPI, Alg. 2).

Replaces the reference's single-block 32-thread kernel with its strided
min/sum reductions and atomic adds (reference: mppi_numba/mppi.py:1113-1191)
by fused XLA reductions and one small matmul:

  beta  = min_k cost_k
  w_k   = exp(-(cost_k - beta) / lambda) / sum_j exp(-(cost_j - beta) / lambda)
  u'    = clip(u + sum_k w_k * eps_k)

The weighted noise sum is an ``(T*2, K) @ (K,)`` contraction — MXU work —
instead of K*T*2 atomic adds.
"""

from __future__ import annotations

import jax.numpy as jnp


def update_useq(costs, noise, u_cur, lambda_weight, vrange, wrange):
    """One MPPI control update.

    Args:
      costs: float32 ``(K,)`` rollout costs.
      noise: float32 ``(K, T, 2)`` control perturbations.
      u_cur: float32 ``(T, 2)`` current nominal control sequence.
      lambda_weight: scalar temperature.
      vrange, wrange: ``(2,)`` actuation bounds.

    Returns:
      (u_new ``(T, 2)``, weights ``(K,)``).
    """
    beta = jnp.min(costs)
    w = jnp.exp(-(costs - beta) / lambda_weight)
    w = w / jnp.sum(w)
    du = jnp.einsum("k,ktc->tc", w, noise,
                    preferred_element_type=jnp.float32)
    u_new = u_cur + du
    u_new = jnp.stack([
        jnp.clip(u_new[:, 0], vrange[0], vrange[1]),
        jnp.clip(u_new[:, 1], wrange[0], wrange[1]),
    ], axis=-1)
    return u_new, w
