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

import jax
import jax.numpy as jnp

from ..models import clip_controls


def update_useq(costs, noise, u_cur, lambda_weight, vrange, wrange,
                axis_name=None):
    """One MPPI control update.

    Args:
      costs: float32 ``(K,)`` rollout costs (``K_local`` under sharding).
      noise: float32 ``(K, T, 2)`` control perturbations.
      u_cur: float32 ``(T, 2)`` current nominal control sequence.
      lambda_weight: scalar temperature.
      vrange, wrange: ``(2,)`` actuation bounds.
      axis_name: when the K axis is sharded over a mesh axis (shard_map),
        its name — the three reductions (``beta`` min, normalizer sum,
        weighted-noise sum) then run as ``pmin``/``psum`` collectives, the
        ONLY cross-chip traffic of a distributed solve (SURVEY §5.8).

    Returns:
      (u_new ``(T, 2)``, weights ``(K,)`` — shard-local under sharding).
    """
    beta = jnp.min(costs)
    if axis_name is not None:
        beta = jax.lax.pmin(beta, axis_name)
    w = jnp.exp(-(costs - beta) / lambda_weight)
    eta = jnp.sum(w)
    if axis_name is not None:
        eta = jax.lax.psum(eta, axis_name)
    w = w / eta
    du = jnp.einsum("k,ktc->tc", w, noise,
                    preferred_element_type=jnp.float32)
    if axis_name is not None:
        du = jax.lax.psum(du, axis_name)
    u_new = u_cur + du
    v, om = clip_controls(u_new, vrange, wrange)
    return jnp.stack([v, om], axis=-1), w
