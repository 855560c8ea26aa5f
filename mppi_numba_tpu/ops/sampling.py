"""Counter-based random sampling ops: control noise and traction-map draws.

The reference maintains mutable per-thread xoroshiro128+ streams on device
(reference: mppi_numba/mppi.py:1354-1370, mppi_numba/terrain.py:633-695).
On TPU we use JAX's counter-based threefry keys instead: one key per solve,
split per consumer.  Streams need not be bit-identical to xoroshiro — the
reference's own outputs are stochastic; parity is statistical and, for the
deterministic pipeline, established by injecting matched noise (SURVEY §6).

Design notes (TPU-first):

* Noise is one fused ``normal(key, (K, T, 2)) * u_std`` instead of K*T
  per-thread draws.
* Traction-map sampling replaces the reference's per-cell CDF walk
  (reference: mppi_numba/terrain.py:679-694) with a vectorized rank
  computation against the int32 cumulative PMF — a pure VPU elementwise
  reduction over the (small) bin axis, no gather and no control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_noise(key, u_std, num_rollouts, num_steps, dtype=jnp.float32):
    """Draw the (K, T, 2) Gaussian control perturbations for one iteration."""
    eps = jax.random.normal(key, (num_rollouts, num_steps, 2), dtype=dtype)
    return eps * u_std.astype(dtype)


def quantize_bin_values(bin_values, bin_values_bounds):
    """Quantize bin traction values to the int8 0..100 map encoding.

    Matches the reference's in-kernel cast
    ``int8(100 * (bin_values[bi] - lb) / range)`` — float32 arithmetic,
    truncation toward zero (reference: mppi_numba/terrain.py:689).
    Computed once per map update on host.
    """
    bin_values = np.asarray(bin_values, dtype=np.float32)
    lb, ub = np.float32(bin_values_bounds[0]), np.float32(bin_values_bounds[1])
    rng = ub - lb
    return (np.float32(100.0) * (bin_values - lb) / rng).astype(np.int8)


def sample_traction_grids(key, pmf_grid, qbin_values, alpha_dyn, num_samples):
    """Sample ``num_samples`` int8 traction grids from an int8 PMF grid.

    Per cell: draw ``u ~ U[0,1)``, form ``sampled_cum = ceil(u*100*alpha_dyn)``
    and select the first bin whose cumulative int8 mass reaches it —
    ``alpha_dyn < 1`` restricts draws to the worst-``alpha`` quantile
    (reference: mppi_numba/terrain.py:683-689).  For a nondecreasing
    cumulative mass the selected bin index equals the number of bins whose
    cumulative mass is strictly below ``sampled_cum``, so the CDF walk
    becomes one compare-and-sum over the bin axis.

    Args:
      key: PRNG key (the reference seeds lin/ang TDMs identically, making
        their draws comonotone — callers preserve that by passing the same
        key for both, see ``solver.py``).
      pmf_grid: int8 ``(B, H, W)`` PMF whose bins sum to 100.
      qbin_values: int8 ``(B,)`` quantized bin traction values (0..100).
      alpha_dyn: float scalar in (0, 1].
      num_samples: static M.

    Returns:
      int8 ``(M, H, W)`` sampled traction grids (values 0..100).
    """
    B, H, W = pmf_grid.shape
    # Flatten the map into the lane (minor) axis: trailing (H, W) dims like
    # (11, 11) waste ~90% of every (8, 128) vector register on TPU; (.., HW)
    # tiles densely.  Same math, same outputs.
    flat = pmf_grid.reshape(B, H * W)
    cum = jnp.cumsum(flat.astype(jnp.int32), axis=0)                 # (B,HW)
    u = jax.random.uniform(key, (num_samples, H * W), dtype=jnp.float32)
    sampled = jnp.ceil(u * (100.0 * alpha_dyn)).astype(jnp.int32)    # (M,HW)
    bin_idx = jnp.sum(cum[None] < sampled[:, None], axis=1)          # (M,HW)
    return jnp.take(qbin_values, bin_idx, axis=0).reshape(
        num_samples, H, W)
