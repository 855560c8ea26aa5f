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


def uniform_window(key, num_samples, full_hw, oy, ox, window_hw):
    """A window of ``jax.random.uniform(key, (M, H*W))``, bit-identical.

    The solver's ROI crop samples only the reachable map window, but the
    draw for cell (y, x) must not depend on where the window sits — else
    cropping would change the realized maps and the solve output.  JAX's
    partitionable threefry generates bit ``i`` of a draw purely from the
    flat element index (jax/_src/prng.py ``_threefry_random_bits_
    partitionable``), so we rebuild exactly those bits at the window's
    GLOBAL flat indices: ``idx = m*H*W + y*W + x``.  Result: cropped and
    full-map sampling realize identical per-cell uniforms, making the ROI a
    pure optimization (tests/test_roi.py asserts solve-output equality).

    Args:
      key: threefry PRNG key (raw uint32 (2,) or new-style typed key).
      num_samples: static M.
      full_hw: static full padded (H, W) the equivalent full draw covers.
      oy / ox: dynamic int32 window start row/col.
      window_hw: static (rH, rW).

    Returns:
      float32 ``(M, rH*rW)`` uniforms in [0, 1).
    """
    from jax._src.prng import threefry2x32_p

    H, W = full_hw
    rH, rW = window_hw
    total = num_samples * H * W
    if total >= 2 ** 32:
        raise NotImplementedError(
            "uniform_window supports M*H*W < 2**32 (got {})".format(total))
    u32 = jnp.uint32
    m = jnp.arange(num_samples, dtype=u32)[:, None, None]
    dy = jnp.arange(rH, dtype=u32)[None, :, None]
    dx = jnp.arange(rW, dtype=u32)[None, None, :]
    idx = (m * u32(H * W) + (oy.astype(u32) + dy) * u32(W)
           + (ox.astype(u32) + dx))
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    b1, b2 = threefry2x32_p.bind(key[0], key[1], jnp.zeros_like(idx), idx)
    bits = b1 ^ b2
    # uint32 bits -> [0, 1) float32, the same mantissa trick as
    # jax/_src/random.py::_uniform.
    fb = (bits >> u32(9)) | u32(0x3F800000)
    floats = jax.lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1.0)
    return floats.reshape(num_samples, rH * rW)


def sample_traction_bins(key, pmf_grid, alpha_dyn, num_samples, window=None):
    """Sample per-cell PMF *bin indices*: int32 ``(M, H, W)``.

    Same draw semantics as ``sample_traction_grids`` (which is this followed
    by the bin-value decode); the bin-packed Pallas kernel consumes the raw
    indices (4 bits/cell) and decodes via an in-kernel LUT.
    """
    B, H, W = pmf_grid.shape
    flat = pmf_grid.reshape(B, H * W)
    cum = jnp.cumsum(flat.astype(jnp.int32), axis=0)                 # (B,HW)
    if window is None:
        u = jax.random.uniform(key, (num_samples, H * W), dtype=jnp.float32)
    else:
        full_hw, oy, ox = window
        u = uniform_window(key, num_samples, full_hw, oy, ox, (H, W))
    sampled = jnp.ceil(u * (100.0 * alpha_dyn)).astype(jnp.int32)    # (M,HW)
    bin_idx = jnp.sum(cum[None] < sampled[:, None], axis=1)          # (M,HW)
    return bin_idx.reshape(num_samples, H, W)


def decode_bins(qbin_values, bin_idx):
    """Bin indices -> quantized int8 traction values (0..100)."""
    return jnp.take(qbin_values, bin_idx, axis=0)


def sample_traction_grids(key, pmf_grid, qbin_values, alpha_dyn, num_samples,
                          window=None):
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
      window: optional ``(full_hw, oy, ox)`` when ``pmf_grid`` is an ROI
        crop of a ``full_hw`` map starting at dynamic ``(oy, ox)`` — the
        per-cell uniforms are then drawn at the cells' GLOBAL indices so
        cropped and full-map sampling realize identical maps
        (see ``uniform_window``).

    Returns:
      int8 ``(M, H, W)`` sampled traction grids (values 0..100).

    Note: the map is flattened into the lane (minor) axis internally —
    trailing (H, W) dims like (11, 11) waste ~90% of every (8, 128) vector
    register on TPU; (.., HW) tiles densely.  Same math, same outputs.
    """
    bins = sample_traction_bins(key, pmf_grid, alpha_dyn, num_samples,
                                window=window)
    return decode_bins(qbin_values, bins)
