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


def sample_noise_slice(key, u_std, num_rollouts, num_steps, k_start, k_count):
    """Rows ``[k_start, k_start+k_count)`` of ``sample_noise``'s (K, T, 2)
    draw, computed shard-locally and bit-identically (see ``normal_slice``)."""
    eps = normal_slice(key, (num_rollouts, num_steps, 2), k_start, k_count)
    return eps * u_std.astype(eps.dtype)


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


# --------------------------------------------------------------------------
# Counter-addressable draws.
#
# JAX's partitionable threefry generates the bits of element ``i`` of a draw
# purely from the flat element index (jax/_src/prng.py
# ``_threefry_random_bits_partitionable``), so any SUB-BLOCK of a larger
# logical draw can be rebuilt bit-identically by evaluating the bits at the
# block's GLOBAL flat indices — without materializing the full draw.  This
# powers two pure optimizations that provably do not change solve outputs:
#
# * the ROI map crop (uniform_window): per-cell uniforms keyed by global
#   cell position, so the cropped solve realizes the full solve's maps;
# * shard-local sampling (normal_slice / uniform_window's m_offset): each
#   k-shard draws only ITS noise rows / map-sample rows, bit-identical to
#   the single-device full draw (tests/test_sharding.py equivalence).
# --------------------------------------------------------------------------


def _uniform01_at_counters(key, idx):
    """float32 uniforms in [0, 1) at the given uint32 flat counters —
    bit-identical to ``jax.random.uniform(key, shape)`` at those flat
    positions (same mantissa trick as jax/_src/random.py::_uniform).

    Only valid for PARTITIONABLE threefry2x32 (JAX's default): with
    ``jax_threefry_partitionable`` disabled, or a non-threefry key impl
    (e.g. rbg), the rebuilt bits would NOT match ``jax.random`` draws and
    the ROI/shard bit-identity contracts would silently break — so both
    are checked here.
    """
    from jax._src.prng import threefry2x32_p

    if not jax.config.jax_threefry_partitionable:
        raise RuntimeError(
            "counter-addressable draws require jax_threefry_partitionable "
            "(JAX's default); it is disabled in this process, which would "
            "silently break the ROI-crop / shard-local bit-identity "
            "guarantees")
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        impl = str(jax.random.key_impl(key))
        if "threefry" not in impl:
            raise RuntimeError(
                "counter-addressable draws require threefry2x32 keys, got "
                "impl {!r}".format(impl))
        key = jax.random.key_data(key)
    if key.shape != (2,):
        raise RuntimeError(
            "counter-addressable draws require a threefry2x32 key of 2 "
            "uint32 words, got shape {}".format(key.shape))
    b1, b2 = threefry2x32_p.bind(key[0], key[1], jnp.zeros_like(idx), idx)
    bits = b1 ^ b2
    fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1.0)


_COUNTER_LAYOUT_VERIFIED = False
_COUNTER_LAYOUT_CHECKING = False


def _verify_counter_layout():
    """One-time runtime self-check of the counter-addressable-draw contract.

    ``_uniform01_at_counters`` reproduces jax._src.prng internals (threefry
    counters laid out as ``(0, flat_index)`` plus the _uniform mantissa
    trick).  The guards above check the key impl and the partitionable flag,
    but not the counter layout itself — if a future JAX release changed
    ``_threefry_random_bits_partitionable``'s index mapping, the ROI-crop /
    shard-local bit-identity contract would silently break in production.
    So the first counter-addressable draw in a process pays one tiny eager
    comparison against the public ``jax.random`` API and raises on mismatch.
    """
    global _COUNTER_LAYOUT_VERIFIED, _COUNTER_LAYOUT_CHECKING
    if _COUNTER_LAYOUT_VERIFIED or _COUNTER_LAYOUT_CHECKING:
        return
    # Separate in-progress sentinel (the draws below recurse here); the
    # verified flag is only set after a SUCCESSFUL comparison, so a
    # transient failure inside the probe (RPC error, interrupt) leaves the
    # check armed for the caller's retry instead of silently disabling it.
    _COUNTER_LAYOUT_CHECKING = True
    try:
        # The first counter draw usually happens while TRACING a solve;
        # ensure_compile_time_eval keeps this one-time probe eager/concrete.
        with jax.ensure_compile_time_eval():
            key = jax.random.PRNGKey(0x5EED)
            shape = (3, 2, 7)
            total = int(np.prod(shape))
            want_u = np.asarray(jax.random.uniform(key, shape)).reshape(-1)
            got_u = np.asarray(_uniform01_at_counters(
                key, jnp.arange(total, dtype=jnp.uint32)))
            want_n = np.asarray(jax.random.normal(key, shape))[1:]
            got_n = np.asarray(normal_slice(key, shape, 1, 2))
    finally:
        _COUNTER_LAYOUT_CHECKING = False
    if np.array_equal(want_u, got_u) and np.array_equal(want_n, got_n):
        _COUNTER_LAYOUT_VERIFIED = True
    else:
        raise RuntimeError(
            "counter-addressable draws no longer match jax.random draws — "
            "this JAX version changed the partitionable-threefry counter "
            "layout; the ROI-crop / shard-local bit-identity contract is "
            "broken (mppi_numba_tpu/ops/sampling.py)")


def uniform_window(key, num_samples, full_hw, oy, ox, window_hw,
                   m_offset=0, full_num_samples=None):
    """A window of ``jax.random.uniform(key, (full_M, H*W))``, bit-identical.

    Args:
      key: threefry PRNG key (raw uint32 (2,) or new-style typed key).
      num_samples: static M rows generated.
      full_hw: static full padded (H, W) the equivalent full draw covers.
      oy / ox: dynamic int32 window start row/col.
      window_hw: static (rH, rW).
      m_offset: dynamic/static first map-sample row (k-shards generate only
        their slice of the M axis).
      full_num_samples: static total M of the equivalent full draw
        (defaults to ``num_samples``).

    Returns:
      float32 ``(num_samples, rH*rW)`` uniforms in [0, 1).
    """
    _verify_counter_layout()
    H, W = full_hw
    rH, rW = window_hw
    full_m = num_samples if full_num_samples is None else full_num_samples
    total = full_m * H * W
    if total >= 2 ** 32:
        raise NotImplementedError(
            "uniform_window supports M*H*W < 2**32 (got {})".format(total))
    u32 = jnp.uint32
    m = (jnp.asarray(m_offset).astype(u32)
         + jnp.arange(num_samples, dtype=u32))[:, None, None]
    dy = jnp.arange(rH, dtype=u32)[None, :, None]
    dx = jnp.arange(rW, dtype=u32)[None, None, :]
    idx = (m * u32(H * W) + (jnp.asarray(oy).astype(u32) + dy) * u32(W)
           + (jnp.asarray(ox).astype(u32) + dx))
    return _uniform01_at_counters(key, idx).reshape(num_samples, rH * rW)


def normal_slice(key, full_shape, start, count, dtype=jnp.float32):
    """``jax.random.normal(key, full_shape)[start:start+count]`` without
    materializing the full draw, bit-identical.

    Replicates jax/_src/random.py::_normal_real at the slice's global flat
    counters: uniforms in [-1+ulp, 1) -> ``sqrt(2) * erfinv``.  ``start``
    may be dynamic (e.g. ``axis_index * k_local`` inside shard_map);
    ``count`` is static.
    """
    assert dtype == jnp.float32, "normal_slice replicates the f32 path only"
    _verify_counter_layout()
    total = int(np.prod(full_shape))
    if total >= 2 ** 32:
        raise NotImplementedError(
            "normal_slice supports prod(shape) < 2**32 (got {})".format(total))
    rest = int(np.prod(full_shape[1:]))
    u32 = jnp.uint32
    idx = (jnp.asarray(start).astype(u32) * u32(rest)
           + jnp.arange(count * rest, dtype=u32))
    floats = _uniform01_at_counters(key, idx)
    lo = np.nextafter(np.float32(-1.0), np.float32(0.0), dtype=np.float32)
    hi = np.float32(1.0)
    u = jnp.maximum(lo, floats * (hi - lo) + lo)
    out = np.float32(np.sqrt(2)) * jax.lax.erf_inv(u)
    return out.reshape((count,) + tuple(full_shape[1:]))


def sample_traction_bins(key, pmf_grid, alpha_dyn, num_samples, window=None,
                         m_window=None):
    """Sample per-cell PMF *bin indices*: int32 ``(M, H, W)``.

    Same draw semantics as ``sample_traction_grids`` (which is this followed
    by the bin-value decode); the bin-packed Pallas kernel consumes the raw
    indices (4 bits/cell) and decodes via an in-kernel LUT.
    ``m_window=(full_M, m_offset)`` generates only rows
    ``[m_offset, m_offset+num_samples)`` of an equivalent ``full_M``-row
    draw (shard-local map sampling), bit-identically.
    """
    B, H, W = pmf_grid.shape
    flat = pmf_grid.reshape(B, H * W)
    cum = jnp.cumsum(flat.astype(jnp.int32), axis=0)                 # (B,HW)
    if window is None and m_window is None:
        u = jax.random.uniform(key, (num_samples, H * W), dtype=jnp.float32)
    else:
        full_hw, oy, ox = (window if window is not None
                           else ((H, W), jnp.int32(0), jnp.int32(0)))
        full_m, m0 = m_window if m_window is not None else (num_samples, 0)
        u = uniform_window(key, num_samples, full_hw, oy, ox, (H, W),
                           m_offset=m0, full_num_samples=full_m)
    sampled = jnp.ceil(u * (100.0 * alpha_dyn)).astype(jnp.int32)    # (M,HW)
    bin_idx = jnp.sum(cum[None] < sampled[:, None], axis=1)          # (M,HW)
    return bin_idx.reshape(num_samples, H, W)


def decode_bins(qbin_values, bin_idx):
    """Bin indices -> quantized int8 traction values (0..100)."""
    return jnp.take(qbin_values, bin_idx, axis=0)


def sample_traction_grids(key, pmf_grid, qbin_values, alpha_dyn, num_samples,
                          window=None, m_window=None):
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
                                window=window, m_window=m_window)
    return decode_bins(qbin_values, bins)
