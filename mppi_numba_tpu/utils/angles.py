"""Angle normalization helpers (reference: mppi_numba/utils.py:5-31).

Dead code in the reference but part of its public surface; provided here in
both scalar/NumPy and JAX-traceable forms.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def normalize_angle(th):
    """Normalize a scalar angle to (-pi, pi]."""
    two_pi = 2 * np.pi
    th = th % two_pi
    th = (th + two_pi) % two_pi
    if th > np.pi:
        th -= two_pi
    return th


def normalize_angle_np(th):
    """Vectorized NumPy angle normalization to (-pi, pi]."""
    two_pi = 2 * np.pi
    th = np.asarray(th) % two_pi
    th = (th + two_pi) % two_pi
    return np.where(th > np.pi, th - two_pi, th)


def normalize_angle_jnp(th):
    """JAX-traceable angle normalization to (-pi, pi]."""
    two_pi = 2 * jnp.pi
    th = th % two_pi
    th = (th + two_pi) % two_pi
    return jnp.where(th > jnp.pi, th - two_pi, th)
