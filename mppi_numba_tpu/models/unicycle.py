"""Unicycle dynamics as pure, batched JAX functions.

The reference hard-codes the unicycle Euler update inside every CUDA kernel
because Numba cannot dispatch through objects on device
(reference: mppi_numba/mppi.py:6-7, 677-694).  Here dynamics are ordinary
pure functions over batched arrays, so alternative models plug into the same
rollout core by passing a different ``step`` callable.
"""

from __future__ import annotations

import jax.numpy as jnp


def unicycle_step(x, y, th, v, w, lin_traction, ang_traction, dt):
    """One traction-scaled Euler step of the unicycle model.

    All arguments broadcast; the hot path calls this with ``(K, M)`` state
    arrays, ``(K, 1)`` controls, and ``(K, M)`` tractions.  Matches the
    reference update (reference: mppi_numba/mppi.py:692-694):

        x += dt * lin_traction * v * cos(th)
        y += dt * lin_traction * v * sin(th)
        th += dt * ang_traction * w
    """
    x_new = x + dt * lin_traction * v * jnp.cos(th)
    y_new = y + dt * lin_traction * v * jnp.sin(th)
    th_new = th + dt * ang_traction * w
    return x_new, y_new, th_new


def clip_controls(u_nom, vrange, wrange):
    """Clamp nominal (v, w) controls to their actuation ranges.

    ``u_nom`` has shape ``(..., 2)``; matches the reference clamping
    (reference: mppi_numba/mppi.py:688-689).
    """
    v = jnp.clip(u_nom[..., 0], vrange[0], vrange[1])
    w = jnp.clip(u_nom[..., 1], wrange[0], wrange[1])
    return v, w
