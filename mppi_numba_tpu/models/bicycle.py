"""Kinematic bicycle dynamics (a second model demonstrating pluggability).

Controls are (v, steering angle delta); heading rate is
``v * tan(delta) / wheelbase``.  Traction scaling mirrors the unicycle
convention: linear traction scales translation, angular traction scales the
heading rate — so the same terrain PMF machinery applies unchanged.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def make_bicycle_step(wheelbase=0.5):
    """Build a bicycle step function with a fixed wheelbase."""

    def bicycle_step(x, y, th, v, delta, lin_traction, ang_traction, dt):
        v_eff = lin_traction * v
        x_new = x + dt * v_eff * jnp.cos(th)
        y_new = y + dt * v_eff * jnp.sin(th)
        th_new = th + dt * ang_traction * v * jnp.tan(delta) / wheelbase
        return x_new, y_new, th_new

    return bicycle_step


bicycle_step = make_bicycle_step()
