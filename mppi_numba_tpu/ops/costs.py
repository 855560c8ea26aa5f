"""Stage and terminal cost functions (pure, batched).

Semantics match the reference device functions exactly so control sequences
are comparable at matched noise:

* terrain engine: ``stage = dt + dist_weight * sqrt(dist2)`` and
  ``term = (1 - reached) * sqrt(dist2) / (v_post + 1e-6)``
  (reference: mppi_numba/mppi.py:20-28),
* barebone engine: ``stage = dist_weight * dist2`` and
  ``term = (1 - reached) * dist2``
  (reference: barebone_mppi_numba.ipynb[cell 3]).

Default penalty constants follow the reference module constants
(reference: mppi_numba/mppi.py:32-36, barebone cell 3).
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_UNKNOWN_COST = 1e2
DEFAULT_OBS_COST = 1e5
DEFAULT_DIST_WEIGHT = 1.0

BAREBONE_DEFAULT_OBS_COST = 1e3
BAREBONE_DEFAULT_DIST_WEIGHT = 10.0


def stage_cost(dist2, dt_eff, dist_weight):
    """Min-time + distance-shaping stage cost.

    ``dt_eff`` is the plain timestep for the tdm/det modes, or
    ``dt / (effective_speed + 1e-6)`` for the CVaR speed-map mode
    (reference: mppi_numba/mppi.py:1095-1096).
    """
    return dt_eff + dist_weight * jnp.sqrt(dist2)


def term_cost(dist2, v_post_rollout, goal_reached):
    """Residual distance converted to time at an assumed post-rollout speed."""
    return (1.0 - goal_reached) * jnp.sqrt(dist2) / (v_post_rollout + 1e-6)


def barebone_stage_cost(dist2, dist_weight):
    return dist_weight * dist2


def barebone_term_cost(dist2, goal_reached):
    return (1.0 - goal_reached) * dist2
