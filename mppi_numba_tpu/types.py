"""Runtime pytrees exchanged between the planner and the jitted solver.

The reference stages ~10 small host arrays to device per solve
(reference: mppi_numba/mppi.py:214-234).  Here the same quantities form two
NamedTuple pytrees: ``TerrainTask`` (per-solve scalars/vectors) and
``MapInputs`` (per-map-update tensors).  Only leaves are traced; everything
structural is static via ``config.SolverStatic``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp  # noqa: F401  (dtype documentation)


class TerrainTask(NamedTuple):
    """Dynamic per-solve task parameters (all float32 leaves)."""
    x0: object            # (3,) start state [x, y, theta]
    xgoal: object         # (2,) goal position
    goal_tolerance: object
    v_post_rollout: object
    lambda_weight: object
    u_std: object         # (2,)
    vrange: object        # (2,)
    wrange: object        # (2,)
    dt: object
    dist_weight: object
    obs_penalty: object
    unknown_penalty: object
    alpha_dyn: object     # quantile restriction for map sampling
    res: object           # map cell resolution
    xlim0: object         # padded x lower limit
    ylim0: object         # padded y lower limit
    lin_lb: object        # linear traction decode: lb + ratio * int8
    lin_ratio: object
    ang_lb: object
    ang_ratio: object
    # Only read when SolverStatic.cvar_numel == DYNAMIC_CVAR (-1): traced
    # CVaR risk level, letting one executable serve a whole alpha sweep.
    cvar_alpha: object = None


class MapInputs(NamedTuple):
    """Per-map-update device tensors (int8 leaves)."""
    lin_pmf: object       # (B, H, W) int8, bins sum to 100
    ang_pmf: object       # (B, H, W) int8
    lin_qbins: object     # (B,) int8 quantized bin values
    ang_qbins: object     # (B,) int8
    obstacle: object      # (H, W) int8 indicator
    unknown: object       # (H, W) int8 indicator
    risk: object          # (H, W) int8 CVaR speed map (zeros unless speed-map mode)


class SolveAux(NamedTuple):
    """Auxiliary outputs of one solve, kept on device for vis/inspection."""
    costs: object         # (K,) final rollout costs (incl. coupling)
    weights: object       # (K,) softmax weights
    noise_vis: object     # (V, T, 2) first V noise rows of the last iteration
    lin_grids: object     # (M, rH, rW) int8 sampled linear traction grids
    ang_grids: object     # (M, rH, rW) int8 sampled angular traction grids
    # (2,) int32 (row, col) offset of the sampled window within the padded
    # map — zeros unless SolverStatic.roi_shape cropping was active.
    roi_offset: object = None


class BareboneTask(NamedTuple):
    """Dynamic task parameters for the terrain-free barebone engine."""
    x0: object
    xgoal: object
    goal_tolerance: object
    lambda_weight: object
    u_std: object
    vrange: object
    wrange: object
    dt: object
    dist_weight: object
    obs_penalty: object
    obs_pos: object       # (N, 2) circle obstacle centers
    obs_r: object         # (N,) circle obstacle radii
