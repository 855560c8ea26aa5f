"""Device-mesh construction for pod-scale planning.

The reference is single-GPU (SURVEY §2.4/§5.8: no NCCL/MPI of any kind); its
only "distribution" is the CUDA grid/block decomposition.  The TPU engine
scales the same two batch axes over hardware instead:

* ``scenario`` — independent planning problems (pure data parallelism, no
  intra-solve communication),
* ``k`` — control rollouts of ONE solve, with per-iteration ``pmin/psum``
  reductions over ICI for the softmax update, and
* ``m`` — traction-map samples of ONE solve, with a two-phase distributed
  top-k (or psum) for the CVaR reduction (``ops/cvar.py``).

Axis order puts ``k``/``m`` innermost so intra-solve collectives ride the
fastest ICI links when the mesh spans hosts.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

SCENARIO_AXIS = "scenario"
ROLLOUT_AXIS = "k"
MAP_AXIS = "m"


def make_mesh(num_scenario_shards=1, num_rollout_shards=None, devices=None,
              num_map_shards=None):
    """Build a ``(scenario, k)`` or ``(scenario, k, m)`` mesh.

    With ``num_map_shards=None`` (default) the mesh has the two classic
    axes — existing shardings are unchanged.  Passing a map-shard count
    adds the ``m`` axis innermost, sharding the M map samples of each
    solve (memory and CVaR work per chip scale as 1/n_m).
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    n_m = 1 if num_map_shards is None else num_map_shards
    if num_rollout_shards is None:
        assert n % (num_scenario_shards * n_m) == 0, \
            f"{n} devices not divisible into {num_scenario_shards} x {n_m}"
        num_rollout_shards = n // (num_scenario_shards * n_m)
    assert num_scenario_shards * num_rollout_shards * n_m == n, \
        (num_scenario_shards, num_rollout_shards, n_m, n)
    if num_map_shards is None:
        dev_array = np.asarray(devices).reshape(num_scenario_shards,
                                                num_rollout_shards)
        return Mesh(dev_array, (SCENARIO_AXIS, ROLLOUT_AXIS))
    dev_array = np.asarray(devices).reshape(num_scenario_shards,
                                            num_rollout_shards, n_m)
    return Mesh(dev_array, (SCENARIO_AXIS, ROLLOUT_AXIS, MAP_AXIS))


def balanced_mesh(devices=None):
    """Split devices evenly-ish between the scenario and rollout axes."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    s = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            s = cand
            break
    return make_mesh(s, n // s, devices)
