"""Device-mesh construction for pod-scale planning.

The reference is single-GPU (SURVEY §2.4/§5.8: no NCCL/MPI of any kind); its
only "distribution" is the CUDA grid/block decomposition.  The TPU engine
scales the same two batch axes over hardware instead:

* ``scenario`` — independent planning problems (pure data parallelism, no
  intra-solve communication), and
* ``k`` — control rollouts of ONE solve, with per-iteration ``pmin/psum``
  reductions over ICI for the softmax update.

Axis order puts ``k`` innermost so its collectives ride the fastest ICI
links when the mesh spans hosts.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

SCENARIO_AXIS = "scenario"
ROLLOUT_AXIS = "k"


def make_mesh(num_scenario_shards=1, num_rollout_shards=None, devices=None):
    """Build a ``(scenario, k)`` mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if num_rollout_shards is None:
        assert n % num_scenario_shards == 0, \
            f"{n} devices not divisible into {num_scenario_shards} scenario shards"
        num_rollout_shards = n // num_scenario_shards
    assert num_scenario_shards * num_rollout_shards == n, \
        (num_scenario_shards, num_rollout_shards, n)
    dev_array = np.asarray(devices).reshape(num_scenario_shards,
                                            num_rollout_shards)
    return Mesh(dev_array, (SCENARIO_AXIS, ROLLOUT_AXIS))


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
