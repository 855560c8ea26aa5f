"""Multi-host bring-up: process-spanning meshes for pod-scale planning.

The reference is strictly single-process/single-GPU (SURVEY §5.8); this
module provides the TPU-native multi-host path the BASELINE north star
demands (">80% scaling efficiency at N>=2 hosts"):

* ``initialize(...)`` — one call per process, wrapping
  ``jax.distributed.initialize`` with env autodetection (TPU pods
  autodetect everything; explicit coordinator/process args serve CPU/GPU
  clusters and tests).
* ``global_mesh(...)`` — a ``(scenario, k[, m])`` mesh over ALL processes'
  devices (after ``initialize``, ``jax.devices()`` is global).  Axis order
  keeps intra-solve axes innermost so their collectives ride ICI within a
  host/slice and only the scenario axis crosses DCN.
* ``assert_uniform_static(...)`` — fail-fast mesh/config mismatch detection
  (SURVEY §5.3): every process contributes a fingerprint of its
  ``SolverStatic``; any disagreement raises on ALL processes before a
  mismatched executable can produce silent garbage.
* ``host_local_scenarios(...)`` — assemble a global scenario batch from
  per-process host-local data without materializing the global batch on
  any single host.

Exercised end-to-end (2 processes x 2 virtual CPU devices, gloo
collectives) by ``scripts/multihost_launch.py --demo`` and
tests/test_multihost.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import MAP_AXIS, ROLLOUT_AXIS, SCENARIO_AXIS, make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Bring up the process group.  On TPU pods all arguments autodetect
    from the environment; on CPU/GPU clusters pass them explicitly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(num_scenario_shards=None, num_rollout_shards=None,
                num_map_shards=None):
    """A mesh over every device of every process.

    Defaults: the scenario axis spans processes (one scenario shard per
    process — pure data parallelism over DCN) and the rollout axis spans
    each process's local devices (intra-solve collectives stay on
    ICI/shared memory).
    """
    n_local = len(jax.local_devices())
    n_proc = jax.process_count()
    if num_scenario_shards is None:
        num_scenario_shards = n_proc
    if num_rollout_shards is None and num_map_shards is None:
        num_rollout_shards = (n_local * n_proc) // num_scenario_shards
    return make_mesh(num_scenario_shards, num_rollout_shards,
                     devices=jax.devices(), num_map_shards=num_map_shards)


def _static_fingerprint(static) -> np.ndarray:
    """A 4-word uint32 digest of the solver's static signature."""
    digest = hashlib.sha256(repr(static).encode()).digest()[:16]
    return np.frombuffer(digest, dtype=np.uint32).copy()


def assert_uniform_static(static, mesh):
    """Raise on EVERY process if any process disagrees on ``static``.

    A mismatched static signature across hosts (different K, map shape,
    mode, ...) would otherwise fail deep inside XLA compilation or — worse
    — deadlock in a collective.  This is the SURVEY §5.3 fail-fast check.
    """
    from jax.experimental import multihost_utils

    mine = _static_fingerprint(static)
    all_fp = np.asarray(multihost_utils.process_allgather(jnp.asarray(mine)))
    if not (all_fp == all_fp[0]).all():
        bad = [p for p in range(all_fp.shape[0])
               if not (all_fp[p] == all_fp[0]).all()]
        raise RuntimeError(
            "SolverStatic mismatch across processes (process(es) {} differ "
            "from process 0); every host must construct the identical "
            "static signature. Local static: {!r}".format(bad, static))
    del mesh  # reserved: per-axis placement checks


def host_local_scenarios(mesh, local_leaves, scenario_axis=SCENARIO_AXIS):
    """Assemble a global scenario-batched pytree from per-process data.

    Each process passes the leaves for ITS scenarios (leading axis =
    scenarios-per-process); the result is a global jax.Array sharded over
    the mesh's scenario axis without any host holding the full batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(scenario_axis))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, local_leaves)


__all__ = ["initialize", "global_mesh", "assert_uniform_static",
           "host_local_scenarios", "SCENARIO_AXIS", "ROLLOUT_AXIS",
           "MAP_AXIS"]
