"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated the way SURVEY §4 prescribes —
``--xla_force_host_platform_device_count`` — while numerics tests compare
against NumPy oracles that transcribe the reference kernel semantics.
"""

import os

# NOTE: the environment may pre-set JAX_PLATFORMS (e.g. "axon,cpu"), which
# wins over os.environ changes made here; jax.config.update is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
