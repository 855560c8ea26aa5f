"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated the way SURVEY §4 prescribes —
``--xla_force_host_platform_device_count`` — while numerics tests compare
against NumPy oracles that transcribe the reference kernel semantics.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
