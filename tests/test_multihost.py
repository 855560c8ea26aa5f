"""Multi-host bring-up, exercised as real separate processes.

The 2-process localhost rehearsal (gloo collectives over a CPU mesh) runs
the full path: jax.distributed.initialize -> process-spanning mesh ->
fail-fast static check -> per-process data feeding -> sharded solve ->
per-scenario equivalence against the single-device solver.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_demo_end_to_end():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/multihost_launch.py"),
         "--demo"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all 2 processes OK" in r.stdout


def test_two_process_k_over_dcn_demo():
    """Worst-case layout (SCALING.md): the k axis spans BOTH processes, so
    the per-iteration pmin/psum collectives and the shard-local map-sample
    all-gather all cross the inter-process fabric.  Results must still
    match the single-device solver."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/multihost_launch.py"),
         "--demo", "--mesh-axis", "k"],
        cwd=REPO, capture_output=True, text=True, timeout=400,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all 2 processes OK" in r.stdout


def test_static_fingerprint_detects_mismatch():
    from mppi_numba_tpu.parallel.multihost import _static_fingerprint
    from mppi_numba_tpu.config import SolverStatic

    a = SolverStatic(mode="tdm", num_steps=10, num_control_rollouts=64,
                     num_grid_samples=8, map_shape=(7, 7), num_obstacles=0,
                     cvar_numel=3, num_opt=1, num_vis_state_rollouts=1)
    b_same = SolverStatic(**{**a.__dict__})
    import dataclasses
    b_diff = dataclasses.replace(a, num_control_rollouts=128)
    assert np.array_equal(_static_fingerprint(a), _static_fingerprint(b_same))
    assert not np.array_equal(_static_fingerprint(a),
                              _static_fingerprint(b_diff))
