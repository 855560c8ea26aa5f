"""Aux subsystems: checkpoint/resume, profiling helpers, angle utils."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mppi_numba_tpu.checkpoint import (load_experiment, load_planner_state,
                                       save_experiment, save_planner_state)
from mppi_numba_tpu.utils.angles import (normalize_angle, normalize_angle_jnp,
                                         normalize_angle_np)


def test_angle_normalization():
    for th in (-7.0, -3.15, -1.0, 0.0, 3.14, 3.15, 9.42):
        got = normalize_angle(th)
        assert -np.pi < got <= np.pi + 1e-12
        assert np.isclose(np.cos(got), np.cos(th), atol=1e-9)
        assert np.isclose(np.sin(got), np.sin(th), atol=1e-9)
    arr = np.linspace(-10, 10, 101)
    got = normalize_angle_np(arr)
    np.testing.assert_allclose(np.cos(got), np.cos(arr), atol=1e-9)
    got_j = np.asarray(normalize_angle_jnp(jnp.asarray(arr)))
    np.testing.assert_allclose(np.cos(got_j), np.cos(arr), atol=1e-5)


def test_planner_checkpoint_roundtrip(tmp_path):
    from test_planner import make_planner

    cfg, planner, params, _ = make_planner("det")
    useq1 = planner.solve()
    path = os.path.join(tmp_path, "state.pkl")
    save_planner_state(planner, path)
    key_before = np.asarray(planner._key)

    # Continue solving, then restore: the restored planner must replay the
    # same next solve.
    useq_next_a = planner.solve()
    load_planner_state(planner, path)
    np.testing.assert_array_equal(np.asarray(planner._key), key_before)
    np.testing.assert_allclose(np.asarray(planner.u_cur), useq1, rtol=1e-6)
    useq_next_b = planner.solve()
    np.testing.assert_allclose(useq_next_a, useq_next_b, rtol=1e-5, atol=1e-6)


def test_experiment_roundtrip(tmp_path):
    import pandas as pd
    df = pd.DataFrame([dict(method="noisy_dyn", alpha=0.5, success=True)])
    path = os.path.join(tmp_path, "exp.pkl")
    save_experiment(path, df, alpha_list=[0.5], max_steps=150)
    back = load_experiment(path)
    assert back["alpha_list"] == [0.5]
    assert back["max_steps"] == 150
    assert back["logger"].iloc[0]["method"] == "noisy_dyn"


def test_chained_solve_timer_runs():
    from mppi_numba_tpu.profiling import chained_solve_time, measure_fetch_rtt
    from mppi_numba_tpu.solver import get_terrain_solver
    from test_sharding import build_case

    static, maps, task, u0, keys = build_case(1, K=64, M=4, T=5, H=8, W=8)
    maps_s = __import__("jax").tree.map(lambda x: x[0], maps)
    task_s = __import__("jax").tree.map(lambda x: x[0], task)
    fn = get_terrain_solver(static)
    dt = chained_solve_time(fn, maps_s, task_s, u0[0], num_iters=3)
    assert dt > 0
    assert measure_fetch_rtt(2) >= 0


def test_chained_kernel_timer_runs():
    import jax.numpy as jnp
    from mppi_numba_tpu.profiling import chained_kernel_time

    ms = chained_kernel_time(lambda v: (v * 2.0).sum(axis=-1),
                             jnp.ones((8, 16), jnp.float32),
                             num_iters=3, reps=2, fetch_rtt_s=0.0)
    assert ms > 0


def test_device_liveness_probe():
    """Probe answers True on a live backend (the explicit platform="cpu"
    override — a JAX_PLATFORMS env var would be clobbered by this
    environment's sitecustomize) and False — naming the timeout — when the
    deadline cannot possibly be met."""
    from mppi_numba_tpu.profiling import device_liveness_probe

    alive, detail = device_liveness_probe(110.0, platform="cpu")
    assert alive, detail
    alive, detail = device_liveness_probe(0.01, platform="cpu")
    assert not alive
    assert "timed out" in detail


def test_load_reference_experiment_tolerant_unpickler(tmp_path):
    """Pickles embedding reference mppi_numba classes load via stubs."""
    import pickle
    import sys
    import types
    import pandas as pd
    from mppi_numba_tpu.checkpoint import load_reference_experiment

    # Fabricate a module like the reference's and pickle an instance of it.
    mod = types.ModuleType("mppi_numba")
    cfg_mod = types.ModuleType("mppi_numba.config")

    class Config:
        def __init__(self):
            self.T = 10.0
            self.use_tdm = True

    cfg_mod.Config = Config
    Config.__module__ = "mppi_numba.config"
    Config.__qualname__ = "Config"
    mod.config = cfg_mod
    sys.modules["mppi_numba"] = mod
    sys.modules["mppi_numba.config"] = cfg_mod
    try:
        payload = dict(cfg=Config(),
                       logger=pd.DataFrame(dict(success=[True, False])))
        p = tmp_path / "ref.pickle"
        with open(p, "wb") as fh:
            pickle.dump(payload, fh)
    finally:
        del sys.modules["mppi_numba"]
        del sys.modules["mppi_numba.config"]

    out = load_reference_experiment(str(p))
    assert out["cfg"].T == 10.0 and out["cfg"].use_tdm is True
    assert out["logger"]["success"].tolist() == [True, False]
