"""Benchmark harness: schema, pairing, and a tiny closed-loop sweep."""

import numpy as np

from mppi_numba_tpu import (Config, default_benchmark_params,
                            make_benchmark_world, make_semantic_grid,
                            run_trials)

EXPECTED_COLUMNS = {
    "time_to_goal", "success", "dist_to_goal", "cum_dist_to_goal",
    "avg_dist_to_goal", "cum_obj", "dirt_along_edge", "grass_density",
    "grass_density_index", "sem_map_index", "method", "alpha",
    "map_sample_index",
}


def test_make_semantic_grid_margin_and_density():
    rng = np.random.RandomState(0)
    sg = make_semantic_grid((9, 9), 1, 1.0, rng)
    assert (sg[0, :] == 0).all() and (sg[:, 0] == 0).all()
    assert (sg[-1, :] == 0).all() and (sg[:, -1] == 0).all()
    assert (sg[1:-1, 1:-1] == 1).all()
    sg0 = make_semantic_grid((9, 9), 1, 0.0, rng)
    assert (sg0 == 0).all()


def test_run_trials_schema_and_pairing():
    world = make_benchmark_world(num_bins=10,
                                 rng=np.random.RandomState(0))
    cfg = Config(T=3.0, dt=0.1, num_grid_samples=32,
                 num_control_rollouts=128, max_speed_padding=3.0,
                 num_vis_state_rollouts=1, max_map_dim=(15, 15), seed=1,
                 use_tdm=True)
    grid_shape = (9, 9)
    params = default_benchmark_params(cfg, grid_shape, mud_margin=1)
    from mppi_numba_tpu.solver import get_terrain_solver
    before = get_terrain_solver.cache_info().currsize
    df = run_trials(cfg, world, max_steps=20, grid_shape=grid_shape,
                    mud_margin=1, res=1.0, default_mppi_params=params,
                    grass_density_list=[0.4], envs_per_density=1,
                    trials_per_env=2, alpha_list=[1.0, 0.5],
                    method_list=["noisy_dyn", "risk_dyn"], verbose=False)

    # One executable per method serves its whole alpha sweep: noisy_dyn's
    # cvar_alpha is traced (dynamic_cvar default in _cfg_for_method),
    # risk_dyn's alpha only changes map contents, never the static shape.
    assert get_terrain_solver.cache_info().currsize == before + 2

    assert EXPECTED_COLUMNS.issubset(df.columns)
    # 2 methods x 1 density x 1 env x 2 alphas x 2 realizations
    assert len(df) == 8
    assert set(df["method"]) == {"noisy_dyn", "risk_dyn"}
    assert np.isfinite(df["cum_obj"]).all()
    # Paired environments: both methods see the same (env, realization) keys.
    keys_a = set(map(tuple, df[df.method == "noisy_dyn"]
                     [["sem_map_index", "map_sample_index", "alpha"]].values))
    keys_b = set(map(tuple, df[df.method == "risk_dyn"]
                     [["sem_map_index", "map_sample_index", "alpha"]].values))
    assert keys_a == keys_b


def test_benchmark_vis_plotting():
    import matplotlib
    matplotlib.use("Agg")
    import pandas as pd
    from mppi_numba_tpu.benchmark_vis import plot_joint_success_and_time

    rng = np.random.RandomState(0)
    rows = []
    for method in ("noisy_dyn", "risk_dyn"):
        for alpha in (0.5, 1.0):
            for i in range(5):
                success = bool(rng.rand() < 0.8)
                rows.append(dict(method=method, alpha=alpha, success=success,
                                 time_to_goal=rng.rand() * 10 if success else np.nan,
                                 grass_density=0.4))
    df = pd.DataFrame(rows)
    fig, axes = plot_joint_success_and_time(df, [0.5, 1.0],
                                            method_list=["noisy_dyn",
                                                         "risk_dyn"])
    assert len(axes) == 2


def test_run_trials_device_chunking_matches_unchunked():
    """batch_chunk must not change results (incl. a padded final chunk)."""
    import pandas as pd
    from mppi_numba_tpu.benchmark import run_trials_device

    def run(batch_chunk):
        world = make_benchmark_world(num_bins=8,
                                     rng=np.random.RandomState(0))
        cfg = Config(T=2.0, dt=0.1, num_grid_samples=8,
                     num_control_rollouts=128, max_speed_padding=3.0,
                     max_map_dim=(11, 11), seed=1, use_tdm=True)
        p = default_benchmark_params(cfg, (5, 5), 1)
        return run_trials_device(cfg, world, 10, (5, 5), 1, 1.0, p,
                                 grass_density_list=[0.4],
                                 envs_per_density=3, trials_per_env=2,
                                 alpha_list=[0.6],
                                 method_list=["noisy_dyn"], verbose=False,
                                 batch_chunk=batch_chunk)

    # NOTE: the world must be rebuilt per call — its GaussianMixtures hold a
    # stateful RandomState consumed by the ground-truth realizations.
    df_chunked = run(4)      # B=6 -> chunks of 4 + padded tail
    df_full = run(None)
    pd.testing.assert_frame_equal(df_chunked, df_full)


def test_baseline_method_nominal_planner():
    """The paper run's 4th method: nominal-dynamics MPPI (planner assumes
    traction 1; simulator applies realized tractions). Alpha-invariant."""
    from mppi_numba_tpu.benchmark import run_trials_device

    world = make_benchmark_world(num_bins=8, rng=np.random.RandomState(0))
    cfg = Config(T=2.0, dt=0.1, num_grid_samples=8, num_control_rollouts=128,
                 max_speed_padding=3.0, max_map_dim=(11, 11), seed=1,
                 use_tdm=True)
    p = default_benchmark_params(cfg, (5, 5), 1)
    df = run_trials_device(cfg, world, 12, (5, 5), 1, 1.0, p,
                           grass_density_list=[0.4], envs_per_density=2,
                           trials_per_env=1, alpha_list=[0.6, 1.0],
                           method_list=["baseline"], verbose=False)
    assert len(df) == 4 and np.isfinite(df.cum_obj).all()
    a = df[df.alpha == 0.6].cum_obj.values
    b = df[df.alpha == 1.0].cum_obj.values
    np.testing.assert_allclose(a, b)   # nominal planner ignores alpha
