"""Benchmark harness: paired-environment factorial sweep.

Reproduces the reference's statistical benchmark
(reference: benchmark.ipynb[cells 2-5]): the Vegetation/Dirt Gaussian-mixture
world, environment pre-generation shared across methods (so method
comparisons are paired on identical semantic maps AND identical ground-truth
traction realizations), the methods x densities x envs x alphas x
realizations sweep, and the same pandas DataFrame schema.
"""

from __future__ import annotations

import copy
import time

import numpy as np

from .config import Config
from .density import GaussianMixture
from .mppi import MPPIPlanner
from .sim import trial
from .terrain import TDM, Terrain

METHODS = ("noisy_dyn", "risk_dyn", "nom_dyn_risk_cost")
# The reference's paper run (16,000 trials) additionally sweeps a 4th
# method, "baseline": standard MPPI under nominal dynamics — the planner
# assumes perfect traction everywhere (its TDM is a one-hot PMF at the last
# bin, the FAQ-1 workflow; reference README.md:134-152) while the simulator
# still applies the realized tractions.  Pass method_list=PAPER_METHODS to
# reproduce the full paper sweep.
PAPER_METHODS = METHODS + ("baseline",)


def make_benchmark_world(num_bins=20, rng=None):
    """The two-terrain world of the reference benchmark
    (reference: benchmark.ipynb[cell 2]): Vegetation is bimodal {0, 0.8}
    traction, Dirt is unimodal 0.65."""
    pmf_bounds = [0, 1.0]
    bush_lin = GaussianMixture(pmf_bounds, pmf_bounds, [0.6, 0.4], [0, 0.8],
                               [0.15, 0.1], rng=rng)
    bush_ang = GaussianMixture(pmf_bounds, pmf_bounds, [0.6, 0.4], [0, 0.8],
                               [0.15, 0.1], rng=rng)
    dirt_lin = GaussianMixture(pmf_bounds, pmf_bounds, [1], [0.65], [0.1],
                               rng=rng)
    dirt_ang = GaussianMixture(pmf_bounds, pmf_bounds, [1], [0.65], [0.1],
                               rng=rng)

    bush = Terrain("Vegetation", np.array((0, 250, 0)) / 255.0,
                   bush_lin, bush_ang)
    dirt = Terrain("Dirt", np.array((200, 190, 160)) / 255.0,
                   dirt_lin, dirt_ang)

    id2name = {0: dirt.name, 1: bush.name}
    name2terrain = {bush.name: bush, dirt.name: dirt}
    lin_terrain2pmf = {bush: bush_lin.get_pmf(num_bins),
                       dirt: dirt_lin.get_pmf(num_bins)}
    ang_terrain2pmf = {bush: bush_ang.get_pmf(num_bins),
                       dirt: dirt_ang.get_pmf(num_bins)}
    bin_values = lin_terrain2pmf[bush][0]
    return dict(id2name=id2name, name2terrain=name2terrain,
                lin_terrain2pmf=lin_terrain2pmf,
                ang_terrain2pmf=ang_terrain2pmf,
                bin_values=bin_values,
                bin_values_bounds=(np.min(bin_values), np.max(bin_values)),
                num_pmf_bins=len(bin_values))


def make_semantic_grid(grid_shape, mud_margin, grass_density, rng,
                       dirt_along_edge=True):
    """Random semantic map with a dirt corridor near the edge
    (reference: benchmark.ipynb[cell 4])."""
    semantic_grid = np.zeros(grid_shape, dtype=np.int8)
    if dirt_along_edge:
        rand_num = rng.rand(grid_shape[0] - 2 * mud_margin,
                            grid_shape[1] - 2 * mud_margin)
        semantic_grid[mud_margin:-mud_margin,
                      mud_margin:-mud_margin][rand_num < grass_density] = 1
    else:
        rand_num = rng.rand(*grid_shape)
        semantic_grid[rand_num < grass_density] = 1
        semantic_grid[:mud_margin, :mud_margin] = 0
        semantic_grid[-mud_margin:, -mud_margin:] = 0
    return semantic_grid


def _nominal_pmf_inputs(world, grid_shape, res, xlimits, ylimits):
    """(pmf_grid, tdm_dict) for the baseline method: one-hot PMF at the
    last bin = perfect traction everywhere (reference FAQ-1 workflow)."""
    pmf = np.zeros((world["num_pmf_bins"],) + tuple(grid_shape), np.int8)
    pmf[-1] = 100
    tdm_dict = dict(res=res, xlimits=xlimits, ylimits=ylimits,
                    bin_values=world["bin_values"],
                    bin_values_bounds=np.asarray(world["bin_values_bounds"]),
                    det_dynamics_cvar_alpha=1.0)
    return pmf, tdm_dict


def _cfg_for_method(orig_cfg: Config, method: str) -> Config:
    kw = dict(T=orig_cfg.T, dt=orig_cfg.dt,
              num_grid_samples=orig_cfg.num_grid_samples,
              num_control_rollouts=orig_cfg.num_control_rollouts,
              max_speed_padding=orig_cfg.max_speed_padding,
              num_vis_state_rollouts=orig_cfg.num_vis_state_rollouts,
              max_map_dim=orig_cfg.max_map_dim, seed=orig_cfg.seed)
    if method in ("risk_dyn", "baseline"):
        return Config(use_det_dynamics=True, **kw)
    if method == "nom_dyn_risk_cost":
        return Config(use_nom_dynamics_with_speed_map=True, **kw)
    if method == "noisy_dyn":
        # noisy_dyn sweeps cvar_alpha across trials; tracing it (instead of
        # specializing cvar_numel per alpha) makes the whole 5-alpha sweep
        # share ONE executable — same mechanism the device engine uses.
        return Config(use_tdm=True, dynamic_cvar=True, **kw)
    raise ValueError(method)


def run_trials(orig_cfg, world, max_steps, grid_shape, mud_margin, res,
               default_mppi_params, grass_density_list, envs_per_density,
               trials_per_env, alpha_list, method_list=METHODS,
               seed=0, verbose=True):
    """Full factorial sweep -> pandas DataFrame with the reference schema.

    Environments and ground-truth realizations are generated ONCE and shared
    across methods/alphas (paired comparisons, reference:
    benchmark.ipynb[cell 4] ``density_to_grid_configs``).
    """
    import pandas as pd

    rng = np.random.RandomState(seed)
    loggers = []

    # Pre-generate semantic maps + ground-truth traction realizations.
    pregen_cfg = _cfg_for_method(orig_cfg, "noisy_dyn")
    lin_tdm = TDM(pregen_cfg)
    xlimits = (0, grid_shape[1] * res)
    ylimits = (0, grid_shape[0] * res)
    density_to_grid_configs = {gd: [] for gd in grass_density_list}
    for density_i, grass_density in enumerate(grass_density_list):
        for sem_map_i in range(envs_per_density):
            semantic_grid = make_semantic_grid(grid_shape, mud_margin,
                                               grass_density, rng)
            lin_tdm.reset()
            lin_tdm.set_TDM_from_semantic_grid(
                semantic_grid, res, world["num_pmf_bins"],
                world["bin_values"], world["bin_values_bounds"],
                xlimits, ylimits, world["id2name"], world["name2terrain"],
                world["lin_terrain2pmf"])
            realizations = [lin_tdm.sample_grids_true_dist()
                            for _ in range(trials_per_env)]
            density_to_grid_configs[grass_density].append(dict(
                semantic_grid=semantic_grid, sem_map_i=sem_map_i,
                realizations=realizations, dirt_along_edge=True))

    for method_i, method in enumerate(method_list):
        cfg = _cfg_for_method(orig_cfg, method)
        mppi_planner = MPPIPlanner(cfg)
        lin_tdm = TDM(cfg)
        ang_tdm = TDM(cfg)

        for density_i, grass_density in enumerate(grass_density_list):
            for sg_dict in density_to_grid_configs[grass_density]:
                semantic_grid = sg_dict["semantic_grid"]
                sem_map_i = sg_dict["sem_map_i"]
                realizations = sg_dict["realizations"]

                t_alphas = time.time()
                for alpha_i, alpha in enumerate(alpha_list):
                    if verbose:
                        print("method={}({}/{}), grass_density={} ({}/{}), "
                              "grid ({}/{}), alpha={}({}/{})".format(
                                  method, method_i + 1, len(method_list),
                                  grass_density, density_i + 1,
                                  len(grass_density_list),
                                  sem_map_i + 1, envs_per_density,
                                  alpha, alpha_i + 1, len(alpha_list)))

                    lin_tdm.reset()
                    ang_tdm.reset()
                    mppi_planner.reset()
                    trial_params = copy.deepcopy(default_mppi_params)
                    if method == "baseline":
                        trial_params["alpha_dyn"] = 1.0
                        trial_params["cvar_alpha"] = 1.0
                    elif method in ("risk_dyn", "nom_dyn_risk_cost"):
                        det_alpha = alpha
                        trial_params["alpha_dyn"] = alpha
                        trial_params["cvar_alpha"] = 1.0
                    else:
                        det_alpha = None
                        trial_params["alpha_dyn"] = 1.0
                        trial_params["cvar_alpha"] = alpha
                    if method == "baseline":
                        # Nominal planner; maps ignore alpha.
                        nominal_pmf, nominal_dict = _nominal_pmf_inputs(
                            world, semantic_grid.shape, res, xlimits,
                            ylimits)
                        lin_tdm.set_TDM_from_PMF_grid(nominal_pmf,
                                                      nominal_dict)
                        ang_tdm.set_TDM_from_PMF_grid(nominal_pmf,
                                                      nominal_dict)
                    else:
                        lin_tdm.set_TDM_from_semantic_grid(
                            semantic_grid, res, world["num_pmf_bins"],
                            world["bin_values"], world["bin_values_bounds"],
                            xlimits, ylimits, world["id2name"],
                            world["name2terrain"], world["lin_terrain2pmf"],
                            det_dynamics_cvar_alpha=det_alpha)
                        ang_tdm.set_TDM_from_semantic_grid(
                            semantic_grid, res, world["num_pmf_bins"],
                            world["bin_values"], world["bin_values_bounds"],
                            xlimits, ylimits, world["id2name"],
                            world["name2terrain"], world["ang_terrain2pmf"],
                            det_dynamics_cvar_alpha=det_alpha)

                    mppi_planner.setup(trial_params, lin_tdm, ang_tdm)

                    # NOTE (reference fidelity): the planner is NOT reset
                    # between realizations — the warm-started control
                    # sequence (and the stale params['x0'] mutated by
                    # shift_and_update) carry into the next trial's first
                    # solve, exactly as in benchmark.ipynb[cell 4].
                    for map_sample_i, traction_grid in enumerate(realizations):
                        logger = trial(mppi_planner, traction_grid, cfg.dt,
                                       max_steps, trial_params)
                        logger.update(
                            dirt_along_edge=sg_dict["dirt_along_edge"],
                            grass_density=grass_density,
                            grass_density_index=density_i,
                            sem_map_index=sem_map_i,
                            method=method, alpha=alpha,
                            map_sample_index=map_sample_i)
                        loggers.append(logger)

                if verbose:
                    t_elapsed = time.time() - t_alphas
                    n = len(alpha_list) * len(realizations)
                    print("{:.2f}s for {} alphas x {} realizations "
                          "({:.2f}s per trial)".format(
                              t_elapsed, len(alpha_list),
                              len(realizations), t_elapsed / n))

    return pd.DataFrame(loggers)


def run_trials_device(orig_cfg, world, max_steps, grid_shape, mud_margin,
                      res, default_mppi_params, grass_density_list,
                      envs_per_density, trials_per_env, alpha_list,
                      method_list=METHODS, seed=0, verbose=True,
                      batch_chunk=30):
    """Device-batched factorial sweep: one fused program per (method, alpha)
    runs ALL (density x env x realization) episodes concurrently on chip.

    Same paired-environment generation and DataFrame schema as
    ``run_trials``; trials are independent (no warm-start carry-over between
    realizations — see ``device_sim`` docstring).  One executable per method
    serves the whole alpha sweep (dynamic CVaR).  This is the TPU-native
    answer to the reference's 2,421 s sequential benchmark loop.

    ``batch_chunk`` caps the episodes per device call (the last chunk is
    padded to the same shape so every chunk reuses one executable): a single
    execution covering the full batch can run for minutes on-device, which
    trips worker/RPC execution deadlines on tethered TPU runtimes.  ``None``
    runs the whole batch in one call.
    """
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from .device_sim import make_device_trial_batch
    from .solver import DYNAMIC_CVAR
    from .types import MapInputs, TerrainTask
    from .config import SolverStatic

    rng = np.random.RandomState(seed)
    xlimits = (0, grid_shape[1] * res)
    ylimits = (0, grid_shape[0] * res)

    # Pre-generate environments + ground-truth realizations (paired).
    pregen_cfg = _cfg_for_method(orig_cfg, "noisy_dyn")
    gen_tdm = TDM(pregen_cfg)
    env_rows = []   # one row per (density, env, realization)
    env_grids = {}  # (density_i, env_i) -> semantic grid
    for density_i, grass_density in enumerate(grass_density_list):
        for env_i in range(envs_per_density):
            sg = make_semantic_grid(grid_shape, mud_margin, grass_density, rng)
            env_grids[(density_i, env_i)] = sg
            gen_tdm.reset()
            gen_tdm.set_TDM_from_semantic_grid(
                sg, res, world["num_pmf_bins"], world["bin_values"],
                world["bin_values_bounds"], xlimits, ylimits,
                world["id2name"], world["name2terrain"],
                world["lin_terrain2pmf"])
            for trial_i in range(trials_per_env):
                tg = gen_tdm.sample_grids_true_dist()
                env_rows.append(dict(density_i=density_i,
                                     grass_density=grass_density,
                                     env_i=env_i, trial_i=trial_i,
                                     gt=tg))

    B = len(env_rows)
    gt_lin = jnp.asarray(np.stack([r["gt"].lin_traction for r in env_rows])
                         .astype(np.float32))
    gt_ang = jnp.asarray(np.stack([r["gt"].ang_traction for r in env_rows])
                         .astype(np.float32))
    gt_meta = jnp.asarray(np.tile(
        np.array([0.0, 0.0, 1.0 / res], np.float32), (B, 1)))

    loggers = []
    for method in method_list:
        cfg = _cfg_for_method(orig_cfg, method)
        lin_tdm = TDM(cfg)
        ang_tdm = TDM(cfg)
        maps_by_det_alpha = {}   # the maps depend on alpha ONLY via det_alpha
        for alpha in alpha_list:
            if verbose:
                print("device sweep: method={} alpha={} ({} trials)".format(
                    method, alpha, B))
            if method == "baseline":
                # Nominal-dynamics MPPI: the planner assumes traction 1
                # everywhere (one-hot PMF at the last bin, the reference's
                # FAQ-1 workflow); alpha is irrelevant, maps cached once.
                det_alpha, cvar_alpha, alpha_dyn = "baseline", 1.0, 1.0
            else:
                det_alpha = None if method == "noisy_dyn" else alpha
                cvar_alpha = alpha if method == "noisy_dyn" else 1.0
                alpha_dyn = 1.0 if method == "noisy_dyn" else alpha

            if det_alpha not in maps_by_det_alpha:
                # Build per-env map tensors once, then index per trial row.
                if method == "baseline":
                    nominal_pmf, nominal_dict = _nominal_pmf_inputs(
                        world, next(iter(env_grids.values())).shape, res,
                        xlimits, ylimits)
                env_maps = {}
                for key_env, sg in env_grids.items():
                    lin_tdm.reset()
                    ang_tdm.reset()
                    if method == "baseline":
                        lin_tdm.set_TDM_from_PMF_grid(nominal_pmf,
                                                      nominal_dict)
                        ang_tdm.set_TDM_from_PMF_grid(nominal_pmf,
                                                      nominal_dict)
                    else:
                        lin_tdm.set_TDM_from_semantic_grid(
                            sg, res, world["num_pmf_bins"],
                            world["bin_values"],
                            world["bin_values_bounds"], xlimits, ylimits,
                            world["id2name"], world["name2terrain"],
                            world["lin_terrain2pmf"],
                            det_dynamics_cvar_alpha=det_alpha)
                        ang_tdm.set_TDM_from_semantic_grid(
                            sg, res, world["num_pmf_bins"],
                            world["bin_values"],
                            world["bin_values_bounds"], xlimits, ylimits,
                            world["id2name"], world["name2terrain"],
                            world["ang_terrain2pmf"],
                            det_dynamics_cvar_alpha=det_alpha)
                    env_maps[key_env] = (
                        np.asarray(lin_tdm.pmf_grid_device),
                        np.asarray(ang_tdm.pmf_grid_device),
                        np.asarray(lin_tdm.qbin_values),
                        np.asarray(ang_tdm.qbin_values),
                        np.asarray(lin_tdm.obstacle_map_device),
                        np.asarray(lin_tdm.unknown_map_device),
                        np.asarray(lin_tdm.risk_traction_map_device))
                stacked = [np.stack([env_maps[(r["density_i"], r["env_i"])][i]
                                     for r in env_rows]) for i in range(7)]
                maps_by_det_alpha[det_alpha] = MapInputs(
                    *(jnp.asarray(s) for s in stacked))
            maps = maps_by_det_alpha[det_alpha]

            p = default_mppi_params
            f32 = np.float32
            lb, ub = world["bin_values_bounds"]

            def batched(v):
                v = np.asarray(v, f32)
                return jnp.asarray(np.broadcast_to(v, (B,) + v.shape).copy())

            task = TerrainTask(
                x0=batched(p["x0"]), xgoal=batched(p["xgoal"]),
                goal_tolerance=batched(f32(p["goal_tolerance"])),
                v_post_rollout=batched(f32(p["v_post_rollout"])),
                lambda_weight=batched(f32(p["lambda_weight"])),
                u_std=batched(p["u_std"]), vrange=batched(p["vrange"]),
                wrange=batched(p["wrange"]), dt=batched(f32(p["dt"])),
                dist_weight=batched(f32(p.get("dist_weight", 1.0))),
                obs_penalty=batched(f32(p.get("obs_penalty", 1e5))),
                unknown_penalty=batched(f32(p.get("unknown_penalty", 1e2))),
                alpha_dyn=batched(f32(alpha_dyn)),
                res=batched(f32(res)),
                xlim0=batched(f32(lin_tdm.padded_xlimits[0])),
                ylim0=batched(f32(lin_tdm.padded_ylimits[0])),
                lin_lb=batched(f32(lb)),
                lin_ratio=batched(f32(0.01 * (ub - lb))),
                ang_lb=batched(f32(lb)),
                ang_ratio=batched(f32(0.01 * (ub - lb))),
                cvar_alpha=batched(f32(cvar_alpha)))

            M = 1 if method != "noisy_dyn" else cfg.num_grid_samples
            H, W = lin_tdm.get_padded_grid_xy_dim()
            static = SolverStatic(
                mode={"noisy_dyn": "tdm", "risk_dyn": "det_dyn",
                      "nom_dyn_risk_cost": "speed_map",
                      "baseline": "det_dyn"}[method],
                num_steps=cfg.num_steps,
                num_control_rollouts=cfg.num_control_rollouts,
                num_grid_samples=M, map_shape=(H, W), num_obstacles=0,
                cvar_numel=DYNAMIC_CVAR if M > 1 else 1, num_opt=1,
                num_vis_state_rollouts=1,
                fast_trig=(float(p["dt"]) * float(np.max(np.abs(p["wrange"])))
                           * float(ub) <= 0.6))

            trial_batch = make_device_trial_batch(static, max_steps)
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.PRNGKey(cfg.seed), jnp.arange(B))

            chunk = B if batch_chunk is None else min(batch_chunk, B)

            def take(tree, lo):
                # Fixed-size slice (pads past the end by clamping) so every
                # chunk hits the same executable.
                idx = jnp.clip(jnp.arange(lo, lo + chunk), 0, B - 1)
                return jax.tree.map(lambda x: x[idx], tree)

            parts = []
            for lo in range(0, B, chunk):
                out = trial_batch(take(keys, lo), take(maps, lo),
                                  take(task, lo), take(gt_lin, lo),
                                  take(gt_ang, lo), take(gt_meta, lo))
                parts.append(jax.tree.map(np.asarray, out))
            result = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=0)[:B], *parts)

            for bi, row in enumerate(env_rows):
                success = bool(result.success[bi])
                loggers.append(dict(
                    time_to_goal=(result.steps[bi] * cfg.dt
                                  if success else np.nan),
                    success=success,
                    dist_to_goal=(np.nan if success
                                  else float(result.dist_to_goal[bi])),
                    cum_dist_to_goal=float(result.cum_dist_to_goal[bi]),
                    avg_dist_to_goal=float(result.cum_dist_to_goal[bi]
                                           / max(int(result.steps[bi]), 1)),
                    cum_obj=float(result.cum_obj[bi]),
                    dirt_along_edge=True,
                    grass_density=row["grass_density"],
                    grass_density_index=row["density_i"],
                    sem_map_index=row["env_i"],
                    method=method, alpha=alpha,
                    map_sample_index=row["trial_i"]))

    return pd.DataFrame(loggers)


def default_benchmark_params(cfg, grid_shape, mud_margin, max_speed=3.0,
                             res=1.0):
    """Default problem params of the reference benchmark
    (reference: benchmark.ipynb[cell 5]; there the grid is square with
    res=1, hiding that x spans COLUMNS — grid_shape[1] — in world
    coordinates)."""
    return dict(
        dt=cfg.dt,
        x0=np.array([mud_margin * res / 2, mud_margin * res / 2, np.pi / 4]),
        xgoal=np.array([(grid_shape[1] - mud_margin / 2) * res,
                        (grid_shape[0] - mud_margin / 2) * res]),
        goal_tolerance=mud_margin * res / 2,
        v_post_rollout=0.01,
        cvar_alpha=1.0,
        alpha_dyn=1.0,
        lambda_weight=1.0,
        num_opt=1,
        u_std=np.array([2.0, 3.0]),
        vrange=np.array([0, max_speed]),
        wrange=np.array([-np.pi, np.pi]),
    )
