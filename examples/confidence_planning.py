#!/usr/bin/env python3
"""Risk-aware planning on a real-world learned traction model with an
unfamiliar-terrain confidence mask.

Script equivalent of the reference's ``confidence_score_example_vis.ipynb``
(reference: README.md:115 — the notebook itself is absent from the repo,
only its ``tdm_models/*/tdm_info.pickle`` inputs are committed): a neural
traversability model provides per-cell int8 PMF grids over linear and
angular traction for a real 138x82 @ 0.5 m map, plus a normalized detector
confidence score per cell.  Cells whose confidence falls below
``conf_thres`` (plus never-observed cells) are marked "unknown" and
penalized during rollouts; ground truth for the closed-loop simulation is a
realization drawn from the ground-truth PMF grids.

Usage:
    python examples/confidence_planning.py [conf_thres] [tdm_models_dir]
    python examples/confidence_planning.py 0.3 --gif
    python examples/confidence_planning.py --gt-nn

``--gif`` renders the closed-loop episode as an animated GIF
(``examples/conf_thres=<t>_trained_nn.gif``) with per-step planned
rollouts, matching the reference's committed media set
(reference: example_gifs/conf_thres={0.0,0.3,0.6}_trained_nn.gif).

``--gt-nn`` reproduces example_gifs/gt_nn.gif instead: the planner runs on
the traction model trained IN the simulated environment (ground-truth
wp_forest1 PMFs — the in-domain prediction), rendered reference-style over
the map's semantic color image with the "NN trained in this env." stamp.

With no real ``tdm_models`` directory available, a synthetic map with the
same structure is generated so the script stays self-contained.
"""

import os
import pickle
import sys
import time

import numpy as np


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_numba_tpu import (Config, MPPIPlanner, TDM, trial,
                            sample_realization_from_pmf_grid,
                            unknown_mask_from_confidence)

DEFAULT_TDM_MODELS = "/root/reference/tdm_models"


def load_real_tdm(models_dir, gt_name="wp_forest1",
                  pred_name="fells_nn_predicts_wp_forest1"):
    """Load (predicted, ground-truth) tdm_info dicts from a tdm_models tree."""
    def load(path):
        with open(path, "rb") as fh:
            return pickle.load(fh)
    pred = load(os.path.join(models_dir, "predicted", pred_name,
                             "tdm_info.pickle"))
    gt = load(os.path.join(models_dir, "ground_truth", gt_name,
                           "tdm_info.pickle"))
    return pred, gt


def synth_tdm(rows=60, cols=40, num_bins=12, seed=0):
    """Synthetic stand-in with the tdm_info.pickle schema."""
    rng = np.random.RandomState(seed)
    bin_values = np.linspace(0.0, 1.0, num_bins)
    pmf = np.zeros((num_bins, rows, cols), dtype=np.int64)
    pmf[num_bins - 2] = 60
    pmf[num_bins - 1] = 40
    swamp = (slice(rows // 3, rows // 2), slice(None))
    pmf[:, swamp[0], :] = 0
    pmf[1, swamp[0], :] = 50
    pmf[num_bins - 2, swamp[0], :] = 50
    conf = np.clip(rng.normal(0.8, 0.3, size=(rows, cols)), -1, 1)
    info = dict(
        xlimits=np.array([0.0, cols * 0.5]),
        ylimits=np.array([0.0, rows * 0.5]), res=0.5,
        bin_values=bin_values,
        bin_values_bounds=np.array([0.0, 1.0]),
        height=rows, width=cols,
        lin_pmf_grid=pmf, ang_pmf_grid=pmf,
        normalized_confidence=conf,
        unknown_colors_mask=np.zeros((rows, cols), dtype=np.int64))
    return info, info


def _pred_mean_extent(pred, xlimits, ylimits):
    """Mean predicted linear traction + imshow extent (shared by the GIF
    and the static figure)."""
    pred_mean = (np.asarray(pred["lin_pmf_grid"]) / 100.0
                 * np.asarray(pred["bin_values"],
                              dtype=float)[:, None, None]).sum(0)
    return pred_mean, [xlimits[0], xlimits[1], ylimits[0], ylimits[1]]


def _draw_unknown_overlay(ax, pred_mean, unknown, extent):
    """Gray traction background with the unfamiliar-cell mask shaded."""
    ax.imshow(pred_mean, origin="lower", extent=extent, cmap="gray",
              alpha=0.8)
    ax.imshow(np.ma.masked_where(unknown == 0, unknown), origin="lower",
              extent=extent, cmap="autumn", alpha=0.5)


def render_gif(planner, gt_grid, cfg, params, pred, unknown, conf_thres,
               x0, xgoal, xlimits, ylimits, max_steps=400, stride=2):
    """Closed-loop episode -> animated GIF with per-step planned rollouts
    (reference media parity: example_gifs/conf_thres=<t>_trained_nn.gif).
    The episode itself runs through ``sim.trial`` (the benchmarked
    sequencing) via its observational ``on_step`` hook."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    t0 = time.time()
    frames = []

    def capture(t, xhist_prefix):
        if t % stride == 0:
            frames.append((xhist_prefix.copy(), planner.get_state_rollout()))

    logger = trial(planner, gt_grid, cfg.dt, max_steps=max_steps,
                   mppi_params=params, return_history=True, on_step=capture)
    xhist = logger["xhist"]
    xhist = xhist[~np.isnan(xhist[:, 0])]
    if logger["success"]:
        print("goal reached at t={:.2f}s".format(logger["time_to_goal"]))
    else:
        print("episode hit max_steps without reaching the goal")
    frames.append((xhist, planner.get_state_rollout()))
    print("episode + rollout capture took {:.1f}s wall clock"
          .format(time.time() - t0))

    pred_mean, extent = _pred_mean_extent(pred, xlimits, ylimits)
    fig, ax = plt.subplots(figsize=(8, 6))
    _draw_unknown_overlay(ax, pred_mean, unknown, extent)
    ax.plot(*x0[:2], "go", ms=9)
    ax.plot(*xgoal, "r*", ms=14)
    ax.add_patch(plt.Circle(tuple(xgoal), params["goal_tolerance"],
                            color="r", fill=False))
    ax.set_title("conf_thres={} (unfamiliar cells shaded)".format(conf_thres))
    traj_line, = ax.plot([], [], "c-", lw=2)
    roll_lines = [ax.plot([], [], "b", alpha=0.15, lw=1)[0]
                  for _ in range(frames[0][1].shape[0])]

    def update(i):
        traj, rollouts = frames[i]
        traj_line.set_data(traj[:, 0], traj[:, 1])
        for line, states in zip(roll_lines, rollouts):
            line.set_data(states[:, 0], states[:, 1])
        return [traj_line] + roll_lines

    anim = animation.FuncAnimation(fig, update, frames=len(frames),
                                   interval=100, blit=True)
    out = "examples/conf_thres={}_trained_nn.gif".format(conf_thres)
    anim.save(out, writer=animation.PillowWriter(fps=10))
    print("saved", out)


def render_gt_nn_gif(planner, gt_grid, cfg, params, gt, x0, xgoal,
                     xlimits, ylimits, max_steps=400, stride=2):
    """Reference-style episode GIF on the in-domain model
    (example_gifs/gt_nn.gif): semantic color-image background, white
    past-states line, "NN trained in this env." stamp."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mppi_numba_tpu.visualization import render_episode_gif

    frames = []

    def capture(t, xhist_prefix):
        if t % stride == 0:
            frames.append((xhist_prefix.copy(), planner.get_state_rollout()))

    logger = trial(planner, gt_grid, cfg.dt, max_steps=max_steps,
                   mppi_params=params, return_history=True, on_step=capture)
    xhist = logger["xhist"]
    xhist = xhist[~np.isnan(xhist[:, 0])]
    frames.append((xhist, planner.get_state_rollout()))
    print("success={} time_to_goal={}".format(
        logger["success"], round(logger.get("time_to_goal", float("nan")), 2)))

    # Background: the map's semantic color image (id2rgb_map[color_indices],
    # the same layer behind the reference's gt_nn.gif frames).
    id2rgb = gt["id2rgb_map"]
    idx = np.asarray(gt["color_indices"])
    rgb = np.zeros(idx.shape + (3,), dtype=float)
    for cid, col in id2rgb.items():
        rgb[idx == cid] = np.asarray(col, dtype=float)[:3]
    if rgb.max() > 1.0:
        rgb = rgb / 255.0
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(rgb, origin="lower",
              extent=[xlimits[0], xlimits[1], ylimits[0], ylimits[1]])
    ax.set_aspect("equal", adjustable="box")
    out = render_episode_gif(
        fig, ax, frames, x0, xgoal, params["goal_tolerance"], cfg.dt,
        "examples/gt_nn.gif", steps_per_frame=stride, past_color="w",
        caption="NN trained in this env.",
        legend_anchor=(1.0, 1.0), legend_loc="upper right")
    print("saved", out)


def main():
    args = [a for a in sys.argv[1:] if a not in ("--gif", "--gt-nn")]
    make_gif = "--gif" in sys.argv[1:]
    gt_nn = "--gt-nn" in sys.argv[1:]
    conf_thres = float(args[0]) if len(args) > 0 else 0.3
    models_dir = args[1] if len(args) > 1 else DEFAULT_TDM_MODELS

    if os.path.isdir(models_dir):
        pred, gt = load_real_tdm(models_dir)
        print("loaded real tdm_models from", models_dir)
    else:
        pred, gt = synth_tdm()
        print("tdm_models not found; using a synthetic map")
    if gt_nn:
        # In-domain: the planner's model is the one trained in the simulated
        # env (reference gt_nn.gif), so there is no cross-domain confidence
        # mask to threshold — only never-observed cells stay unknown.
        pred = gt
        conf_thres = -1.0

    res = float(pred["res"])
    H, W = pred["lin_pmf_grid"].shape[1:]
    xlimits = tuple(np.asarray(pred["xlimits"], dtype=float))
    ylimits = tuple(np.asarray(pred["ylimits"], dtype=float))

    unknown = unknown_mask_from_confidence(
        pred["normalized_confidence"], conf_thres,
        pred.get("unknown_colors_mask"))
    print("conf_thres={} -> {:.1f}% of cells unknown".format(
        conf_thres, 100.0 * unknown.mean()))

    max_speed = 2.0
    pad = int(np.ceil(max_speed * 0.1 / res))
    cfg = Config(T=6.0, dt=0.1, num_grid_samples=64,
                 num_control_rollouts=1024, max_speed_padding=max_speed,
                 num_vis_state_rollouts=20,
                 max_map_dim=(H + 2 * pad + 2, W + 2 * pad + 2), seed=0,
                 use_tdm=True)

    tdm_dict = dict(res=res, xlimits=xlimits, ylimits=ylimits,
                    bin_values=np.asarray(pred["bin_values"]),
                    bin_values_bounds=np.asarray(pred["bin_values_bounds"]),
                    det_dynamics_cvar_alpha=1.0)
    lin_tdm, ang_tdm = TDM(cfg), TDM(cfg)
    lin_tdm.set_TDM_from_PMF_grid(np.asarray(pred["lin_pmf_grid"], np.int8),
                                  tdm_dict, unknown_map=unknown)
    ang_tdm.set_TDM_from_PMF_grid(np.asarray(pred["ang_pmf_grid"], np.int8),
                                  tdm_dict, unknown_map=unknown)

    # Ground truth for the simulator: one realization from the GT PMF grids.
    rng = np.random.RandomState(1)
    gt_grid = sample_realization_from_pmf_grid(
        gt["lin_pmf_grid"], gt["ang_pmf_grid"], gt["bin_values"], rng,
        res=res, xlimits=xlimits, ylimits=ylimits)

    # Start/goal on traversable, confidently observed ground (a real forest
    # map is mostly zero-traction, so fixed fractions of the extent would
    # strand the robot).
    bv = np.asarray(gt["bin_values"], dtype=float)
    mean_tr = (np.asarray(gt["lin_pmf_grid"]) / 100.0
               * bv[:, None, None]).sum(0)
    good = (mean_tr > 0.5) & (unknown == 0)
    ys, xs = np.nonzero(good)
    assert len(ys) > 1, "no traversable cells"
    # BFS over 8-connected traversable cells from the lowest-corner one, so
    # the goal is guaranteed reachable without crossing bad ground.
    start = (ys[np.argmin(ys + xs)], xs[np.argmin(ys + xs)])
    dist = np.full(good.shape, -1, dtype=int)
    dist[start] = 0
    frontier = [start]
    while frontier:
        nxt = []
        for (r, c) in frontier:
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    if (0 <= rr < good.shape[0] and 0 <= cc < good.shape[1]
                            and good[rr, cc] and dist[rr, cc] < 0):
                        dist[rr, cc] = dist[r, c] + 1
                        nxt.append((rr, cc))
        frontier = nxt
    # Goal: a reachable cell roughly 50 cells (25 m) of path away — the
    # farthest one if the component is smaller.
    target = min(int(25.0 / res), dist.max())
    gys, gxs = np.nonzero(dist == target)
    gi = np.argmax((gys - start[0]) ** 2 + (gxs - start[1]) ** 2)
    goal_cell = (gys[gi], gxs[gi])

    def cell_xy(rc):
        return (xlimits[0] + (rc[1] + 0.5) * res,
                ylimits[0] + (rc[0] + 0.5) * res)

    sx, sy = cell_xy(start)
    gx, gy = cell_xy(goal_cell)
    x0 = np.array([sx, sy, np.arctan2(gy - sy, gx - sx)])
    xgoal = np.array([gx, gy])
    print("start ({:.1f}, {:.1f}) -> goal ({:.1f}, {:.1f}), {:.1f} m apart"
          .format(x0[0], x0[1], xgoal[0], xgoal[1],
                  float(np.hypot(*(xgoal - x0[:2])))))

    params = dict(dt=cfg.dt, x0=x0, xgoal=xgoal, goal_tolerance=1.0,
                  v_post_rollout=0.01, cvar_alpha=0.5, alpha_dyn=1.0,
                  dist_weight=1.0, lambda_weight=1.0, num_opt=1,
                  u_std=np.array([1.5, 2.0]),
                  vrange=np.array([0.0, max_speed]),
                  wrange=np.array([-np.pi, np.pi]),
                  # Soft unknown cost: on a cross-domain prediction the
                  # detector flags ~half the traversable ground unfamiliar,
                  # so unknown cells must stay passable-at-a-price.
                  obs_penalty=1e5, unknown_penalty=2.0)

    planner = MPPIPlanner(cfg)
    planner.setup(params, lin_tdm, ang_tdm)

    if gt_nn:
        render_gt_nn_gif(planner, gt_grid, cfg, params, gt, x0, xgoal,
                         xlimits, ylimits)
        return
    if make_gif:
        render_gif(planner, gt_grid, cfg, params, pred, unknown, conf_thres,
                   x0, xgoal, xlimits, ylimits)
        return

    t0 = time.time()
    logger = trial(planner, gt_grid, cfg.dt, max_steps=400,
                   mppi_params=params, return_history=True)
    xhist = logger.pop("xhist")
    logger.pop("uhist")
    print("episode finished in {:.1f}s wall clock".format(time.time() - t0))
    print({k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in logger.items()})

    # Visualization in the spirit of the reference's (missing) notebook:
    # mean predicted traction, the confidence-derived unknown mask, and the
    # executed trajectory.
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    pred_mean, extent = _pred_mean_extent(pred, xlimits, ylimits)
    fig, axes = plt.subplots(1, 2, figsize=(11, 6))
    im = axes[0].imshow(pred_mean, origin="lower", extent=extent,
                        cmap="viridis", alpha=0.9)
    axes[0].set_title("predicted mean linear traction")
    _draw_unknown_overlay(axes[1], pred_mean, unknown, extent)
    axes[1].set_title("unknown (confidence < {})".format(conf_thres))
    for ax in axes:
        ax.plot(xhist[:, 0], xhist[:, 1], "c-", lw=2, label="trajectory")
        ax.plot(*x0[:2], "go", ms=9, label="start")
        ax.plot(*xgoal, "r*", ms=14, label="goal")
        ax.legend(loc="lower right", fontsize=8)
    fig.colorbar(im, ax=axes[1], shrink=0.7)
    out = "examples/confidence_planning.png"
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("saved", out)


if __name__ == "__main__":
    main()
