"""TDM visualizer and density plots render without error (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from mppi_numba_tpu.visualization import (TDMVisualizer, TDM_Visualizer,
                                          vis_density, vis_density_as_pmf)

from test_terrain import build_tdm, make_world


def test_tdm_visualizer_draw():
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    _, tdm = build_tdm("tdm", sg, id2name, name2terrain, terrain2pmf,
                       bin_values)
    vis = TDMVisualizer(tdm)
    out = vis.draw(figsize=(4, 4))
    assert out is not None
    fig, ax = out
    # padded grid: every cell gets a polygon patch collection
    assert vis.semantic_grid.shape == tdm.get_padded_grid_xy_dim()
    assert (vis.semantic_grid[0, :] == -1).all()  # padding ring class
    assert TDM_Visualizer is TDMVisualizer


def test_density_plots():
    import matplotlib.pyplot as plt
    from mppi_numba_tpu import GaussianMixture, Terrain

    gm = GaussianMixture([0, 1.0], [0, 1.0], [1.0], [0.5], [0.1],
                         num_samples=1e3)
    t = Terrain("t", (0, 1, 0), gm, gm)
    fig, ax = plt.subplots()
    vis_density(ax, gm, t, show_cvar=True)
    fig, ax = plt.subplots()
    vis_density_as_pmf(ax, gm, t, num_bins=10)


def test_render_episode_gif(tmp_path):
    """Reference-styled episode renderer (planner_example_vis.gif /
    gt_nn.gif equivalents): writes an animated GIF with one frame per
    capture and never lets the legend's +-1e6 dummy markers autoscale the
    axes."""
    import matplotlib.pyplot as plt
    import numpy as np
    from PIL import Image
    from mppi_numba_tpu.visualization import render_episode_gif

    rng = np.random.RandomState(0)
    frames = []
    for t in range(1, 4):
        xhist = np.cumsum(rng.rand(t + 1, 3), axis=0)
        rollouts = np.cumsum(rng.rand(5, 6, 3), axis=1)
        frames.append((xhist, rollouts))
    fig, ax = plt.subplots(figsize=(3, 3))
    ax.set_xlim(0, 10)
    ax.set_ylim(0, 10)
    out = render_episode_gif(fig, ax, frames, np.array([1.0, 1.0, 0.0]),
                             np.array([8.0, 8.0]), 0.5, 0.1,
                             str(tmp_path / "ep.gif"), caption="test env")
    im = Image.open(out)
    n = 0
    try:
        while True:
            im.seek(n)
            n += 1
    except EOFError:
        pass
    assert n == len(frames)
    assert ax.get_xlim() == (0.0, 10.0)  # dummies did not autoscale
