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
