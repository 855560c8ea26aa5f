"""TDM PMF construction, padding, and sampling vs per-cell oracles
(reference: mppi_numba/terrain.py:183-543, 633-695)."""

import numpy as np
import pytest

import jax

from mppi_numba_tpu import (Config, GaussianMixture, TDM, Terrain,
                            TractionGrid, condense_pmf_grid_det,
                            quantize_pmf_int8, risk_map_from_pmf_grid)
from mppi_numba_tpu.ops.sampling import quantize_bin_values, sample_traction_grids

from oracle import det_dyn_pmf_cell, sample_grid_cell


def make_world(seed=0, num_bins=10, shape=(6, 5)):
    rng = np.random.RandomState(seed)
    gm_a = GaussianMixture([0, 1.0], [0, 1.0], [0.6, 0.4], [0.1, 0.8],
                           [0.1, 0.05], num_samples=1e4, rng=rng)
    gm_b = GaussianMixture([0, 1.0], [0, 1.0], [1.0], [0.6], [0.08],
                           num_samples=1e4, rng=rng)
    ta = Terrain("veg", (0, 1, 0), gm_a, gm_a)
    tb = Terrain("dirt", (1, 1, 0), gm_b, gm_b)
    id2name = {0: "dirt", 1: "veg"}
    name2terrain = {"veg": ta, "dirt": tb}
    terrain2pmf = {ta: ta.lin_density.get_pmf(num_bins),
                   tb: tb.lin_density.get_pmf(num_bins)}
    sg = rng.randint(0, 2, size=shape)
    bin_values = terrain2pmf[ta][0]
    return sg, id2name, name2terrain, terrain2pmf, bin_values


def build_tdm(mode, sg, id2name, name2terrain, terrain2pmf, bin_values,
              alpha=0.4, res=1.0, max_map_dim=(30, 30)):
    kw = dict(use_tdm=mode == "tdm", use_det_dynamics=mode == "det",
              use_nom_dynamics_with_speed_map=mode == "speed")
    cfg = Config(T=2.0, dt=0.1, num_grid_samples=16, num_control_rollouts=128,
                 max_speed_padding=2.0, max_map_dim=max_map_dim, seed=0, **kw)
    tdm = TDM(cfg)
    tdm.set_TDM_from_semantic_grid(
        sg, res, len(bin_values), bin_values, np.array([0.0, 1.0]),
        np.array([0.0, sg.shape[1] * res]), np.array([0.0, sg.shape[0] * res]),
        id2name, name2terrain, terrain2pmf,
        det_dynamics_cvar_alpha=None if mode == "tdm" else alpha)
    return cfg, tdm


def test_tdm_mode_pmf_columns_sum_to_100():
    sg, *world = make_world()
    _, tdm = build_tdm("tdm", sg, *world)
    assert (tdm.pmf_grid.sum(axis=0) == 100).all()
    padded = np.asarray(tdm.pmf_grid_device)
    assert (padded.sum(axis=0) == 100).all()


def test_tdm_mode_quantization_matches_reference_rule():
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    _, tdm = build_tdm("tdm", sg, id2name, name2terrain, terrain2pmf, bin_values)
    for sid in np.unique(sg):
        terrain = name2terrain[id2name[sid]]
        values, pmf = terrain2pmf[terrain]
        expect = (pmf * 100).astype(np.int8)
        expect[-1] = np.int8(100) - expect[:-1].sum()
        cells = np.argwhere(sg == sid)
        r, c = cells[0]
        np.testing.assert_array_equal(tdm.pmf_grid[:, r, c], expect)


@pytest.mark.parametrize("alpha", [0.2, 0.5, 1.0])
def test_det_dyn_condensation_matches_percell_oracle(alpha):
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    _, tdm = build_tdm("det", sg, id2name, name2terrain, terrain2pmf,
                       bin_values, alpha=alpha)
    for r in range(sg.shape[0]):
        for c in range(sg.shape[1]):
            terrain = name2terrain[id2name[sg[r, c]]]
            values, pmf = terrain2pmf[terrain]
            expect = det_dyn_pmf_cell(values, pmf, alpha, len(values))
            np.testing.assert_array_equal(tdm.pmf_grid[:, r, c], expect)


@pytest.mark.parametrize("alpha", [0.3, 1.0])
def test_speed_map_risk_values(alpha):
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    _, tdm = build_tdm("speed", sg, id2name, name2terrain, terrain2pmf,
                       bin_values, alpha=alpha)
    # PMF must be one-hot at the last (nominal) bin everywhere.
    assert (tdm.pmf_grid[-1] == 100).all()
    assert (tdm.pmf_grid[:-1] == 0).all()
    # Risk map: per-cell CVaR of linear traction as int8 0..100.
    pad = tdm.pad_cells
    risk = tdm.risk_traction_map[0, pad:-pad, pad:-pad]
    for sid in np.unique(sg):
        terrain = name2terrain[id2name[sid]]
        values, pmf = terrain2pmf[terrain]
        if alpha == 1.0:
            cv = float(np.sum(np.asarray(pmf) * np.asarray(values)))
        else:
            cum = np.cumsum(pmf)
            L = int(np.argmax(cum >= alpha))
            cv = float(np.sum((np.asarray(pmf) * np.asarray(values))[:L + 1]) / cum[L])
        expect = np.int8(100 * cv)
        cells = sg == sid
        assert (risk[cells] == expect).all()


def test_padding_ring_is_zero_traction():
    sg, *world = make_world()
    cfg, tdm = build_tdm("tdm", sg, *world)
    padded = np.asarray(tdm.pmf_grid_device)
    pad = tdm.pad_cells
    assert pad == int(np.ceil(cfg.max_speed_padding * cfg.dt / 1.0))
    # Ring cells: all mass in bin 0 (zero traction).
    assert (padded[0, :pad, :] == 100).all()
    assert (padded[0, -pad:, :] == 100).all()
    assert (padded[0, :, :pad] == 100).all()
    assert (padded[0, :, -pad:] == 100).all()
    # Interior: equals unpadded grid.
    np.testing.assert_array_equal(
        padded[:, pad:-pad, pad:-pad], tdm.pmf_grid)
    # Limits shift by pad*res.
    assert tdm.padded_xlimits[0] == -pad * 1.0
    assert tdm.padded_ylimits[0] == -pad * 1.0


def test_oversized_map_is_cropped():
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world(shape=(40, 40))
    cfg, tdm = build_tdm("tdm", sg, id2name, name2terrain, terrain2pmf,
                         bin_values, max_map_dim=(20, 20))
    H, W = tdm.get_padded_grid_xy_dim()
    assert H <= 20 and W <= 20
    pad = tdm.pad_cells
    assert tdm.semantic_grid.shape == (H - 2 * pad, W - 2 * pad)


def test_pmf_grid_construction_det_matches_reference_math():
    rng = np.random.RandomState(3)
    B, R, C = 6, 4, 5
    raw = rng.randint(0, 100, size=(B, R, C)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    bin_values = np.linspace(0, 1, B)

    for alpha in (0.3, 1.0):
        got = condense_pmf_grid_det(pmf, bin_values, alpha)
        assert (got.sum(0) == 100).all()
        # Reference math, re-derived independently per cell:
        for r in range(R):
            for c in range(C):
                cum = 0.01 * np.cumsum(pmf[:, r, c].astype(float))
                wvc = np.cumsum(0.01 * pmf[:, r, c].astype(float) * bin_values)
                if alpha == 1.0:
                    target = wvc[-1]
                else:
                    L = int(np.argmax(cum >= alpha))
                    target = wvc[L] / (cum[L] + 1e-6)
                bi = int(np.argmax(target <= bin_values))
                assert got[bi, r, c] == 100


def test_set_tdm_from_pmf_grid_tdm_mode_roundtrip():
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    cfg, sem_tdm = build_tdm("tdm", sg, id2name, name2terrain, terrain2pmf,
                             bin_values)
    tdm2 = TDM(cfg)
    tdm2.set_TDM_from_PMF_grid(sem_tdm.pmf_grid, dict(
        res=1.0, xlimits=(0.0, sg.shape[1]), ylimits=(0.0, sg.shape[0]),
        bin_values=bin_values, bin_values_bounds=np.array([0.0, 1.0]),
        det_dynamics_cvar_alpha=1.0))
    np.testing.assert_array_equal(tdm2.pmf_grid, sem_tdm.pmf_grid)
    np.testing.assert_array_equal(np.asarray(tdm2.pmf_grid_device),
                                  np.asarray(sem_tdm.pmf_grid_device))


def test_sample_grids_matches_percell_oracle():
    """The vectorized sampler must agree with the reference CDF walk for the
    SAME uniforms."""
    rng = np.random.RandomState(7)
    B, H, W = 5, 4, 6
    raw = rng.randint(0, 100, size=(B, H, W)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    bin_values = np.linspace(0, 1, B).astype(np.float32)
    qbins = quantize_bin_values(bin_values, (0.0, 1.0))

    import jax.numpy as jnp
    for alpha_dyn in (1.0, 0.35):
        key = jax.random.PRNGKey(0)
        M = 8
        got = np.asarray(sample_traction_grids(
            key, jnp.asarray(pmf), jnp.asarray(qbins),
            jnp.float32(alpha_dyn), M))
        u = np.asarray(jax.random.uniform(key, (M, H, W), dtype=jnp.float32))
        for mi in range(M):
            for r in range(H):
                for c in range(W):
                    expect = sample_grid_cell(pmf[:, r, c], qbins,
                                              float(u[mi, r, c]), alpha_dyn)
                    assert got[mi, r, c] == expect


def test_sample_grids_statistics():
    """Sampled bin frequencies approximate the PMF."""
    B = 4
    pmf = np.zeros((B, 2, 2), dtype=np.int8)
    pmf[:, :, :] = np.array([10, 20, 30, 40], dtype=np.int8).reshape(-1, 1, 1)
    bin_values = np.array([0.0, 0.3, 0.6, 1.0], dtype=np.float32)
    qbins = quantize_bin_values(bin_values, (0.0, 1.0))
    import jax.numpy as jnp
    got = np.asarray(sample_traction_grids(
        jax.random.PRNGKey(1), jnp.asarray(pmf), jnp.asarray(qbins),
        jnp.float32(1.0), 4000))
    freqs = [np.mean(got == q) for q in qbins]
    np.testing.assert_allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.03)


def test_sample_grids_alpha_dyn_restricts_to_low_quantile():
    B = 4
    pmf = np.zeros((B, 1, 1), dtype=np.int8)
    pmf[:, 0, 0] = [25, 25, 25, 25]
    bin_values = np.array([0.0, 0.3, 0.6, 1.0], dtype=np.float32)
    qbins = quantize_bin_values(bin_values, (0.0, 1.0))
    import jax.numpy as jnp
    got = np.asarray(sample_traction_grids(
        jax.random.PRNGKey(2), jnp.asarray(pmf), jnp.asarray(qbins),
        jnp.float32(0.5), 500))
    # alpha_dyn = 0.5 restricts to the worst 50% -> only the two lowest bins
    assert set(np.unique(got)).issubset({qbins[0], qbins[1]})


def test_traction_grid_bounds():
    tg = TractionGrid(np.ones((3, 4)) * 0.5, np.ones((3, 4)) * 0.7, res=1.0)
    assert tg.get(0.5, 0.5) == (0.5, 0.7)
    assert tg.get(-1, 0.5) == (0, 0)
    assert tg.get(4.5, 0.5) == (0, 0)
    assert tg.get(0.5, 3.5) == (0, 0)


def test_sample_grids_true_dist_values_from_terrain():
    sg, id2name, name2terrain, terrain2pmf, bin_values = make_world()
    _, tdm = build_tdm("tdm", sg, id2name, name2terrain, terrain2pmf, bin_values)
    tg = tdm.sample_grids_true_dist()
    lin, ang = tg.get_grids()
    assert lin.shape == tdm.semantic_grid.shape
    assert (lin >= 0).all() and (lin <= 1).all()
