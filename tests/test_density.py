"""Density / GaussianMixture behavior (reference: mppi_numba/density.py)."""

import numpy as np
import pytest

from mppi_numba_tpu import Density, GaussianMixture


def test_gmm_respects_sample_bounds():
    gm = GaussianMixture([0, 1.0], [0, 1.0], [0.5, 0.5], [0.0, 0.8],
                         [0.3, 0.1], num_samples=1e3)
    s = gm.sample(5000)
    assert s.shape == (5000,)
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_gmm_statistics_match_components():
    gm = GaussianMixture([-10, 10], [-10, 10], [1.0], [0.5], [0.1],
                         num_samples=1e4)
    s = gm.sample(20000)
    assert abs(np.mean(s) - 0.5) < 0.01
    assert abs(np.std(s) - 0.1) < 0.01


def test_cvar_front_is_mean_of_low_tail():
    samples = np.arange(100, dtype=float)  # 0..99
    d = Density([0, 99], [0, 99], lambda n: np.random.rand(int(n)))
    cvar, thres = d.cvar(0.2, front=True, samples=samples)
    # worst (lowest) 20%: values strictly below the 20th percentile
    expect_thres = np.percentile(samples, 20)
    assert thres == expect_thres
    assert cvar == np.mean(samples[samples < expect_thres])


def test_cvar_back_is_mean_of_high_tail():
    samples = np.arange(100, dtype=float)
    d = Density([0, 99], [0, 99], lambda n: np.random.rand(int(n)))
    cvar, thres = d.cvar(0.1, front=False, samples=samples)
    assert cvar == np.mean(samples[samples > thres])


def test_get_pmf_structure():
    gm = GaussianMixture([0, 1.0], [0, 1.0], [1.0], [0.5], [0.1],
                         num_samples=1e4)
    values, pmf = gm.get_pmf(num_bins=20)
    # 20 interior bins + pinned min + pinned max
    assert len(values) == 22 and len(pmf) == 22
    assert values[0] == 0.0 and values[-1] == 1.0
    assert pmf[0] == 0.0 and pmf[-1] == 0.0
    assert np.isclose(np.sum(pmf), 1.0)
    # interior bin centers ascend
    assert np.all(np.diff(values) > 0)


def test_pmf_without_minmax_bins():
    gm = GaussianMixture([0, 1.0], [0, 1.0], [1.0], [0.5], [0.1],
                         num_samples=1e4)
    values, pmf = gm.get_pmf(num_bins=10, include_min_max=False)
    assert len(values) == 10
    assert np.isclose(np.sum(pmf), 1.0)


def test_gmm_invalid_weights_rejected():
    with pytest.raises(AssertionError):
        GaussianMixture([0, 1], [0, 1], [0.5, 0.4], [0, 1], [0.1, 0.1])
