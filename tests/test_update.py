"""Softmax control update vs oracle (reference: mppi_numba/mppi.py:1113-1191)."""

import numpy as np

import jax.numpy as jnp

from mppi_numba_tpu.ops.update import update_useq

import oracle


def test_update_matches_oracle():
    rng = np.random.RandomState(0)
    K, T = 64, 12
    costs = (rng.rand(K) * 50).astype(np.float32)
    noise = rng.randn(K, T, 2).astype(np.float32)
    u_cur = rng.uniform(-1, 1, size=(T, 2)).astype(np.float32)
    vrange = np.array([0.0, 2.0], np.float32)
    wrange = np.array([-1.0, 1.0], np.float32)
    lam = np.float32(0.8)

    u_new, w = update_useq(jnp.asarray(costs), jnp.asarray(noise),
                           jnp.asarray(u_cur), jnp.asarray(lam),
                           jnp.asarray(vrange), jnp.asarray(wrange))
    u_exp, w_exp = oracle.update_useq(costs, noise, u_cur.copy(), lam,
                                      vrange, wrange)
    np.testing.assert_allclose(np.asarray(w), w_exp, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(u_new), u_exp, rtol=1e-5, atol=1e-6)


def test_update_weights_normalized_and_best_dominates():
    costs = np.array([10.0, 1.0, 50.0, 30.0], np.float32)
    noise = np.zeros((4, 3, 2), np.float32)
    u_cur = np.zeros((3, 2), np.float32)
    _, w = update_useq(jnp.asarray(costs), jnp.asarray(noise),
                       jnp.asarray(u_cur), jnp.float32(1.0),
                       jnp.asarray(np.array([-1, 1], np.float32)),
                       jnp.asarray(np.array([-1, 1], np.float32)))
    w = np.asarray(w)
    assert np.isclose(w.sum(), 1.0)
    assert w.argmax() == 1


def test_update_clips_to_ranges():
    costs = np.zeros(2, np.float32)
    noise = np.full((2, 4, 2), 10.0, np.float32)
    u_cur = np.zeros((4, 2), np.float32)
    u_new, _ = update_useq(jnp.asarray(costs), jnp.asarray(noise),
                           jnp.asarray(u_cur), jnp.float32(1.0),
                           jnp.asarray(np.array([0.0, 2.0], np.float32)),
                           jnp.asarray(np.array([-0.5, 0.5], np.float32)))
    u_new = np.asarray(u_new)
    assert (u_new[:, 0] == 2.0).all()
    assert (u_new[:, 1] == 0.5).all()
