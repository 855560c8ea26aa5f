"""Full-solve backend parity on CPU via interpret-mode Pallas kernels.

tests/test_pallas_kernel.py pins the KERNELS against the XLA rollout core;
this file pins the SOLVER's backend wiring — bin/mask/risk packing, task-vec
construction, ROI cropping, payload plumbing — by running the complete
jitted solve (sampling → packing → rollout → CVaR → update) through each
backend and comparing against the XLA semantics oracle.  The "<kernel>_interpret"
backend suffix (solver.make_rollout_backend) makes this runnable without TPU
hardware; scripts/tpu_parity_check.py repeats the kernel comparisons compiled
on the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.solver import get_terrain_solver
from mppi_numba_tpu.types import MapInputs, TerrainTask

K, T, H, W, B = 128, 12, 21, 30, 8


def build(mode, roi, B=B):
    M = 8 if mode == "tdm" else 1
    rng = np.random.RandomState(3)
    raw = rng.randint(1, 100, size=(B, H, W)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    qbins = np.sort(rng.choice(101, size=B, replace=False)).astype(np.int8)
    maps = MapInputs(
        lin_pmf=jnp.asarray(pmf), ang_pmf=jnp.asarray(pmf),
        lin_qbins=jnp.asarray(qbins), ang_qbins=jnp.asarray(qbins),
        obstacle=jnp.asarray((rng.rand(H, W) < 0.05).astype(np.int8)),
        unknown=jnp.asarray((rng.rand(H, W) < 0.05).astype(np.int8)),
        risk=jnp.asarray(rng.randint(20, 101, (H, W)).astype(np.int8)))
    f32 = np.float32
    task = TerrainTask(
        x0=jnp.asarray(np.array([4.0, 3.0, 0.3], f32)),
        xgoal=jnp.asarray(np.array([W * 0.6, H * 0.6], f32)),
        goal_tolerance=f32(0.5), v_post_rollout=f32(0.01),
        lambda_weight=f32(1.0),
        u_std=jnp.asarray(np.array([1.0, 1.5], f32)),
        vrange=jnp.asarray(np.array([0.0, 2.0], f32)),
        wrange=jnp.asarray(np.array([-3.0, 3.0], f32)),
        dt=f32(0.1), dist_weight=f32(1.0), obs_penalty=f32(1e4),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(1.0),
        xlim0=f32(0.0), ylim0=f32(0.0), lin_lb=f32(0.0),
        lin_ratio=f32(0.01), ang_lb=f32(0.0), ang_ratio=f32(0.01),
        cvar_alpha=f32(1.0))

    def static_for(backend):
        return SolverStatic(
            mode=mode, num_steps=T, num_control_rollouts=K,
            num_grid_samples=M, map_shape=(H, W), num_obstacles=0,
            cvar_numel=3 if M > 1 else 1, num_opt=1,
            num_vis_state_rollouts=1, backend=backend, roi_shape=roi,
            num_pmf_bins=B)

    return maps, task, static_for


@pytest.mark.parametrize("mode", ["tdm", "det_dyn", "speed_map"])
@pytest.mark.parametrize("kernel", ["pallas", "pallas_binned",
                                    "pallas_binned8"])
@pytest.mark.parametrize("roi", [None, (15, 17)])
def test_full_solve_backend_parity(mode, kernel, roi):
    maps, task, static_for = build(mode, roi)
    key = jax.random.PRNGKey(11)

    def solve(backend):
        fn = get_terrain_solver(static_for(backend))
        return fn(key, maps, task, jnp.zeros((T, 2), jnp.float32))

    u_ref, aux_ref = solve("xla")
    u_got, aux_got = solve(kernel + "_interpret")
    # Identical keys -> identical sampled maps and noise in both backends;
    # rollout costs agree to float precision, the softmax update amplifies
    # ~1e-6 cost deltas into ~1e-4 control deltas.
    np.testing.assert_allclose(np.asarray(aux_got.costs),
                               np.asarray(aux_ref.costs),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-3)


def test_resolve_backend_routing_over16_bins(monkeypatch):
    """On TPU (monkeypatched), realistic >16-bin maps route to the
    byte-pair kernel instead of the XLA fallback; <=16-bin maps keep the
    nibble kernel; tiny maps keep the byte kernel."""
    from mppi_numba_tpu import solver as solver_mod
    from mppi_numba_tpu.config import SolverStatic

    monkeypatch.setattr(solver_mod.jax, "default_backend", lambda: "tpu")

    def static_for(bins, shape, mode="tdm"):
        m = 1024 if mode == "tdm" else 1
        return SolverStatic(
            mode=mode, num_steps=100, num_control_rollouts=1024,
            num_grid_samples=m, map_shape=shape, num_obstacles=0,
            cvar_numel=205 if m > 1 else 1, num_opt=1,
            num_vis_state_rollouts=1, num_pmf_bins=bins)

    assert solver_mod.resolve_backend(static_for(22, (11, 11))) == "pallas"
    assert solver_mod.resolve_backend(
        static_for(12, (140, 84))) == "pallas_binned"
    # <=4-bin TDMs on realistic maps route to the 2-bit crumb plane (half
    # the nibble walk); 5 bins no longer fit a crumb.
    assert solver_mod.resolve_backend(
        static_for(4, (140, 84))) == "pallas_binned2"
    assert solver_mod.resolve_backend(
        static_for(4, (250, 250))) == "pallas_binned2"
    # >4 bins at 250x250 x M=1024: the resident nibble tile is VMEM-forced
    # down to 64 while streaming runs 256 — auto prefers the HBM-streaming
    # walk there (measured 18.7 vs 17.7 ms, BENCH_BIGMAP.jsonl round 5).
    assert solver_mod.resolve_backend(
        static_for(5, (250, 250))) == "pallas_binned_stream"
    # ...while tiny maps keep the single-gather byte kernel even at 4 bins.
    assert solver_mod.resolve_backend(static_for(4, (11, 11))) == "pallas"
    assert solver_mod.resolve_backend(
        static_for(22, (140, 84))) == "pallas_binned8"
    assert solver_mod.resolve_backend(
        static_for(22, (250, 250))) == "pallas_binned8_stream"
    # >16-bin mid map: the byte kernel's unrolled walk is still short
    # (1600 cells = 13 chunks <= MAX_UNROLLED_CHUNKS_BYTE=16 — the byte
    # routing keeps its own cutoff; the banded kernels' crossover is 8).
    assert solver_mod.resolve_backend(static_for(22, (40, 40))) == "pallas"
    # >16-bin LARGE map in a det mode (M=1): the byte kernel fits VMEM but
    # its walk has no banding — a 250x250 map would unroll 489 chunks.
    # Must route to the banded byte-pair kernel instead.
    assert solver_mod.resolve_backend(
        static_for(22, (250, 250), mode="det_dyn")) == "pallas_binned8"
    assert solver_mod.resolve_backend(
        static_for(22, (250, 250), mode="speed_map")) == "pallas_binned8"


@pytest.mark.parametrize("mode", ["tdm", "det_dyn", "speed_map"])
@pytest.mark.parametrize("roi", [None, (15, 17)])
def test_full_solve_4bin_crumbs(mode, roi):
    """4-bin TDM: the crumb backend (2-bit cell plane) must match the
    oracle through the full solve, including ROI cropping and the
    speed-map risk plane."""
    maps, task, static_for = build(mode, roi, B=4)
    key = jax.random.PRNGKey(23)

    def solve(backend):
        fn = get_terrain_solver(static_for(backend))
        return fn(key, maps, task, jnp.zeros((T, 2), jnp.float32))

    u_ref, aux_ref = solve("xla")
    u_got, aux_got = solve("pallas_binned2_interpret")
    np.testing.assert_allclose(np.asarray(aux_got.costs),
                               np.asarray(aux_ref.costs),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("mode", ["tdm", "speed_map"])
def test_full_solve_stream_backend(mode):
    """The HBM-streaming cell plane ("<binned>_stream" backend suffix):
    full-solve parity against the oracle, including the VMEM-resident risk
    plane in speed-map mode."""
    maps, task, static_for = build(mode, None)
    key = jax.random.PRNGKey(29)

    def solve(backend):
        fn = get_terrain_solver(static_for(backend))
        return fn(key, maps, task, jnp.zeros((T, 2), jnp.float32))

    u_ref, aux_ref = solve("xla")
    u_got, aux_got = solve("pallas_binned_stream_interpret")
    np.testing.assert_allclose(np.asarray(aux_got.costs),
                               np.asarray(aux_ref.costs),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-3)


def test_full_solve_over16_bins_byte2():
    """22-bin TDM (the reference benchmark world's bin count): the nibble
    layout is ineligible, the byte-pair backend must match the oracle."""
    maps, task, static_for = build("tdm", None, B=22)
    key = jax.random.PRNGKey(17)

    def solve(backend):
        fn = get_terrain_solver(static_for(backend))
        return fn(key, maps, task, jnp.zeros((T, 2), jnp.float32))

    u_ref, aux_ref = solve("xla")
    u_got, aux_got = solve("pallas_binned8_interpret")
    np.testing.assert_allclose(np.asarray(aux_got.costs),
                               np.asarray(aux_ref.costs),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-3)
