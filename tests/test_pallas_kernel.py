"""Pallas rollout kernel vs the XLA rollout core, in interpreter mode.

XLA functional semantics removes the reference's race-condition class;
the Pallas kernel is instead validated in interpret mode on CPU
(SURVEY §5.2) and against the same NumPy oracle chain as the XLA core.
On real TPU hardware the compiled kernel is additionally exercised by
bench.py and __graft_entry__.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mppi_numba_tpu.ops.packing import (pack_bin_nibbles, pack_map_words,
                                        pack_mask_nibbles)
from mppi_numba_tpu.ops.pallas.rollout_kernel import (
    build_bin_luts, build_task_vec, pallas_rollout_binned_supported,
    pallas_rollout_supported, terrain_rollout_costs_pallas,
    terrain_rollout_costs_pallas_binned)
from mppi_numba_tpu.ops.rollout import (_clipped_controls_tk,
                                        terrain_rollout_costs)
from mppi_numba_tpu.types import TerrainTask


def build_problem(seed=0, K=128, M=12, T=20, H=9, W=11):
    rng = np.random.RandomState(seed)
    lin = rng.randint(0, 101, (M, H, W)).astype(np.int8)
    ang = rng.randint(0, 101, (M, H, W)).astype(np.int8)
    obs = (rng.rand(H, W) < 0.1).astype(np.int8)
    unk = (rng.rand(H, W) < 0.1).astype(np.int8)
    risk = rng.randint(1, 101, (H, W)).astype(np.int8)
    f32 = np.float32
    task = TerrainTask(
        x0=jnp.asarray([1.7, 1.3, 0.4], jnp.float32),
        xgoal=jnp.asarray([2.9, 2.6], jnp.float32),
        goal_tolerance=f32(0.3), v_post_rollout=f32(0.5),
        lambda_weight=f32(1.2),
        u_std=jnp.asarray([0.7, 1.1], jnp.float32),
        vrange=jnp.asarray([0.0, 2.0], jnp.float32),
        wrange=jnp.asarray([-2.5, 2.5], jnp.float32),
        dt=f32(0.1), dist_weight=f32(1.7), obs_penalty=f32(1e4),
        unknown_penalty=f32(1e2), alpha_dyn=f32(1.0), res=f32(0.5),
        xlim0=f32(0.0), ylim0=f32(0.0), lin_lb=f32(0.0), lin_ratio=f32(0.01),
        ang_lb=f32(0.0), ang_ratio=f32(0.01))
    u_cur = jnp.asarray(rng.uniform(-0.5, 1.5, (T, 2)).astype(np.float32))
    noise = jnp.asarray((rng.randn(K, T, 2) * np.array([0.7, 1.1])
                         ).astype(np.float32))
    return task, lin, ang, obs, unk, risk, u_cur, noise


@pytest.mark.parametrize("speed_map", [False, True])
def test_pallas_kernel_matches_xla_rollout(speed_map):
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem()
    T = u_cur.shape[0]
    H, W = lin.shape[1:]
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if speed_map else None)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=speed_map))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=T, speed_map=speed_map, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pallas_kernel_odd_shapes():
    """M not multiple of the sublane tile; map smaller than one lane chunk."""
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
        seed=3, K=128, M=5, T=10, H=4, W=6)
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk))
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=4, W=6, T=10, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_supported_predicate():
    assert pallas_rollout_supported(1024, 225)
    assert pallas_rollout_supported(32, 104 * 104)
    assert not pallas_rollout_supported(1024, 250 * 250)


def test_pallas_kernel_multichunk_map():
    """Map wider than one 128-lane chunk exercises the chunk-select path."""
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
        seed=5, K=128, M=8, T=15, H=13, W=15)   # 195 cells -> 2 chunks
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk))
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=13, W=15, T=15, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


# -- bin-packed kernel -------------------------------------------------------

def build_binned_problem(seed=0, K=128, M=12, T=20, H=9, W=11, B=12,
                         with_risk=False):
    """Bin-index maps + the equivalent byte-packed words for the oracle."""
    task, _, _, obs, unk, risk, u_cur, noise = build_problem(
        seed=seed, K=K, M=M, T=T, H=H, W=W)
    rng = np.random.RandomState(seed + 100)
    qbins = np.sort(rng.choice(101, size=B, replace=False)).astype(np.int8)
    lin_bins = rng.randint(0, B, (M, H, W))
    ang_bins = rng.randint(0, B, (M, H, W))
    lin_vals = qbins[lin_bins]
    ang_vals = qbins[ang_bins]
    packed = pack_map_words(jnp.asarray(lin_vals), jnp.asarray(ang_vals),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if with_risk else None)
    nib = pack_bin_nibbles(jnp.asarray(lin_bins), jnp.asarray(ang_bins))
    maskw = pack_mask_nibbles(jnp.asarray(obs), jnp.asarray(unk))
    lut = build_bin_luts(task, jnp.asarray(qbins), jnp.asarray(qbins))
    if with_risk:
        return task, packed, nib, maskw, lut, u_cur, noise, jnp.asarray(risk)
    return task, packed, nib, maskw, lut, u_cur, noise


@pytest.mark.parametrize("shape", [(9, 11),     # single nibble chunk
                                   (40, 40),    # 4 nibble chunks, 1 mask
                                   (60, 47)])   # 6 nibble chunks, 2 mask
def test_binned_kernel_matches_xla_rollout(shape):
    H, W = shape
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=2, K=128, M=12, T=18, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=18, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(9, 11),     # single chunk: direct gather
                                   (40, 40),    # unrolled walks
                                   (96, 92)])   # banded walks (18 chunks)
def test_binned_kernel_speed_map_matches_xla(shape):
    """Speed-map mode on the bin-packed kernel (round-3 item: the IROS-22
    speed-map / costmap method's realistic-map fast path): the shared risk
    plane must reproduce the XLA oracle's dt / (decoded risk) stage cost."""
    from mppi_numba_tpu.ops.packing import pack_risk_bytes

    H, W = shape
    task, packed, nib, maskw, lut, u_cur, noise, risk = build_binned_problem(
        seed=6, K=128, M=4, T=15, H=H, W=W, with_risk=True)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=True))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    riskw = pack_risk_bytes(risk)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all, riskw,
        H=H, W=W, T=15, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_binned_kernel_banded_walk_path():
    """Maps beyond MAX_UNROLLED_CHUNKS take the reachability-banded dynamic
    chunk loop (dynamic fori_loop bounds + dynamic major-dim ref indexing);
    it must agree with the XLA oracle exactly like the unrolled walk."""
    from mppi_numba_tpu.ops.pallas.rollout_kernel import (
        MAX_UNROLLED_CHUNKS, NIB_CELLS_PER_CHUNK)

    H, W = 96, 92           # 8832 cells -> 18 nibble chunks > threshold
    assert -(-H * W // NIB_CELLS_PER_CHUNK) > MAX_UNROLLED_CHUNKS
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=11, K=128, M=8, T=12, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=12, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("cell_bits,band_anchor,t_unroll,stream", [
    (4, 4, 4, False),  # production config (solver passes anchor = t_unroll)
    (4, 2, 4, False),  # anchor smaller than the unroll group
    (4, 5, 5, False),  # T=12 -> 2 groups + 2-step per-step-band tail
    (2, 4, 4, False),  # crumb plane
    # Stream path ignores band_anchor unless stream_group is explicitly
    # requested (group-resident windows measured 2x worse on hardware, see
    # rollout_kernel.py) — this case pins that passing an anchor with
    # stream=True stays correct and per-step-banded.
    (4, 4, 4, True),
])
def test_binned_kernel_group_band(cell_bits, band_anchor, t_unroll, stream):
    """Group-banded walk (band_anchor > 1): one exact occupancy reduction
    per group, later in-group steps widen it by the per-step displacement
    bound (build_task_vec idx 18).  The margin must cover every visited
    cell, so costs match the oracle bitwise-tight just like the per-step
    band (round-5 addition; gated on models.has_displacement_bound)."""
    from mppi_numba_tpu.ops.pallas.rollout_kernel import (
        NIB_CELLS_PER_CHUNK, CRUMB_CELLS_PER_CHUNK)

    H, W = 96, 92
    if cell_bits == 4:
        task, packed, plane, maskw, lut, u_cur, noise = build_binned_problem(
            seed=23, K=128, M=8, T=12, H=H, W=W)
        cpc = NIB_CELLS_PER_CHUNK
    else:
        task, packed, plane, maskw, lut, u_cur, noise = build_crumb_problem(
            seed=23, K=128, M=8, T=12, H=H, W=W)
        cpc = CRUMB_CELLS_PER_CHUNK
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        plane, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=12, interpret=True, cell_bits=cell_bits,
        max_unrolled=0, band_anchor=band_anchor, t_unroll=t_unroll,
        stream=stream, stream_band=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("stream_slots", [9, 2, 3])
def test_group_resident_stream_matches_oracle(stream_slots):
    """Opt-in group-resident streaming (stream_group=True): windows DMA'd
    once per anchor group into static slots, walked by every in-group step;
    bands wider than the resident slots spill through the last slot.
    Covers resident-only (9), spill-heavy (2: one resident window), and
    mixed (3) configurations.  Kept opt-in: measured 2x slower than
    per-step streaming on hardware (the static all-slots walk dominates),
    but the path must stay correct for future hardware where DMA is the
    bottleneck."""
    H, W = 160, 128
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=41, K=128, M=8, T=14, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                        task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=14, interpret=True, stream=True, stream_band=4,
        t_unroll=4, band_anchor=4, stream_group=True,
        stream_slots=stream_slots))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_task_vec_displacement_bound_covers_int8_ceiling():
    """build_task_vec idx 18 (the group-band margin source) must bound the
    per-step cell displacement for EVERY decodable traction — int8 cell
    values reach 127, above the nominal 0..100 quantization range (round-5
    review finding; a too-small bound lets rollouts outrun the anchor band
    and silently decode zero traction)."""
    task, *_ = build_problem(seed=1)
    f32 = np.float32
    task = task._replace(res=f32(0.12),
                         vrange=jnp.asarray([0.0, 3.0], jnp.float32))
    tv = np.asarray(build_task_vec(task))
    true_reach = (3.0 * (float(task.lin_lb) + float(task.lin_ratio) * 127.0)
                  * float(task.dt) / float(task.res))
    assert tv[0, 18] >= true_reach - 1e-5, (tv[0, 18], true_reach)


def test_group_band_parity_with_over100_bin_values():
    """End-to-end interpret-mode parity with bin values up to 127 under
    the group-anchored band (companion to the direct bound test above)."""
    H, W = 96, 92
    task, _, _, obs, unk, risk, u_cur, noise = build_problem(
        seed=31, K=128, M=8, T=12, H=H, W=W)
    # Parameters chosen so the margin DISCRIMINATES: with vmax=3 and
    # res=0.12 the true per-step reach at value 127 is 3*1.27*0.1/0.12 =
    # 3.18 cells, while the old 100-based bound gave floor(2.5*1.01)+1 = 3
    # — strictly too small — and the 127 bound gives floor(3.2)+1 = 4.
    f32 = np.float32
    task = task._replace(res=f32(0.12),
                         vrange=jnp.asarray([0.0, 3.0], jnp.float32))
    rng = np.random.RandomState(31)
    B = 12
    # Force the top of the int8 range into the support.
    qbins = np.sort(np.concatenate([
        rng.choice(100, size=B - 2, replace=False),
        [120, 127]])).astype(np.int8)
    lin_bins = rng.randint(0, B, (8, H, W))
    ang_bins = rng.randint(0, B, (8, H, W))
    packed = pack_map_words(jnp.asarray(qbins[lin_bins]),
                            jnp.asarray(qbins[ang_bins]),
                            jnp.asarray(obs), jnp.asarray(unk))
    nib = pack_bin_nibbles(jnp.asarray(lin_bins), jnp.asarray(ang_bins))
    maskw = pack_mask_nibbles(jnp.asarray(obs), jnp.asarray(unk))
    lut = build_bin_luts(task, jnp.asarray(qbins), jnp.asarray(qbins))
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                        task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=12, interpret=True, max_unrolled=0, band_anchor=4,
        t_unroll=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("cell_bits,shape,stream_band", [
    (4, (40, 40), 8),    # fewer cell chunks than one DMA window (clamp path)
    (4, (160, 128), 8),  # 40 chunks -> multi-window streaming
    (2, (160, 128), 8),  # crumb plane, 20 chunks
    (8, (96, 92), 8),    # byte-pair plane, 35 chunks
    (4, (160, 128), 4),  # narrow DMA window: more windows, odd/even tails
    (4, (160, 128), 16), # wide DMA window: heavy tail clamping / over-fetch
])
def test_stream_kernel_matches_xla_rollout(cell_bits, shape, stream_band):
    """HBM-streaming cell plane (stream=True): the full plane stays in
    ANY/HBM and the kernel DMAs the exact-occupancy band window per step
    into VMEM scratch — must match the oracle exactly like the resident
    walks (VERDICT r3 item 6).  ``stream_band`` sweeps the window width
    the tuning probe exposes."""
    H, W = shape
    if cell_bits == 4:
        task, packed, plane, maskw, lut, u_cur, noise = build_binned_problem(
            seed=17, K=128, M=8, T=12, H=H, W=W)
    elif cell_bits == 2:
        task, packed, plane, maskw, lut, u_cur, noise = build_crumb_problem(
            seed=18, K=128, M=8, T=12, H=H, W=W)
    else:
        task, packed, plane, maskw, u_cur, noise = build_byte2_problem(
            seed=19, K=128, M=8, T=12, H=H, W=W)
        lut = None
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        plane, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=12, interpret=True, cell_bits=cell_bits, stream=True,
        stream_band=stream_band))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_stream_kernel_multi_window_bands():
    """A model whose translation is 10x the unicycle bound spreads each
    step's occupancy band across many chunks, forcing multi-window
    streaming with odd/even tails — the double-buffered pair loop's
    predicated waits and stale-slot validity masking must stay exact."""
    def warp_step(x, y, th, v, w, lin_tr, ang_tr, dt):
        return (x + dt * 10.0 * v * jnp.cos(th),
                y + dt * 10.0 * v * jnp.sin(th), th + dt * w)

    H, W = 160, 128
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=23, K=128, M=8, T=10, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           step_fn=warp_step))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=10, interpret=True, step_fn=warp_step, stream=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_stream_kernel_speed_map_and_t_unroll():
    """stream=True composes with the shared risk plane (still
    VMEM-resident) and horizon-loop unrolling."""
    from mppi_numba_tpu.ops.packing import pack_risk_bytes

    H, W = 100, 100
    task, packed, nib, maskw, lut, u_cur, noise, risk = build_binned_problem(
        seed=21, K=128, M=4, T=14, H=H, W=W, with_risk=True)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=True))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        pack_risk_bytes(risk), H=H, W=W, T=14, interpret=True,
        stream=True, t_unroll=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("banded", [True, False])
def test_banded_walk_exact_for_unbounded_models(banded):
    """A custom model whose translation exceeds dt*lin_tr*|v| escaped
    round 2's reachability band (which assumed per-step displacement
    <= dt*lin_tr*|v| around x0's row).  The round-3 exact-occupancy band
    derives the chunk range from a min/max reduction of the ACTUAL visited
    cells each step, so banded=True is correct for arbitrary dynamics —
    including this 10x teleporting model — as is the banded=False
    walk-everything escape hatch."""
    def warp_step(x, y, th, v, w, lin_tr, ang_tr, dt):
        return (x + dt * 10.0 * v * jnp.cos(th),
                y + dt * 10.0 * v * jnp.sin(th), th + dt * w)

    H, W = 160, 128         # 20480 cells -> 40 nibble chunks, banded regime
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=13, K=128, M=8, T=10, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           step_fn=warp_step))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=10, interpret=True, step_fn=warp_step, banded=banded))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    # The displacement-bound registry still gates ROI sizing on the host
    # (mppi.py::_roi_shape); unregistered models must report no bound.
    from mppi_numba_tpu.models import has_displacement_bound
    assert not has_displacement_bound("definitely-not-registered")


def test_binned_kernel_odd_m_and_small_tile():
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=4, K=128, M=5, T=10, H=21, W=30)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=21, W=30, T=10, interpret=True, m_tile=8))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_binned_supported_predicate():
    # Flagship M=1024 on the forest TDM (138x82 padded ~140x84) fits.
    assert pallas_rollout_binned_supported(1024, 140 * 84, 100, 12)
    # ...and on a reference-max 250x250 map via a smaller sublane tile.
    assert pallas_rollout_binned_supported(1024, 250 * 250, 100, 12)
    # >16 bins cannot nibble-pack...
    assert pallas_rollout_binned_supported(1024, 140 * 84, 100, 17) is None
    # ...but the byte-pair layout has no bin limit and still fits both
    # realistic shapes at flagship M (2x the nibble layout's chunk count).
    assert pallas_rollout_binned_supported(1024, 140 * 84, 100, 22,
                                           cell_bits=8)
    assert pallas_rollout_binned_supported(1024, 250 * 250, 100, 22,
                                           cell_bits=8)


# -- crumb (cell_bits=2) cell plane: <=4-bin TDMs ----------------------------

def build_crumb_problem(seed=0, K=128, M=12, T=20, H=9, W=11, B=4,
                        with_risk=False):
    """<=4-bin maps: 2-bit crumb plane for the kernel (1024 cells/chunk,
    half the nibble walk), byte words for the oracle."""
    from mppi_numba_tpu.ops.packing import pack_bin_crumbs

    assert B <= 4
    task, _, _, obs, unk, risk, u_cur, noise = build_problem(
        seed=seed, K=K, M=M, T=T, H=H, W=W)
    rng = np.random.RandomState(seed + 300)
    qbins = np.sort(rng.choice(101, size=B, replace=False)).astype(np.int8)
    lin_bins = rng.randint(0, B, (M, H, W))
    ang_bins = rng.randint(0, B, (M, H, W))
    packed = pack_map_words(jnp.asarray(qbins[lin_bins]),
                            jnp.asarray(qbins[ang_bins]),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if with_risk else None)
    crumbs = pack_bin_crumbs(jnp.asarray(lin_bins), jnp.asarray(ang_bins))
    maskw = pack_mask_nibbles(jnp.asarray(obs), jnp.asarray(unk))
    lut = build_bin_luts(task, jnp.asarray(qbins), jnp.asarray(qbins))
    if with_risk:
        return task, packed, crumbs, maskw, lut, u_cur, noise, jnp.asarray(risk)
    return task, packed, crumbs, maskw, lut, u_cur, noise


@pytest.mark.parametrize("shape", [(9, 11),      # single 1024-cell chunk
                                   (40, 40),     # 2 chunks, unrolled walk
                                   (160, 128)])  # 20 chunks -> banded walk
def test_crumb_kernel_matches_xla_rollout(shape):
    H, W = shape
    task, packed, crumbs, maskw, lut, u_cur, noise = build_crumb_problem(
        seed=31, K=128, M=8, T=12, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        crumbs, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=12, interpret=True, cell_bits=2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(40, 40),     # all walks unrolled
                                   (100, 100),   # ONLY the risk walk banded
                                   #  (10 cell / 5 mask / 20 risk chunks) —
                                   #  regression: the use_band gate must
                                   #  count the risk plane or its banded
                                   #  walk reads unassigned cell_lo/cell_hi
                                   (160, 128)])  # cell + risk walks banded
def test_crumb_kernel_speed_map_matches_xla(shape):
    """cell_bits=2 with the shared risk plane: the cell plane walks 1024
    cells/chunk while the risk plane keeps its 512-cells/chunk layout."""
    from mppi_numba_tpu.ops.packing import pack_risk_bytes

    H, W = shape
    task, packed, crumbs, maskw, lut, u_cur, noise, risk = build_crumb_problem(
        seed=32, K=128, M=4, T=12, H=H, W=W, with_risk=True)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=True))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        crumbs, maskw, lut, build_task_vec(task), v_all, w_all,
        pack_risk_bytes(risk), H=H, W=W, T=12, interpret=True, cell_bits=2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_crumb_supported_predicate():
    # <=4-bin TDMs crumb-pack at flagship M on both realistic shapes...
    assert pallas_rollout_binned_supported(1024, 140 * 84, 100, 4,
                                           cell_bits=2)
    assert pallas_rollout_binned_supported(1024, 250 * 250, 100, 4,
                                           cell_bits=2)
    # ...but 5+ bins don't fit 2 bits.
    assert pallas_rollout_binned_supported(1024, 140 * 84, 100, 5,
                                           cell_bits=2) is None


# -- byte-pair (cell_bits=8) cell plane: >16-bin TDMs ------------------------

def build_byte2_problem(seed=0, K=128, M=8, T=15, H=9, W=11, B=22,
                        with_risk=False):
    """>16-bin maps: value byte pairs for the kernel, byte words for the
    oracle (the reference benchmark world quantizes to 22 bins —
    reference: benchmark.ipynb[cell 2], terrain.py:380-508)."""
    from mppi_numba_tpu.ops.packing import pack_byte_pairs

    task, _, _, obs, unk, risk, u_cur, noise = build_problem(
        seed=seed, K=K, M=M, T=T, H=H, W=W)
    rng = np.random.RandomState(seed + 200)
    qbins = np.sort(rng.choice(101, size=B, replace=False)).astype(np.int8)
    lin_vals = qbins[rng.randint(0, B, (M, H, W))]
    ang_vals = qbins[rng.randint(0, B, (M, H, W))]
    packed = pack_map_words(jnp.asarray(lin_vals), jnp.asarray(ang_vals),
                            jnp.asarray(obs), jnp.asarray(unk),
                            jnp.asarray(risk) if with_risk else None)
    b2 = pack_byte_pairs(jnp.asarray(lin_vals), jnp.asarray(ang_vals))
    maskw = pack_mask_nibbles(jnp.asarray(obs), jnp.asarray(unk))
    if with_risk:
        return task, packed, b2, maskw, u_cur, noise, jnp.asarray(risk)
    return task, packed, b2, maskw, u_cur, noise


@pytest.mark.parametrize("shape", [(9, 11),     # single 256-cell chunk
                                   (40, 40),    # 7 chunks, unrolled walk
                                   (96, 92)])   # 35 chunks -> banded walk
def test_byte2_kernel_matches_xla_rollout(shape):
    H, W = shape
    task, packed, b2, maskw, u_cur, noise = build_byte2_problem(
        seed=15, K=128, M=8, T=15, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        b2, maskw, None, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=15, interpret=True, cell_bits=8))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(40, 40),    # risk walk unrolled
                                   (96, 92)])   # cell banded, risk banded
def test_byte2_kernel_speed_map_matches_xla(shape):
    """cell_bits=8 with the shared risk plane: the cell plane walks 256
    cells/chunk while the risk plane keeps its own 512-cells/chunk layout
    (different chunk counts — the regression this test pins)."""
    from mppi_numba_tpu.ops.packing import pack_risk_bytes

    H, W = shape
    task, packed, b2, maskw, u_cur, noise, risk = build_byte2_problem(
        seed=16, K=128, M=4, T=15, H=H, W=W, with_risk=True)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           speed_map=True))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        b2, maskw, None, build_task_vec(task), v_all, w_all,
        pack_risk_bytes(risk), H=H, W=W, T=15, interpret=True, cell_bits=8))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("band_unroll", [1, 8])
def test_banded_walk_chunk_unroll_matches_oracle(band_unroll):
    """``band_unroll`` (chunks per banded-walk iteration) is a pure
    scheduling knob: over-shot chunks are clamped-and-masked, so any value
    must be semantics-identical (the tuning probe sweeps it on hardware)."""
    H, W = 96, 92           # banded regime (18 nibble chunks)
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=23, K=128, M=8, T=12, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=12, interpret=True, band_unroll=band_unroll))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_byte2_kernel_t_unroll_matches_oracle():
    H, W = 96, 92
    task, packed, b2, maskw, u_cur, noise = build_byte2_problem(
        seed=17, K=128, M=8, T=18, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        b2, maskw, None, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=18, interpret=True, cell_bits=8, t_unroll=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


# -- fast_trig coverage off-hardware (VERDICT round 1 item 7) ---------------

@pytest.mark.parametrize("kernel", ["byte", "binned"])
def test_fast_trig_kernels_match_xla_loosely(kernel):
    """The Maclaurin-rotation production path vs exact trig, on a smooth
    cost surface (no obstacles; penalties amplify 1e-6 perturbations across
    cell boundaries, see the kernel docstring)."""
    if kernel == "byte":
        task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(
            seed=7, K=128, M=12, T=20, H=13, W=15)
        obs[:] = 0
        unk[:] = 0
        # Uniform traction rows -> no decode cliffs between cells.
        lin[:] = 70
        ang[:] = 55
        packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                                jnp.asarray(obs), jnp.asarray(unk))
        ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
        v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                            task.wrange)
        got = np.asarray(terrain_rollout_costs_pallas(
            packed, build_task_vec(task), v_all, w_all,
            H=13, W=15, T=20, fast_trig=True, interpret=True))
    else:
        task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
            seed=7, K=128, M=12, T=20, H=13, W=15, B=1)
        maskw = maskw * 0
        packed = None
        ref_packed = pack_map_words(
            jnp.full((12, 13, 15), 70, jnp.int8),
            jnp.full((12, 13, 15), 70, jnp.int8),
            jnp.zeros((13, 15), jnp.int8), jnp.zeros((13, 15), jnp.int8))
        nib = jnp.zeros_like(nib)
        lut = jnp.zeros((8, 128), jnp.float32).at[:2, 0].set(0.70)
        ref = np.asarray(terrain_rollout_costs(ref_packed, task, u_cur,
                                               noise))
        v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange,
                                            task.wrange)
        got = np.asarray(terrain_rollout_costs_pallas_binned(
            nib, maskw, lut, build_task_vec(task), v_all, w_all,
            H=13, W=15, T=20, fast_trig=True, interpret=True))
    # max |dth| = dt * wmax * ang_tr <= 0.1 * 2.5 * 0.55; degree-4/5
    # Maclaurin error there is ~1e-7 per step, compounding across T=20.
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("kernel", ["byte", "binned"])
def test_pluggable_model_traces_into_kernels(kernel):
    """Registered step fns are pure elementwise jnp, so non-unicycle models
    run inside the fused kernels too (exact-trig path)."""
    from mppi_numba_tpu.models import bicycle_step

    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=9, K=128, M=8, T=15, H=13, W=15)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise,
                                           step_fn=bicycle_step))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    if kernel == "byte":
        got = np.asarray(terrain_rollout_costs_pallas(
            packed, build_task_vec(task), v_all, w_all,
            H=13, W=15, T=15, interpret=True, step_fn=bicycle_step))
    else:
        got = np.asarray(terrain_rollout_costs_pallas_binned(
            nib, maskw, lut, build_task_vec(task), v_all, w_all,
            H=13, W=15, T=15, interpret=True, step_fn=bicycle_step))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_maclaurin_rotation_error_bound():
    """Property test: the kernel's rotation polynomials stay within their
    truncation bounds over the guard range |dth| <= 0.6 (the planner enables
    fast_trig only under that bound, mppi.py): degree-4 cos error
    ~ dth^6/720 <= 6.5e-5, degree-5 sin error ~ dth^7/5040 <= 5.6e-6."""
    dth = np.linspace(-0.6, 0.6, 20001)
    z2 = dth * dth
    cd = 1.0 - z2 * (0.5 - z2 * (1.0 / 24.0))
    sd = dth * (1.0 - z2 * ((1.0 / 6.0) - z2 * (1.0 / 120.0)))
    assert np.max(np.abs(cd - np.cos(dth))) < 7e-5
    assert np.max(np.abs(sd - np.sin(dth))) < 6e-6
    # At the typical benchmark increment (dt=0.1 * |w|<=pi * traction<=1,
    # |dth| <= 0.315) the rotation is float32-exact territory.
    small = np.abs(dth) <= 0.315
    assert np.max(np.abs(cd[small] - np.cos(dth[small]))) < 2e-6
    assert np.max(np.abs(sd[small] - np.sin(dth[small]))) < 1e-7


@pytest.mark.parametrize("t_unroll", [2, 4, 7])
def test_time_loop_unroll_matches_oracle(t_unroll):
    """``t_unroll`` processes several horizon steps per fori_loop iteration
    (with a static remainder tail: T=18 is not divisible by 4 or 7); it is
    a pure scheduling knob and must be bit-equivalent on both kernels."""
    # Byte-packed kernel.
    task, lin, ang, obs, unk, risk, u_cur, noise = build_problem(T=18)
    H, W = lin.shape[1:]
    packed = pack_map_words(jnp.asarray(lin), jnp.asarray(ang),
                            jnp.asarray(obs), jnp.asarray(unk), None)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas(
        packed, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=18, interpret=True, t_unroll=t_unroll))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    # Bin-packed kernel, banded regime (exact-occupancy band inside the
    # unrolled body).
    H, W = 96, 92
    task, packed, nib, maskw, lut, u_cur, noise = build_binned_problem(
        seed=21, K=128, M=8, T=18, H=H, W=W)
    ref = np.asarray(terrain_rollout_costs(packed, task, u_cur, noise))
    v_all, w_all = _clipped_controls_tk(u_cur, noise, task.vrange, task.wrange)
    got = np.asarray(terrain_rollout_costs_pallas_binned(
        nib, maskw, lut, build_task_vec(task), v_all, w_all,
        H=H, W=W, T=18, interpret=True, t_unroll=t_unroll))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
