"""Functional solver core: one fused, jitted program per solve.

The reference's ``solve()`` issues 4-5 separate kernel launches with host
round-trips between them (sample maps -> sample noise -> rollout -> update;
reference: mppi_numba/mppi.py:378-451).  Here the entire optimization
iteration — map sampling, bit-packing, noise draw, (K, M) rollout, CVaR
reduction, coupling, softmax update — is ONE XLA program: no host sync, no
intermediate HBM round-trips that XLA can fuse away, and the nominal control
buffer is donated so replanning updates in place.

Executables are cached per ``SolverStatic`` signature, so closed-loop
replanning compiles exactly once per problem shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import SolverStatic
from .models import clip_controls, get_step_fn, has_displacement_bound
from .ops.cvar import cvar_from_costs, cvar_from_costs_dynamic

# Sentinel for SolverStatic.cvar_numel: read the traced task.cvar_alpha
# instead of specializing the executable on a fixed top-k size.
DYNAMIC_CVAR = -1
from .ops.packing import (pack_bin_crumbs, pack_bin_nibbles, pack_byte_pairs,
                          pack_map_words, pack_mask_nibbles, pack_risk_bytes)
from .ops.pallas.rollout_kernel import (DEFAULT_T_UNROLL_BINNED,
                                        DEFAULT_T_UNROLL_BYTE, LANES,
                                        MAX_UNROLLED_CHUNKS_BYTE,
                                        build_bin_luts, build_task_vec,
                                        pallas_rollout_binned_supported,
                                        pallas_rollout_supported,
                                        terrain_rollout_costs_pallas,
                                        terrain_rollout_costs_pallas_binned)
from .ops.rollout import (_clipped_controls_tk, barebone_rollout_costs,
                          barebone_vis_states, control_coupling,
                          terrain_rollout_costs, terrain_vis_states)
from .ops.sampling import decode_bins, sample_noise, sample_traction_bins
from .ops.update import update_useq
from .types import SolveAux


def solver_map_shape(static: SolverStatic):
    """The (H, W) the rollout actually sees: the ROI window if cropping."""
    return static.roi_shape if static.roi_shape else static.map_shape


def resolve_backend(static: SolverStatic) -> str:
    """Pick the rollout implementation for a static signature.

    'auto' uses the fused byte-packed Pallas kernel on TPU whenever the
    chunked map tiles fit in VMEM, falling back to the XLA rollout elsewhere
    (CPU tests, oversized maps).
    """
    if static.backend != "auto":
        return static.backend
    if static.mode == "barebone":
        return "xla"
    H, W = solver_map_shape(static)
    if jax.default_backend() != "tpu":
        return "xla"
    byte_ok = pallas_rollout_supported(static.num_grid_samples, H * W,
                                       static.num_steps)
    # The byte kernel's chunk walk covers 128 cells per select; keep it only
    # while the walk is short.  Beyond that the 4-bit bin layout walks 4x
    # fewer chunks (and fits VMEM at flagship M on realistic maps).
    if byte_ok and H * W <= 4 * LANES:
        return "pallas"
    sm = static.mode == "speed_map"

    def _maybe_stream(name, cell_bits):
        """Prefer the HBM-streaming variant when it lifts the sublane tile
        by >= 4x over the VMEM-resident layout (a huge map forcing the
        resident tile down to 64 or 32): measured on the uncropped 250x250
        tdm at M=1024, resident m_tile=64 runs 18.7 ms vs streamed
        m_tile=256 at 17.7 ms (BENCH_BIGMAP.jsonl), and the gap widens as
        the resident tile shrinks further.  At equal tiles the resident
        walk wins (forest: 7.6 vs 10.5 ms), so smaller lifts stay put.
        When NO resident tile fits at all, streaming this layout is
        strictly better than falling through to a wider-cell one (2x the
        chunks and HBM traffic per step)."""
        m_res = pallas_rollout_binned_supported(
            static.num_grid_samples, H * W, static.num_steps,
            static.num_pmf_bins, speed_map=sm, cell_bits=cell_bits)
        m_str = pallas_rollout_binned_supported(
            static.num_grid_samples, H * W, static.num_steps,
            static.num_pmf_bins, speed_map=sm, cell_bits=cell_bits,
            stream=True)
        if not m_res:
            return name + "_stream" if m_str else None
        if m_str and m_str >= 4 * m_res:
            return name + "_stream"
        return name

    be2 = _maybe_stream("pallas_binned2", 2)
    if be2:
        # <=4-bin TDMs crumb-pack: 1024 cells/chunk halves the nibble
        # layout's chunk walk (and its VMEM) at identical decode cost.
        return be2
    be = _maybe_stream("pallas_binned", 4)
    if be:
        # All three planning modes bin-pack: speed_map walks one extra
        # shared risk-byte plane (same 512-cells/chunk layout and band).
        return be
    if byte_ok and H * W <= MAX_UNROLLED_CHUNKS_BYTE * LANES:
        # The byte kernel has no banded walk — only keep it while its
        # fully unrolled 128-cells/chunk walk stays short.
        return "pallas"
    be = _maybe_stream("pallas_binned8", 8)
    if be:
        # >16-bin TDMs on realistic maps: the nibble layout can't hold the
        # bin index and the one-word-per-cell byte layout either blows
        # VMEM (large M) or would unroll a prohibitively long walk (det
        # modes), so walk 8-bit decoded-value pairs (256 cells/chunk) —
        # everything else (banded walk, mask/risk planes, t_unroll) is
        # shared with the nibble kernel.
        return be
    if byte_ok:
        return "pallas"
    return "xla"


def _roi_start(task, full_hw, roi_hw):
    """Dynamic (row, col) start of the reachable window, clamped in-map.

    The window is centered on the robot cell; because the static window is
    sized to cover the full reachable ball (|motion| <= max|v| * traction_ub
    * T * dt) plus margin, clamping at the map edge still covers
    ball-intersect-map (see MPPIPlanner._roi_shape).
    """
    H, W = full_hw
    rH, rW = roi_hw
    cx = jnp.floor((task.x0[0] - task.xlim0) / task.res).astype(jnp.int32)
    cy = jnp.floor((task.x0[1] - task.ylim0) / task.res).astype(jnp.int32)
    oy = jnp.clip(jnp.clip(cy, 0, H - 1) - rH // 2, 0, H - rH)
    ox = jnp.clip(jnp.clip(cx, 0, W - 1) - rW // 2, 0, W - rW)
    return oy, ox


def _crop_maps(maps, oy, ox, rH, rW):
    def sl3(a):
        return jax.lax.dynamic_slice(a, (jnp.int32(0), oy, ox),
                                     (a.shape[0], rH, rW))

    def sl2(a):
        return jax.lax.dynamic_slice(a, (oy, ox), (rH, rW))

    return maps._replace(
        lin_pmf=sl3(maps.lin_pmf), ang_pmf=sl3(maps.ang_pmf),
        obstacle=sl2(maps.obstacle), unknown=sl2(maps.unknown),
        risk=sl2(maps.risk))


def _shift_task_limits(task, oy, ox):
    f32 = jnp.float32
    return task._replace(xlim0=task.xlim0 + ox.astype(f32) * task.res,
                         ylim0=task.ylim0 + oy.astype(f32) * task.res)


def make_rollout_backend(static: SolverStatic):
    """The backend-specific (pack, rollout) pair, shared by the
    single-device solver and the multi-chip sharded solver.

    Returns ``(backend_name, pack, rollout)``:

    * ``pack(lin_bins, ang_bins, lin_grids, ang_grids, maps, task)`` builds
      the rollout payload from sampled PMF bin indices plus the decoded
      int8 value grids (the bin-packed kernel consumes bins; the byte
      kernel and XLA core consume values).
    * ``rollout(payload, task, u, noise) -> (K_actual, M)`` costs, where
      ``K_actual = noise.shape[0]`` — the sharded solver passes its
      shard-local noise slice.
    """
    backend = resolve_backend(static)
    # "<kernel>_interpret" runs the Pallas kernel in interpreter mode (any
    # backend, incl. CPU): the test suite uses it to pin the SOLVER-level
    # payload wiring (packing, ROI, task vec) through the kernel path
    # without TPU hardware.
    interpret = backend.endswith("_interpret")
    if interpret:
        backend = backend[:-len("_interpret")]
    # "<binned kernel>_stream" keeps the cell plane in HBM and DMAs the
    # exact-occupancy band window per step (rollout_kernel.py stream=True);
    # an opt-in lever for huge maps until measured wins flip the routing.
    stream = backend.endswith("_stream")
    if stream:
        backend = backend[:-len("_stream")]
    H, W = solver_map_shape(static)
    T = static.num_steps
    speed_map = static.mode == "speed_map"
    step_fn = get_step_fn(static.model)
    # fast_trig replaces the heading update with a unicycle-specific
    # rotation polynomial; any other model takes the generic exact path.
    fast_trig = static.fast_trig and static.model == "unicycle"

    def pack(lin_bins, ang_bins, lin_grids, ang_grids, maps, task):
        if backend in ("pallas_binned", "pallas_binned2"):
            pack_cells = (pack_bin_nibbles if backend == "pallas_binned"
                          else pack_bin_crumbs)
            return (pack_cells(lin_bins, ang_bins),
                    pack_mask_nibbles(maps.obstacle, maps.unknown),
                    build_bin_luts(task, maps.lin_qbins, maps.ang_qbins),
                    pack_risk_bytes(maps.risk) if speed_map else None)
        if backend == "pallas_binned8":
            # >16-bin cell plane: decoded int8 value pairs, no LUT.
            return (pack_byte_pairs(lin_grids, ang_grids),
                    pack_mask_nibbles(maps.obstacle, maps.unknown),
                    None,
                    pack_risk_bytes(maps.risk) if speed_map else None)
        return pack_map_words(lin_grids, ang_grids, maps.obstacle,
                              maps.unknown, maps.risk if speed_map else None)

    def _padded_controls(u, noise, task):
        k = noise.shape[0]
        v_all, w_all = _clipped_controls_tk(u, noise, task.vrange,
                                            task.wrange)
        k_pad = -(-k // LANES) * LANES
        if k_pad != k:
            v_all = jnp.pad(v_all, ((0, 0), (0, k_pad - k)))
            w_all = jnp.pad(w_all, ((0, 0), (0, k_pad - k)))
        return v_all, w_all

    def rollout(payload, task, u, noise):
        k = noise.shape[0]
        if backend == "pallas":
            v_all, w_all = _padded_controls(u, noise, task)
            costs_km = terrain_rollout_costs_pallas(
                payload, build_task_vec(task), v_all, w_all,
                H=H, W=W, T=T, speed_map=speed_map,
                fast_trig=fast_trig, step_fn=step_fn, interpret=interpret,
                t_unroll=DEFAULT_T_UNROLL_BYTE)
            return costs_km[:k]
        if backend in ("pallas_binned", "pallas_binned2", "pallas_binned8"):
            nib, maskw, lut, riskw = payload
            v_all, w_all = _padded_controls(u, noise, task)
            cell_bits = {"pallas_binned": 4, "pallas_binned2": 2,
                         "pallas_binned8": 8}[backend]
            # Group-banded walk (one occupancy reduction per t_unroll'd
            # group) rides the same displacement bound as the ROI crop, so
            # it gates on the same model property.
            anchor = (DEFAULT_T_UNROLL_BINNED
                      if has_displacement_bound(static.model) else 1)
            costs_km = terrain_rollout_costs_pallas_binned(
                nib, maskw, lut, build_task_vec(task), v_all, w_all, riskw,
                H=H, W=W, T=T, fast_trig=fast_trig, step_fn=step_fn,
                interpret=interpret, cell_bits=cell_bits,
                t_unroll=DEFAULT_T_UNROLL_BINNED, band_anchor=anchor,
                stream=stream)
            return costs_km[:k]
        return terrain_rollout_costs(payload, task, u, noise,
                                     speed_map=speed_map, step_fn=step_fn)

    return backend, pack, rollout


@functools.lru_cache(maxsize=None)
def get_terrain_solver(static: SolverStatic):
    """Build (and cache) the jitted terrain-mode solve function.

    Returned callable: ``(key, maps, task, u0) -> (u_new, SolveAux)``.
    """
    assert static.mode in ("tdm", "det_dyn", "speed_map")
    K = static.num_control_rollouts
    T = static.num_steps
    M = static.num_grid_samples
    V = static.num_vis_state_rollouts
    H, W = solver_map_shape(static)
    _, pack_payload, rollout = make_rollout_backend(static)

    def solve_fn(key, maps, task, u0):
        kmap, knoise = jax.random.split(key)
        if static.roi_shape:
            oy, ox = _roi_start(task, static.map_shape, static.roi_shape)
            maps = _crop_maps(maps, oy, ox, H, W)
            task = _shift_task_limits(task, oy, ox)
            # Draw the per-cell uniforms at GLOBAL cell indices so the
            # cropped solve realizes the exact maps the full solve would.
            window = (static.map_shape, oy, ox)
        else:
            oy = ox = jnp.int32(0)
            window = None
        # The reference seeds the linear and angular TDM RNG streams with the
        # SAME seed (reference: mppi_numba/terrain.py:173-176), so both grids
        # are drawn from identical uniforms — their bin choices are
        # comonotone.  We preserve that coupling by reusing one key.
        lin_bins = sample_traction_bins(kmap, maps.lin_pmf,
                                        task.alpha_dyn, M, window=window)
        ang_bins = sample_traction_bins(kmap, maps.ang_pmf,
                                        task.alpha_dyn, M, window=window)
        # Decoded int8 value grids feed SolveAux / the vis path (and the
        # byte/XLA payloads).  Cost at flagship-forest scale: ~15 MB of
        # elementwise int8 writes ~= 0.04 ms against a 10.9 ms solve —
        # kept for the sample_grid_batch API parity.
        lin_grids = decode_bins(maps.lin_qbins, lin_bins)
        ang_grids = decode_bins(maps.ang_qbins, ang_bins)
        packed = pack_payload(lin_bins, ang_bins, lin_grids, ang_grids,
                              maps, task)

        u = u0
        noise = None
        costs = None
        weights = None
        for i in range(static.num_opt):
            noise = sample_noise(jax.random.fold_in(knoise, i), task.u_std, K, T)
            costs_km = rollout(packed, task, u, noise)
            if static.cvar_numel == DYNAMIC_CVAR:
                cvar = cvar_from_costs_dynamic(costs_km, task.cvar_alpha)
            else:
                cvar = cvar_from_costs(costs_km, static.cvar_numel)
            costs = (cvar
                     + control_coupling(u, noise, task.u_std, task.lambda_weight))
            u, weights = update_useq(costs, noise, u, task.lambda_weight,
                                     task.vrange, task.wrange)
        aux = SolveAux(costs=costs, weights=weights, noise_vis=noise[:V],
                       lin_grids=lin_grids, ang_grids=ang_grids,
                       roi_offset=jnp.stack([oy, ox]))
        return u, aux

    return jax.jit(solve_fn, donate_argnums=(3,))


@functools.lru_cache(maxsize=None)
def get_terrain_vis(static: SolverStatic):
    """Jitted visualization rollouts.

    Stochastic mode rolls the optimal sequence across the first V sampled
    map pairs (reference: mppi_numba/mppi.py:1298-1351).  Det modes roll the
    optimal sequence plus V-1 noise-perturbed copies of the previous
    sequence on map sample 0 (reference: mppi_numba/mppi.py:1194-1295; note
    the reference aliases u_prev to the freshly updated u_cur —
    mppi.py:292,362 — which the planner mirrors).
    """
    V = static.num_vis_state_rollouts
    det = static.mode in ("det_dyn", "speed_map")
    step_fn = get_step_fn(static.model)

    def vis_fn(maps, task, u_cur, u_prev, noise_vis, lin_grids, ang_grids,
               roi_offset):
        if static.roi_shape:
            # The sampled grids in aux are ROI-shaped; crop the static masks
            # to the same window the solve used and shift the limits.
            oy, ox = roi_offset[0], roi_offset[1]
            rH, rW = static.roi_shape
            maps = _crop_maps(maps, oy, ox, rH, rW)
            task = _shift_task_limits(task, oy, ox)
        if det:
            grids_l = jnp.broadcast_to(lin_grids[0], (V,) + lin_grids.shape[1:])
            grids_a = jnp.broadcast_to(ang_grids[0], (V,) + ang_grids.shape[1:])
            noisy = u_prev[None] + noise_vis                       # (V, T, 2)
            noisy = jnp.stack(clip_controls(noisy, task.vrange, task.wrange),
                              axis=-1)
            controls = jnp.concatenate([u_cur[None], noisy[1:]], axis=0)
        else:
            grids_l = lin_grids[:V]
            grids_a = ang_grids[:V]
            controls = jnp.broadcast_to(u_cur[None], (V,) + u_cur.shape)
        packed = pack_map_words(grids_l, grids_a, maps.obstacle, maps.unknown)
        return terrain_vis_states(packed, task, controls, step_fn=step_fn)

    return jax.jit(vis_fn)


@functools.lru_cache(maxsize=None)
def get_barebone_solver(static: SolverStatic):
    """Jitted barebone (terrain-free, analytic-obstacle) solve."""
    assert static.mode == "barebone"
    K = static.num_control_rollouts
    T = static.num_steps
    V = static.num_vis_state_rollouts

    def solve_fn(key, task, u0):
        u = u0
        noise = costs = weights = None
        for i in range(static.num_opt):
            noise = sample_noise(jax.random.fold_in(key, i), task.u_std, K, T)
            costs = (barebone_rollout_costs(task, u, noise)
                     + control_coupling(u, noise, task.u_std, task.lambda_weight))
            u, weights = update_useq(costs, noise, u, task.lambda_weight,
                                     task.vrange, task.wrange)
        aux = SolveAux(costs=costs, weights=weights, noise_vis=noise[:V],
                       lin_grids=None, ang_grids=None)
        return u, aux

    return jax.jit(solve_fn, donate_argnums=(2,))


@functools.lru_cache(maxsize=None)
def get_barebone_vis(static: SolverStatic):
    V = static.num_vis_state_rollouts

    def vis_fn(task, u_cur, u_prev, noise_vis):
        noisy = u_prev[None] + noise_vis
        noisy = jnp.stack(clip_controls(noisy, task.vrange, task.wrange),
                          axis=-1)
        controls = jnp.concatenate([u_cur[None], noisy[1:]], axis=0)
        return barebone_vis_states(task, controls)

    return jax.jit(vis_fn)
