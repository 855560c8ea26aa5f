"""Stateful MPPI planner with the reference workflow, over the functional core.

Drop-in capability parity with the reference planner object
(reference: mppi_numba/mppi.py:39-608): same construction-from-Config, same
``reset / setup(params, lin_tdm, ang_tdm) / solve / get_state_rollout /
shift_and_update`` lifecycle, same params-dict keys, same solve-condition
guards.  Internally every solve is one jitted XLA program (see ``solver.py``)
instead of a sequence of CUDA kernel launches, and the mutable device
buffers of the reference become donated/jit-managed arrays.
"""

from __future__ import annotations

import copy
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config, SolverStatic
from .ops.costs import (DEFAULT_DIST_WEIGHT, DEFAULT_OBS_COST,
                        DEFAULT_UNKNOWN_COST)
from .solver import get_terrain_solver, get_terrain_vis
from .types import MapInputs, TerrainTask


class MPPIPlanner:
    """Planner that runs MPPI on TPU via JAX/XLA.

    Typical workflow (reference: mppi_numba/mppi.py:44-52):
      1. Initialize with a ``Config``.
      2. ``reset()``
      3. ``setup(mppi_params, linear_tdm, angular_tdm)``
      4. ``solve()`` -> optimized control sequence ``(num_steps, 2)``
      5. ``get_state_rollout()`` for visualization
      6. ``shift_and_update(next_state, useq, num_shifts=1)``
      7. Repeat from 2 if traction maps change.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.T = cfg.T
        self.dt = cfg.dt
        self.num_steps = cfg.num_steps
        self.num_grid_samples = cfg.num_grid_samples
        self.num_control_rollouts = cfg.num_control_rollouts
        self.num_vis_state_rollouts = cfg.num_vis_state_rollouts
        self.seed = cfg.seed
        self.use_tdm = cfg.use_tdm
        self.use_det_dynamics = cfg.use_det_dynamics
        self.use_nom_dynamics_with_speed_map = cfg.use_nom_dynamics_with_speed_map
        self.use_costmap = cfg.use_costmap
        self.det_dyn = cfg.det_dyn

        self.device_var_initialized = True
        self.reset()

    def reset(self):
        self.u_seq0 = np.zeros((self.num_steps, 2), dtype=np.float32)
        self.params = None
        self.params_set = False
        self.lin_tdm = None
        self.ang_tdm = None
        self.tdm_set = False

        self.u_cur = jnp.asarray(self.u_seq0)
        self.u_prev = jnp.asarray(self.u_seq0)
        self._key = jax.random.PRNGKey(self.seed)
        self._last_aux = None
        self._task_device = None
        self._last_useq_np = None
        self._compacted_planes = None
        self._compacted_token = None

    # -- setup ---------------------------------------------------------------

    def setup(self, params, lin_tdm, ang_tdm):
        self.set_tdm(lin_tdm, ang_tdm)
        self.set_params(params)

    def is_within_bound(self, v, vbounds):
        return v >= vbounds[0] and v <= vbounds[1]

    def set_params(self, params):
        if not self.is_within_bound(params['x0'][0], self.lin_tdm.xlimits):
            print("ERROR: When setting mppi params, x0[0] is not within xlimits!")
            assert False
        if not self.is_within_bound(params['x0'][1], self.lin_tdm.ylimits):
            print("ERROR: When setting mppi params, x0[1] is not within ylimits!")
            assert False
        self.params = copy.deepcopy(params)
        self.params_set = True
        # Stage the full task pytree to the device ONCE per params change.
        # Per-replan updates touch only the x0 leaf (see shift_and_update) —
        # critical when the host<->device link has high latency: the
        # reference re-uploads ~10 small arrays every solve
        # (reference: mppi_numba/mppi.py:214-234); we upload one.
        self._task_device = self._build_task()

    def set_tdm(self, lin_tdm, ang_tdm):
        self.lin_tdm = lin_tdm
        self.ang_tdm = ang_tdm
        self.tdm_set = True
        # Invalidate the bin-plane compaction cache: it is derived from the
        # TDM PMFs (recomputed lazily on the next solve).
        self._compacted_planes = None

    def check_solve_conditions(self):
        if not self.params_set:
            print("MPPI parameters are not set. Cannot solve")
            return False
        if not self.tdm_set:
            print("MPPI has not received TDMs. Cannot solve")
            return False
        if not self.device_var_initialized:
            print("Device variables not initialized. Cannot solve.")
            return False
        if not self.lin_tdm.pmf_grid_initialized:
            print("Linear TDM's PMF not initialized. Cannot solve.")
            return False
        if not self.ang_tdm.pmf_grid_initialized:
            print("Angular TDM's PMF not initialized. Cannot solve.")
            return False
        if not self.is_within_bound(self.params["x0"][0], self.lin_tdm.padded_xlimits):
            print("Robot initial condition not within padded xlimits.")
            return False
        if not self.is_within_bound(self.params["x0"][1], self.lin_tdm.padded_ylimits):
            print("Robot initial condition not within padded ylimits.")
            return False
        return True

    # -- solve -----------------------------------------------------------------

    def _mode(self):
        if self.use_det_dynamics:
            return "det_dyn"
        if self.use_nom_dynamics_with_speed_map or self.use_costmap:
            # Costmap mode shares the speed-map solve: nominal dynamics, a
            # risk byte of 100 (full speed) and the lethal/no-info masks
            # carrying the penalties (see TDM.set_TDM_from_costmap).
            return "speed_map"
        return "tdm"

    def _static(self):
        mode = self._mode()
        M = 1 if mode != "tdm" else self.num_grid_samples
        H, W = self.lin_tdm.get_padded_grid_xy_dim()
        if mode != "tdm":
            cvar_numel = 1
        elif getattr(self.cfg, "dynamic_cvar", False):
            # Read the traced task.cvar_alpha instead of specializing the
            # executable: an interactive alpha sweep reuses ONE compile
            # (same mechanism as the device benchmark engine).
            from .solver import DYNAMIC_CVAR
            cvar_numel = DYNAMIC_CVAR
        else:
            alpha = float(self.params.get("cvar_alpha", 1.0))
            cvar_numel = int(math.ceil(M * alpha))
        # Fast rotation updates are accurate when per-step heading increments
        # stay small; mirror the reference's fastmath trig under that guard.
        ang_ub = float(self.ang_tdm.bin_values_bounds[1])
        max_dth = (float(self.params["dt"])
                   * float(np.max(np.abs(self.params["wrange"]))) * ang_ub)
        return SolverStatic(
            roi_shape=self._roi_shape((H, W)),
            # Effective (support-compacted) bin count — see _compact_planes;
            # equals max(declared lin, ang) bins when nothing compacts.
            num_pmf_bins=int(self._compact_planes()[4]),
            mode=mode,
            num_steps=self.num_steps,
            num_control_rollouts=self.num_control_rollouts,
            num_grid_samples=M,
            map_shape=(H, W),
            num_obstacles=0,
            cvar_numel=cvar_numel,
            num_opt=int(self.params.get("num_opt", 1)),
            num_vis_state_rollouts=self.num_vis_state_rollouts,
            fast_trig=(max_dth <= 0.6
                       and getattr(self.cfg, 'model', 'unicycle')
                       == 'unicycle'),
            model=getattr(self.cfg, "model", "unicycle"),
            # Optional rollout-backend override (set ``cfg.backend`` after
            # construction): 'xla', 'pallas', 'pallas_binned',
            # 'pallas_binned2', 'pallas_binned8', or any of those +
            # '_interpret' — used to
            # force a specific kernel path for debugging / CPU validation.
            backend=getattr(self.cfg, "backend", "auto"),
        )

    def _roi_shape(self, padded_hw):
        """Static reachable-window size, or None when cropping buys nothing.

        A rollout covers at most ``max|vrange| * traction_ub * num_steps *
        dt`` meters from x0 (the kernel's per-step displacement is
        ``dt * lin_traction * v``, reference: mppi_numba/mppi.py:690-694), so
        a window of that radius plus margin re-centered on x0 each solve sees
        every cell any rollout can touch.  This is the SURVEY §7 ROI design:
        sampling, packing, and the rollout gather all shrink from the full
        padded map (reference regime max_map_dim=(250,250),
        mppi_numba/config.py:28) to the reachable ball.
        """
        from .models import has_displacement_bound
        if not has_displacement_bound(getattr(self.cfg, "model", "unicycle")):
            # The reach bound below assumes per-step translation
            # <= dt * lin_traction * |v|; a custom model without that
            # declared bound could leave the window, silently clamping its
            # map lookups — disable cropping instead.
            return None
        H, W = padded_hw
        p = self.params
        vmax = float(np.max(np.abs(p["vrange"])))
        tr_ub = max(1.0, float(self.lin_tdm.bin_values_bounds[1]))
        reach_m = vmax * tr_ub * self.num_steps * float(p["dt"])
        cells = int(math.ceil(reach_m / float(self.lin_tdm.res))) + 2
        r = 2 * cells + 1
        rH, rW = min(H, r), min(W, r)
        # Crop whenever the window is under ~3/4 of the map, on every
        # backend.  TPU evidence: the round-4 1/3 threshold was calibrated
        # against the old 16-chunk unrolled-walk cutoff that made mid-size
        # ROI windows run the slow walk; with the measured 8-chunk
        # crossover and the group-anchored band (round 5, BENCH_WALK.jsonl)
        # cropping wins again at window/map 0.58 (forest: full 7.63 ms vs
        # ROI 6.81 ms) and by 2.6x at 0.11 (250x250: 18.6 vs 7.08 ms).
        # On the XLA fallback (CPU tests/examples) the per-step map gather
        # scales with map area, so cropping pays at any meaningful shrink.
        threshold_crop = rH * rW * 4 < H * W * 3
        if not threshold_crop:
            return None
        return (rH, rW)

    def _compact_planes(self):
        """PMF bin planes with globally-zero-mass rows dropped, memoized.

        A bin whose int8 mass is zero in EVERY cell can never be selected by
        the sampling rank ``sum(cum < sampled)`` (``ops/sampling.py``): its
        cumulative mass equals its predecessor's, so it contributes to the
        rank exactly when the walk passes it, landing the full-plane draw on
        the same retained bin the compacted plane selects directly — the
        sampled traction VALUES (and hence the whole solve) are
        bit-identical (tests/test_planner.py::test_pmf_support_compaction).
        Row 0 is always kept: ``sampled_cum == 0`` (a zero uniform) selects
        bin 0 unconditionally in the reference walk semantics (reference:
        mppi_numba/terrain.py:679-694).

        The payoff is routing: det-dynamics condensations are one-hot over
        few bins and speed-map/costmap PMFs use exactly {pad, nominal}, so
        the effective bin count drops to <= 4 and the solve takes the 2-bit
        crumb kernel (or <= 16 for the 4-bit nibble kernel) regardless of
        the declared bin count.  Opt out with ``cfg.compact_pmf_support =
        False``.
        """
        lin, ang = self.lin_tdm, self.ang_tdm
        # Key the memo on the TDMs' content tokens so in-place updates
        # (reset + set_TDM_from_* without re-calling set_tdm) never serve
        # stale planes (round-3 advisor finding).
        token = (id(lin), getattr(lin, "_content_version", None),
                 id(ang), getattr(ang, "_content_version", None))
        if (self._compacted_planes is not None
                and self._compacted_token == token):
            return self._compacted_planes
        self._compacted_token = token
        declared = int(max(lin.num_pmf_bins, ang.num_pmf_bins))
        if not getattr(self.cfg, "compact_pmf_support", True):
            self._compacted_planes = (lin.pmf_grid_device, lin.qbin_values,
                                      ang.pmf_grid_device, ang.qbin_values,
                                      declared)
            return self._compacted_planes

        def compact(tdm):
            pmf = getattr(tdm, "padded_pmf_host", None)
            if pmf is None:
                pmf = np.asarray(tdm.pmf_grid_device)
            qbins = getattr(tdm, "qbin_values_host", None)
            if qbins is None:
                qbins = np.asarray(tdm.qbin_values)
            used = (pmf != 0).any(axis=(1, 2))
            used[0] = True
            # Clamp-fidelity guard: when a column's total mass is below the
            # max possible sampled rank (ceil(u*100*alpha_dyn) <= 100), the
            # CDF walk runs off the end and decode_bins' take clamps to the
            # LAST row of the plane it was given.  Keeping the declared last
            # bin makes the clamp target identical pre/post compaction even
            # for unnormalized PMF grids (round-3 advisor finding); for
            # well-formed grids (every column sums to 100, incl. the pad
            # ring) this keeps compaction maximally tight.
            if int(pmf.astype(np.int32).sum(axis=0).min()) < 100:
                used[-1] = True
            if used.all():
                return tdm.pmf_grid_device, tdm.qbin_values, len(used)
            return (jnp.asarray(pmf[used]), jnp.asarray(qbins[used]),
                    int(used.sum()))

        lin_pmf, lin_q, n_lin = compact(lin)
        ang_pmf, ang_q, n_ang = compact(ang)
        self._compacted_planes = (lin_pmf, lin_q, ang_pmf, ang_q,
                                  max(n_lin, n_ang))
        return self._compacted_planes

    def _map_inputs(self):
        lin, ang = self.lin_tdm, self.ang_tdm
        lin_pmf, lin_q, ang_pmf, ang_q, _ = self._compact_planes()
        return MapInputs(
            lin_pmf=lin_pmf,
            ang_pmf=ang_pmf,
            lin_qbins=lin_q,
            ang_qbins=ang_q,
            obstacle=lin.obstacle_map_device,
            unknown=lin.unknown_map_device,
            risk=lin.risk_traction_map_device,
        )

    def _build_task(self):
        """Assemble the TerrainTask pytree and commit it to the device.

        All leaves go up as ONE packed transfer (scalars concatenated with
        the small vectors), then are sliced apart on device — a single
        host->device round trip instead of ~20.
        """
        p = self.params
        lin, ang = self.lin_tdm, self.ang_tdm
        f32 = np.float32
        lin_lb, lin_ub = lin.bin_values_bounds
        ang_lb, ang_ub = ang.bin_values_bounds
        mode = self._mode()
        # The det modes always sample with alpha_dyn = 1 — their PMFs are
        # pre-collapsed (reference: mppi_numba/mppi.py:249-250, 321-322);
        # the stochastic mode reads params['alpha_dyn'] (mppi.py:393-396).
        if mode == "tdm":
            alpha_dyn = f32(p.get("alpha_dyn", 1.0))
        else:
            alpha_dyn = f32(1.0)
        flat = np.concatenate([
            np.asarray(p["x0"], dtype=f32).ravel(),                 # 0:3
            np.asarray(p["xgoal"], dtype=f32).ravel(),              # 3:5
            np.asarray(p["u_std"], dtype=f32).ravel(),              # 5:7
            np.asarray(p["vrange"], dtype=f32).ravel(),             # 7:9
            np.asarray(p["wrange"], dtype=f32).ravel(),             # 9:11
            np.asarray([
                p["goal_tolerance"], p["v_post_rollout"],
                p["lambda_weight"], p["dt"],
                p.get("dist_weight", DEFAULT_DIST_WEIGHT),
                p.get("obs_penalty", DEFAULT_OBS_COST),
                p.get("unknown_penalty", DEFAULT_UNKNOWN_COST),
                alpha_dyn, lin.res,
                lin.padded_xlimits[0], lin.padded_ylimits[0],
                lin_lb, 0.01 * (lin_ub - lin_lb),
                ang_lb, 0.01 * (ang_ub - ang_lb),
                p.get("cvar_alpha", 1.0),
            ], dtype=f32),                                           # 11:27
        ])
        return _unpack_task(jnp.asarray(flat))

    def solve(self):
        """Optimize and return the control sequence ``(num_steps, 2)`` as
        host float32 (reference: mppi_numba/mppi.py:186-211)."""
        if not self.check_solve_conditions():
            print("MPPI solve condition not met. Cannot solve. Return")
            return

        static = self._static()
        solve_fn = get_terrain_solver(static)
        self._key, sub = jax.random.split(self._key)
        u_new, aux = solve_fn(sub, self._map_inputs(), self._task_device,
                              self.u_cur)
        self.u_cur = u_new
        self._last_aux = aux
        self._last_static = static

        # Mirror the reference's realized-sample data flow: the TDMs expose
        # the batch the solve actually used (reference keeps it in
        # tdm.sample_grid_batch_d; terrain.py:610-622).
        self.lin_tdm.sample_grid_batch = aux.lin_grids
        self.ang_tdm.sample_grid_batch = aux.ang_grids

        if self.det_dyn:
            # Reference quirk preserved deliberately: u_prev_d is assigned as
            # an alias of u_cur_d before the in-place update kernel runs, so
            # "previous" controls seen by the vis kernel are the freshly
            # updated ones (reference: mppi_numba/mppi.py:292,362; SURVEY
            # §2.6).
            self.u_prev = u_new

        self._last_useq_np = np.asarray(jax.device_get(u_new))
        # Hand the caller a copy: if the returned array aliased the private
        # snapshot, caller edits would defeat shift_and_update's
        # is-this-the-solved-sequence comparison below.
        return self._last_useq_np.copy()

    # -- receding horizon -------------------------------------------------------

    def shift_and_update(self, new_x0, u_cur, num_shifts=1):
        """Receding-horizon update (reference: mppi_numba/mppi.py:534-542).

        Exactly ONE small host->device transfer (the new x0); the control
        shift runs on device when ``u_cur`` is the sequence the last solve
        returned (the standard closed-loop pattern), else it is re-uploaded.
        """
        new_x0 = np.asarray(new_x0).copy()
        self.params["x0"] = new_x0
        self._task_device = self._task_device._replace(
            x0=jnp.asarray(new_x0.astype(np.float32)))
        u_np = np.asarray(u_cur, dtype=np.float32)
        self.u_cur = shifted_useq(self.u_cur, self._last_useq_np, u_np,
                                  num_shifts)
        # The device sequence no longer matches the last solve's output; a
        # second shift with the same host array must take the re-upload path
        # (reference semantics: the shift is recomputed from the passed
        # array each call).
        self._last_useq_np = None

    def shift_optimal_control_sequence(self, u_cur, num_shifts=1):
        u_cur_shifted = np.asarray(u_cur).copy()
        u_cur_shifted[:-num_shifts] = u_cur_shifted[num_shifts:]
        self.u_cur = jnp.asarray(u_cur_shifted.astype(np.float32))

    # -- visualization ------------------------------------------------------------

    def get_state_rollout(self):
        """State sequences under the current optimal control
        (reference: mppi_numba/mppi.py:545-608).

        Stochastic mode: the optimal sequence rolled across the first
        ``num_vis_state_rollouts`` sampled map pairs.  Det modes: the optimal
        sequence plus noise-perturbed previous sequences on map sample 0.
        Returns host float32 ``(num_vis, T+1, 3)``.
        """
        assert self.params_set, "MPPI parameters are not set"
        assert self.tdm_set, "MPPI has not received TDMs"
        if self._last_aux is None:
            print("No solve has produced rollout data yet. Cannot visualize.")
            return None

        vis_fn = get_terrain_vis(self._last_static)
        states = vis_fn(self._map_inputs(), self._task_device, self.u_cur,
                        self.u_prev, self._last_aux.noise_vis,
                        self._last_aux.lin_grids, self._last_aux.ang_grids,
                        self._last_aux.roi_offset)
        return np.asarray(jax.device_get(states))


@jax.jit
def _unpack_task(flat):
    """Slice the single packed upload back into a TerrainTask pytree."""
    return TerrainTask(
        x0=flat[0:3], xgoal=flat[3:5], u_std=flat[5:7], vrange=flat[7:9],
        wrange=flat[9:11], goal_tolerance=flat[11], v_post_rollout=flat[12],
        lambda_weight=flat[13], dt=flat[14], dist_weight=flat[15],
        obs_penalty=flat[16], unknown_penalty=flat[17], alpha_dyn=flat[18],
        res=flat[19], xlim0=flat[20], ylim0=flat[21], lin_lb=flat[22],
        lin_ratio=flat[23], ang_lb=flat[24], ang_ratio=flat[25],
        cvar_alpha=flat[26])


@functools.partial(jax.jit, static_argnums=(1,))
def _shift_useq(u_cur, num_shifts):
    """Device-side receding-horizon shift: ``u[:-n] = u[n:]`` with the last
    ``n`` entries left unchanged — exactly the reference's host-side
    assignment (reference: mppi_numba/mppi.py:539-542)."""
    return jnp.concatenate([u_cur[num_shifts:], u_cur[-num_shifts:]], axis=0)


def shifted_useq(u_cur_device, last_useq_np, u_np, num_shifts):
    """Shared receding-horizon shift for both planner classes.

    Shifts ON DEVICE (no upload) when ``u_np`` equals the last solve's
    output — the standard closed-loop pattern — else recomputes the shift
    from the passed host array and uploads it (reference semantics,
    mppi_numba/mppi.py:534-542).
    """
    if (last_useq_np is not None and u_np.shape == last_useq_np.shape
            and np.array_equal(u_np, last_useq_np)):
        return _shift_useq(u_cur_device, num_shifts)
    u_shifted = u_np.copy()
    u_shifted[:-num_shifts] = u_shifted[num_shifts:]
    return jnp.asarray(u_shifted.astype(np.float32))


# Backwards-compatible alias matching the reference class name.
MPPI_Numba = MPPIPlanner
