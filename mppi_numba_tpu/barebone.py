"""Standalone barebone MPPI: unicycle, no terrain, analytic circle obstacles.

Capability parity with the reference's self-contained barebone engine
(reference: barebone_mppi_numba.ipynb[cells 2-3]) — information-theoretic
MPPI (Williams et al., Alg. 2) with nominal unicycle dynamics, squared-
distance costs, and in-kernel circular obstacles.  This is the minimal
end-to-end slice of the framework and the CPU-runnable PR1 reference config
(BASELINE.md config 1: K=1000, 50 steps, 2.74 ms/solve on RTX 3070).
"""

from __future__ import annotations

import copy

import numpy as np
import jax
import jax.numpy as jnp

from .config import SolverStatic, rec_min_control_rollouts
from .mppi import shifted_useq
from .ops.costs import BAREBONE_DEFAULT_DIST_WEIGHT, BAREBONE_DEFAULT_OBS_COST
from .solver import get_barebone_solver, get_barebone_vis
from .types import BareboneTask

# The barebone engine recommends a much higher rollout ceiling than the
# terrain engine (reference: barebone_mppi_numba.ipynb[cell 2]).
rec_max_control_rollouts = int(1e6)


class BareboneConfig:
    """Barebone configuration (reference: barebone_mppi_numba.ipynb[cell 2])."""

    def __init__(self, T=10.0, dt=0.1, num_control_rollouts=1024,
                 num_vis_state_rollouts=20, seed=1):
        self.seed = seed
        self.T = T
        self.dt = dt
        self.num_steps = int(T / dt + 1e-6)   # see Config: float-safe truncation

        assert T > 0
        assert dt > 0
        assert T > dt
        assert self.num_steps > 0

        self.num_control_rollouts = int(num_control_rollouts)
        if self.num_control_rollouts > rec_max_control_rollouts:
            self.num_control_rollouts = rec_max_control_rollouts
            print("MPPI Config: Clip num_control_rollouts to recommended max "
                  "of {}.".format(rec_max_control_rollouts))
        elif self.num_control_rollouts < rec_min_control_rollouts:
            self.num_control_rollouts = rec_min_control_rollouts
            print("MPPI Config: Clip num_control_rollouts to recommended min "
                  "of {}.".format(rec_min_control_rollouts))

        self.num_vis_state_rollouts = max(
            1, min(int(num_vis_state_rollouts), self.num_control_rollouts))


class BareboneMPPI:
    """Barebone planner: ``setup(params) -> solve() -> shift_and_update``.

    Same lifecycle as the terrain planner but without TDMs
    (reference: barebone_mppi_numba.ipynb[cell 3]).
    """

    def __init__(self, cfg: BareboneConfig):
        self.cfg = cfg
        self.T = cfg.T
        self.dt = cfg.dt
        self.num_steps = cfg.num_steps
        self.num_control_rollouts = cfg.num_control_rollouts
        self.num_vis_state_rollouts = cfg.num_vis_state_rollouts
        self.seed = cfg.seed
        self.device_var_initialized = True
        self.reset()

    def reset(self):
        self.u_seq0 = np.zeros((self.num_steps, 2), dtype=np.float32)
        self.params = None
        self.params_set = False
        self.u_cur = jnp.asarray(self.u_seq0)
        self.u_prev = jnp.asarray(self.u_seq0)
        self._key = jax.random.PRNGKey(self.seed)
        self._last_aux = None
        self._task_device = None
        self._last_useq_np = None

    def setup(self, params):
        self.set_params(params)

    def set_params(self, params):
        self.params = copy.deepcopy(params)
        self.params_set = True
        # Full task staged to device once per params change; per-replan
        # updates touch only the x0 leaf (see shift_and_update).
        self._task_device = self._task()

    def check_solve_conditions(self):
        if not self.params_set:
            print("MPPI parameters are not set. Cannot solve")
            return False
        return True

    def _static(self):
        n_obs = (len(self.params["obstacle_positions"])
                 if "obstacle_positions" in self.params else 1)
        return SolverStatic(
            mode="barebone",
            num_steps=self.num_steps,
            num_control_rollouts=self.num_control_rollouts,
            num_grid_samples=1,
            map_shape=(0, 0),
            num_obstacles=n_obs,
            cvar_numel=1,
            num_opt=int(self.params.get("num_opt", 1)),
            num_vis_state_rollouts=self.num_vis_state_rollouts,
        )

    def _task(self):
        p = self.params
        f32 = np.float32
        if "obstacle_positions" in p:
            obs_pos = np.asarray(p["obstacle_positions"], dtype=f32)
            obs_r = np.asarray(p["obstacle_radius"], dtype=f32)
        else:
            # Far-away dummy obstacle, mirroring the reference's workaround
            # (reference: barebone_mppi_numba.ipynb[cell 3],
            # move_mppi_task_vars_to_device).
            obs_pos = np.array([[1e5, 1e5]], dtype=f32)
            obs_r = np.array([0.0], dtype=f32)
        return BareboneTask(
            x0=jnp.asarray(np.asarray(p["x0"], dtype=f32)),
            xgoal=jnp.asarray(np.asarray(p["xgoal"], dtype=f32)),
            goal_tolerance=f32(p["goal_tolerance"]),
            lambda_weight=f32(p["lambda_weight"]),
            u_std=jnp.asarray(np.asarray(p["u_std"], dtype=f32)),
            vrange=jnp.asarray(np.asarray(p["vrange"], dtype=f32)),
            wrange=jnp.asarray(np.asarray(p["wrange"], dtype=f32)),
            dt=f32(p["dt"]),
            dist_weight=f32(p.get("dist_weight", BAREBONE_DEFAULT_DIST_WEIGHT)),
            obs_penalty=f32(p.get("obs_penalty", BAREBONE_DEFAULT_OBS_COST)),
            obs_pos=jnp.asarray(obs_pos),
            obs_r=jnp.asarray(obs_r),
        )

    def solve(self):
        if not self.check_solve_conditions():
            print("MPPI solve condition not met. Cannot solve. Return")
            return
        static = self._static()
        solve_fn = get_barebone_solver(static)
        self._key, sub = jax.random.split(self._key)
        u_new, aux = solve_fn(sub, self._task_device, self.u_cur)
        self.u_cur = u_new
        # Reference quirk preserved: u_prev_d is aliased to u_cur_d before the
        # in-place update, so "previous" controls equal the updated ones
        # (reference: barebone_mppi_numba.ipynb[cell 3]; SURVEY §2.6).
        self.u_prev = u_new
        self._last_aux = aux
        self._last_static = static
        self._last_useq_np = np.asarray(jax.device_get(u_new))
        # Copy: an aliased return would defeat shift_and_update's comparison
        # (see MPPIPlanner.solve).
        return self._last_useq_np.copy()

    def shift_and_update(self, new_x0, u_cur, num_shifts=1):
        new_x0 = np.asarray(new_x0).copy()
        self.params["x0"] = new_x0
        self._task_device = self._task_device._replace(
            x0=jnp.asarray(new_x0.astype(np.float32)))
        u_np = np.asarray(u_cur, dtype=np.float32)
        self.u_cur = shifted_useq(self.u_cur, self._last_useq_np, u_np,
                                  num_shifts)
        self._last_useq_np = None   # a second shift must re-upload

    def get_state_rollout(self):
        assert self.params_set, "MPPI parameters are not set"
        if self._last_aux is None:
            print("No solve has produced rollout data yet. Cannot visualize.")
            return None
        vis_fn = get_barebone_vis(self._last_static)
        states = vis_fn(self._task_device, self.u_cur, self.u_prev,
                        self._last_aux.noise_vis)
        return np.asarray(jax.device_get(states))
