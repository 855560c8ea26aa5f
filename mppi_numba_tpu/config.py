"""Run configuration for the TPU-native MPPI engine.

Mirrors the capability surface of the reference ``Config``
(reference: mppi_numba/config.py:16-100) — same constructor keywords, same
value clamps, same mutually-exclusive algorithm flags — but is designed for
the XLA compilation model instead of CUDA launch geometry:

* The reference queries the CUDA device at import time for
  ``max_threads_per_block`` and sizes its kernel launches around it.  On TPU
  there is no thread/block geometry: every batch axis is a tensor axis that
  XLA tiles onto the VPU/MXU, so ``num_grid_samples`` has no "oversized"
  penalty and ``tdm_sample_thread_dim`` is accepted only for API
  compatibility (categorical map sampling is a single vectorized op, see
  ``ops/sampling.py``).
* ``Config`` is hashable on the fields that become **static** arguments of
  the jitted solver (horizon length, rollout counts, algorithm mode), which
  is what lets one compiled executable be reused across replanning steps.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Recommended rollout-count bounds, kept identical to the reference
# (reference: mppi_numba/config.py:13-14).  On TPU these are soft guidance —
# XLA has no grid-dimension limit — but we preserve the clamping behavior so
# benchmark configurations transfer unchanged.
rec_max_control_rollouts = 15000
rec_min_control_rollouts = 100

# Kept for API compatibility with code written against the reference, which
# reads this module-level value (reference: mppi_numba/config.py:10).  On TPU
# it only controls the warning mirrored from the reference; it does NOT select
# a slower code path.
max_threads_per_block = 1024
max_square_block_dim = (32, 32)
max_blocks = 2**31 - 1


class Config:
    """Configuration that is typically fixed throughout execution.

    Exactly one of ``use_tdm``, ``use_det_dynamics``,
    ``use_nom_dynamics_with_speed_map``, ``use_costmap`` must be set
    (reference: mppi_numba/config.py:41-47).
    """

    def __init__(self,
                 T=10.0,                      # Horizon (s)
                 dt=0.1,                      # Length of each step (s)
                 num_grid_samples=1024,       # Sampled traction maps (M)
                 num_control_rollouts=1024,   # Control sequences (K)
                 max_speed_padding=5.0,       # Max assumed speed for padding the grid perimeter
                 tdm_sample_thread_dim=(16, 16),  # Accepted for API compat; unused on TPU
                 num_vis_state_rollouts=20,   # Visualization rollouts
                 max_map_dim=(250, 250),      # Largest padded map dim (cells); larger maps are cropped
                 seed=1,
                 use_tdm=False,
                 use_det_dynamics=False,
                 use_nom_dynamics_with_speed_map=False,
                 use_costmap=False,
                 model="unicycle",          # dynamics model (models registry)
                 dynamic_cvar=False):       # trace cvar_alpha instead of
                                            # baking ceil(M*alpha) into the
                                            # executable: one compile serves
                                            # a whole alpha sweep
        from .models import get_step_fn
        get_step_fn(model)                  # fail fast on unknown names
        self.model = model
        self.dynamic_cvar = bool(dynamic_cvar)
        self.seed = seed
        self.use_tdm = use_tdm
        self.use_det_dynamics = use_det_dynamics
        self.use_nom_dynamics_with_speed_map = use_nom_dynamics_with_speed_map
        self.use_costmap = use_costmap
        num_true = sum([use_tdm, use_det_dynamics,
                        use_nom_dynamics_with_speed_map, use_costmap])

        assert T > 0
        assert dt > 0
        assert T > dt
        assert not (num_true == 0 or num_true > 1), (
            "MPPI Config Error: Only one of the use_tdm, use_det_dynamics, "
            "use_nom_dynamics_with_speed_map, use_costmap can be true.")
        # The reference asserts here ("Interface with costmap2d is not yet
        # implemented", mppi_numba/config.py:47, with the construction path
        # commented out at terrain.py:698-747).  This engine completes the
        # path: see TDM.set_TDM_from_costmap.

        self.T = T
        self.dt = dt
        # Tiny epsilon before truncating: bare int(T/dt) silently loses a
        # step to float error (0.3/0.1 -> 2.999... -> 2).  Genuine fractional
        # horizons still truncate like the reference (config.py:51).
        self.num_steps = int(T / dt + 1e-6)
        assert self.num_steps > 0

        self.max_threads_per_block = max_threads_per_block

        self.num_grid_samples = int(num_grid_samples)
        if self.num_grid_samples > rec_max_control_rollouts:
            self.num_grid_samples = rec_max_control_rollouts
            print("MPPI Config: Limit num_grid_samples by recommended max "
                  "(<={}). This can be overwritten if needed.".format(rec_max_control_rollouts))
        elif self.num_grid_samples < 1:
            self.num_grid_samples = 1
            print("MPPI Config: Set num_grid_samples from {} -> 1. "
                  "Need at least 1 map to work with".format(num_grid_samples))

        self.num_control_rollouts = int(num_control_rollouts)
        if self.num_control_rollouts > rec_max_control_rollouts:
            self.num_control_rollouts = rec_max_control_rollouts
            print("MPPI Config: Clip num_control_rollouts to recommended max "
                  "of {}.".format(rec_max_control_rollouts))
        elif self.num_control_rollouts < rec_min_control_rollouts:
            self.num_control_rollouts = rec_min_control_rollouts
            print("MPPI Config: Clip num_control_rollouts to recommended min "
                  "of {}.".format(rec_min_control_rollouts))

        self.max_speed_padding = max_speed_padding

        self.tdm_sample_thread_dim = tuple(tdm_sample_thread_dim)
        assert len(self.tdm_sample_thread_dim) == 2
        assert self.tdm_sample_thread_dim[0] > 0
        assert self.tdm_sample_thread_dim[1] > 0

        self.num_vis_state_rollouts = int(num_vis_state_rollouts)
        self.num_vis_state_rollouts = min([self.num_vis_state_rollouts,
                                           self.num_control_rollouts,
                                           self.num_grid_samples])
        self.num_vis_state_rollouts = max([1, self.num_vis_state_rollouts])

        self.max_map_dim = tuple(max_map_dim)

    @property
    def det_dyn(self) -> bool:
        return (self.use_det_dynamics or self.use_nom_dynamics_with_speed_map
                or self.use_costmap)

    @property
    def mode(self) -> str:
        if self.use_tdm:
            return "tdm"
        if self.use_det_dynamics:
            return "det_dyn"
        if self.use_nom_dynamics_with_speed_map:
            return "speed_map"
        return "costmap"


@dataclasses.dataclass(frozen=True)
class SolverStatic:
    """The static (compile-time) signature of one solver executable.

    Everything here participates in the jit cache key; everything NOT here is
    a runtime tensor/scalar and can change between ``solve()`` calls without
    recompilation.
    """
    mode: str                  # 'tdm' | 'det_dyn' | 'speed_map' | 'barebone'
    num_steps: int             # T
    num_control_rollouts: int  # K
    num_grid_samples: int      # M (1 for det modes / barebone)
    map_shape: Tuple[int, int]  # padded (H, W); (0, 0) for barebone
    num_obstacles: int         # analytic circle obstacles (barebone only)
    cvar_numel: int            # ceil(M * cvar_alpha); M for alpha == 1
    num_opt: int               # optimization iterations per solve
    num_vis_state_rollouts: int
    backend: str = "auto"      # 'pallas' | 'xla' | 'auto' (pallas on TPU when it fits)
    # Approximate per-step rotation instead of full-range sin/cos in the
    # Pallas kernel — the analog of the reference's CUDA fastmath.  Safe when
    # per-step heading increments are small; the planner enables it when
    # dt * max|wrange| * max_ang_traction <= 0.6.
    fast_trig: bool = False
    # Dynamics model name (see ``models.get_step_fn``).  Registered step
    # functions are pure elementwise jnp, so every model runs on the fused
    # Pallas kernels too (exact-trig path; the fast_trig rotation shortcut
    # is unicycle-specific).
    model: str = "unicycle"
    # Reachable-window crop (SURVEY §7 "Hard parts"): rollouts from x0 can
    # move at most max|vrange| * max_traction * T * dt, so on large maps the
    # solver samples/packs/rolls only a static (rH, rW) window re-centered on
    # x0 each solve (dynamic offset — one executable for the whole episode).
    # None = operate on the full padded map.
    roi_shape: Tuple[int, int] | None = None
    # Number of PMF bins of the TDMs this executable serves.  Only consulted
    # for backend selection: the 4-bit nibble kernel needs 1 <= bins <= 16;
    # 0 = unknown, never selects the nibble kernel but MAY select the 8-bit
    # value-pair kernel, which packs decoded traction values and is
    # bin-count-agnostic (any bins, including unknown, are exact there).
    num_pmf_bins: int = 0
