"""TPU-native MPPI with probabilistic traversability.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mit-acl/mppi_numba: GPU-block/thread decompositions become batched tensor
axes, CUDA kernels become fused XLA programs and Pallas kernels, xoroshiro
device RNG becomes counter-based ``jax.random``, and solves scale over
device meshes via ``shard_map`` collectives.

Public surface (matching the reference's import style plus conveniences):

    from mppi_numba_tpu import Config, MPPIPlanner, TDM, Terrain, ...
"""

from .config import Config, SolverStatic
from .density import Density, GaussianMixture
from .terrain import (TDM, TDM_Numba, Terrain, TractionGrid,
                      cvar_bin_for_terrain_pmf, cvar_value_for_terrain_pmf,
                      condense_pmf_grid_det, risk_map_from_pmf_grid,
                      quantize_pmf_int8, unknown_mask_from_confidence,
                      sample_realization_from_pmf_grid)
from .mppi import MPPIPlanner, MPPI_Numba
from .barebone import BareboneConfig, BareboneMPPI
from .types import TerrainTask, MapInputs, BareboneTask, SolveAux
from .sim import trial, simulate_step
from .benchmark import (make_benchmark_world, make_semantic_grid, run_trials,
                        default_benchmark_params, METHODS, PAPER_METHODS)

__version__ = "0.1.0"

__all__ = [
    "Config", "SolverStatic",
    "Density", "GaussianMixture",
    "TDM", "TDM_Numba", "Terrain", "TractionGrid",
    "cvar_bin_for_terrain_pmf", "cvar_value_for_terrain_pmf",
    "condense_pmf_grid_det", "risk_map_from_pmf_grid", "quantize_pmf_int8",
    "unknown_mask_from_confidence", "sample_realization_from_pmf_grid",
    "MPPIPlanner", "MPPI_Numba",
    "BareboneConfig", "BareboneMPPI",
    "TerrainTask", "MapInputs", "BareboneTask", "SolveAux",
    "trial", "simulate_step",
    "make_benchmark_world", "make_semantic_grid", "run_trials",
    "default_benchmark_params", "METHODS", "PAPER_METHODS",
]
