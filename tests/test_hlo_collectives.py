"""Mechanically verify SCALING.md's per-iteration collective counts.

SCALING.md's communication model asserts (from source reading) that one
sharded solve communicates, per optimization iteration: a ``pmin`` (beta),
a ``psum`` (eta), and a ``psum`` of the weighted noise sum — and, per
solve, two map-sample all-gathers (lin + ang bins) when the k axis splits
map generation, plus one candidate all-gather per iteration for the
two-phase distributed CVaR when the m axis is sharded.  This test counts
the collectives XLA actually emitted in the compiled HLO of the sharded
solve, so the model's counts column is verified by the compiler rather
than asserted from source (round-3 VERDICT weak item 6).
"""

import re

import jax

from mppi_numba_tpu.parallel.mesh import make_mesh
from mppi_numba_tpu.parallel.sharded import make_sharded_terrain_solver
from tests.test_sharding import build_case

NUM_OPT = 2     # build_case's static uses num_opt=2


def collective_counts(mesh_shape, num_map_shards):
    n_dev = mesh_shape[0] * mesh_shape[1] * (num_map_shards or 1)
    static, maps, task, u0, keys = build_case(mesh_shape[0] * 2,
                                              cvar_numel=3)
    mesh = make_mesh(*mesh_shape, devices=jax.devices()[:n_dev],
                     num_map_shards=num_map_shards)
    fn = make_sharded_terrain_solver(static, mesh)
    txt = fn.lower(keys, maps, task, u0).compile().as_text()
    return {name: len(re.findall(r"\b" + name + r"(?:-start)?\(", txt))
            for name in ("all-reduce", "all-gather", "collective-permute",
                         "reduce-scatter", "all-to-all")}


def test_k_sharded_collective_counts_match_scaling_model():
    ops = collective_counts((1, 8), None)
    # 3 all-reduces per iteration: pmin beta, psum eta, psum du.
    assert ops["all-reduce"] == 3 * NUM_OPT, ops
    # 2 all-gathers per solve: lin + ang shard-locally-sampled map bins.
    assert ops["all-gather"] == 2, ops
    assert ops["collective-permute"] == 0, ops
    assert ops["all-to-all"] == 0, ops


def test_km_sharded_collective_counts_match_scaling_model():
    for mesh_shape in ((1, 4), (2, 2)):
        ops = collective_counts(mesh_shape, 2)
        assert ops["all-reduce"] == 3 * NUM_OPT, (mesh_shape, ops)
        # + one CVaR two-phase candidate gather per iteration over 'm'.
        assert ops["all-gather"] == 2 + NUM_OPT, (mesh_shape, ops)
