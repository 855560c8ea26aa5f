"""Checkpoint / resume (SURVEY §5.4).

The reference's only persistent state is data-level: benchmark DataFrames +
experiment config pickles, and the planner's warm-started control sequence.
This module covers both:

* planner state snapshots (optimized control sequence, previous sequence,
  RNG key, params) — everything needed to resume replanning mid-mission;
* experiment logs with the reference pickle's key set, so
  ``benchmark_vis``-style plotting works on either engine's output.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp


def save_planner_state(planner, path):
    """Snapshot the mutable planner state to ``path``."""
    state = dict(
        u_cur=np.asarray(planner.u_cur),
        u_prev=np.asarray(planner.u_prev),
        key=np.asarray(planner._key),
        params=planner.params,
    )
    with open(path, "wb") as fh:
        pickle.dump(state, fh)
    return state


def load_planner_state(planner, path):
    """Restore a snapshot; the planner resumes exactly where it left off.

    TDMs are map data, not planner state — a terrain planner must have its
    TDMs attached (``setup``/``set_tdm``) BEFORE restoring, exactly as after
    a fresh construction (reference workflow: mppi_numba/terrain.py:78-84).
    """
    if getattr(planner, "tdm_set", True) is False:
        raise RuntimeError(
            "load_planner_state: attach TDMs first (planner.setup(...) or "
            "set_tdm(...)) — the snapshot holds planner state, not maps.")
    with open(path, "rb") as fh:
        state = pickle.load(fh)
    planner.u_cur = jnp.asarray(state["u_cur"])
    planner.u_prev = jnp.asarray(state["u_prev"])
    planner._key = jnp.asarray(state["key"])
    if state["params"] is not None:
        planner.set_params(state["params"])
    return planner


def save_experiment(path, logger_df, **config_items):
    """Persist a benchmark run with the reference pickle's layout
    (reference: benchmark.ipynb[cell 7], read back by
    benchmark_vis.ipynb[cell 2])."""
    out = dict(logger=logger_df)
    out.update(config_items)
    with open(path, "wb") as fh:
        pickle.dump(out, fh)


def load_experiment(path):
    with open(path, "rb") as fh:
        return pickle.load(fh)
