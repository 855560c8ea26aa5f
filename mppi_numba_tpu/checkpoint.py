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


class _StubState:
    """Placeholder for classes from the reference's ``mppi_numba`` package."""

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})


# Reference pickles are untrusted input (they ship with /root/reference);
# pickle's default find_class would happily resolve arbitrary callables for
# a crafted __reduce__ payload, and module-ROOT allowlisting is not enough —
# numpy/pandas contain exec-capable helpers (e.g.
# numpy.testing._private.utils.runstring).  Resolution is therefore
# restricted to the EXACT (module, name) globals a legitimate experiment
# pickle contains — recorded by instrumenting loads of the reference's own
# paper pickle and this repo's benchmark pickles — and everything under
# ``mppi_numba`` is stubbed.
_ALLOWED_GLOBALS = {
    ("builtins", "bytearray"), ("builtins", "slice"),
    ("builtins", "complex"), ("builtins", "frozenset"),
    ("collections", "OrderedDict"),
    ("numpy", "dtype"), ("numpy", "ndarray"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("pandas", "DataFrame"), ("pandas", "Index"), ("pandas", "RangeIndex"),
    ("pandas", "MultiIndex"), ("pandas", "Series"),
    ("pandas", "StringDtype"), ("pandas", "CategoricalDtype"),
    ("pandas._libs.internals", "_unpickle_block"),
    ("pandas.arrays", "ArrowStringArray"),
    ("pandas.core.frame", "DataFrame"),
    ("pandas.core.series", "Series"),
    ("pandas.core.indexes.base", "Index"),
    ("pandas.core.indexes.base", "_new_Index"),
    ("pandas.core.indexes.range", "RangeIndex"),
    ("pandas.core.internals.managers", "BlockManager"),
    ("pyarrow.lib", "_restore_array"),
    ("pyarrow.lib", "py_buffer"),
    ("pyarrow.lib", "type_for_alias"),
}


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] == "mppi_numba":
            return type(name, (_StubState,), {"__module__": module})
        if (module, name) not in _ALLOWED_GLOBALS:
            raise pickle.UnpicklingError(
                "load_reference_experiment: refusing to resolve {}.{} from "
                "an untrusted reference pickle (not in the explicit "
                "allowlist of DataFrame/ndarray reconstruction globals)"
                .format(module, name))
        return super().find_class(module, name)


def load_reference_experiment(path):
    """Load an experiment pickle produced by the REFERENCE implementation.

    Reference pickles embed instances of its ``mppi_numba`` classes (e.g.
    ``Config``), which require a CUDA-capable import; those are replaced by
    attribute-preserving stubs so the DataFrames and numeric config are
    readable anywhere (reference: benchmark.ipynb[cell 7] writes them,
    benchmark_vis.ipynb[cell 2] reads them)."""
    with open(path, "rb") as fh:
        return _TolerantUnpickler(fh).load()
