"""Profiling and timing utilities (SURVEY §5.1).

The reference's observability is ``time.time()`` prints around memory init
and per-sweep timers.  Here:

* ``solve_timer`` — an honest latency measurement helper.  Naive
  ``block_until_ready`` timing is unreliable when the host<->device link is
  high-latency and dispatch is asynchronous, so the timer CHAINS N calls on
  device (output feeds the next input) and fetches once.
* ``trace`` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible trace directory with per-kernel cost breakdowns.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir="/tmp/mppi_trace"):
    """Capture an XLA/TPU profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def chained_solve_time(solve_fn, maps, task, u0, num_iters=30,
                       key=None, fetch_rtt_s=0.0):
    """Median-free, pipelining-proof per-solve latency.

    Runs ``num_iters`` solves inside one jitted ``fori_loop`` where the
    optimized sequence of solve i seeds solve i+1 (a real receding-horizon
    dependency chain), fetches the final result once, and divides.  Pass the
    measured host fetch round-trip as ``fetch_rtt_s`` to subtract it.
    """
    key = jax.random.PRNGKey(0) if key is None else key

    @jax.jit
    def chain(key, u0):
        def body(i, carry):
            u, key = carry
            key, sub = jax.random.split(key)
            u, _ = solve_fn(sub, maps, task, u)
            return (u, key)
        u, _ = jax.lax.fori_loop(0, num_iters, body, (u0, key))
        return u

    u = chain(key, u0)
    np.asarray(u)  # compile + warm
    t0 = time.perf_counter()
    u = chain(jax.random.fold_in(key, 1), jnp.zeros_like(u0))
    np.asarray(u)
    total = time.perf_counter() - t0 - fetch_rtt_s
    return total / num_iters


def chained_kernel_time(kernel_fn, v0, num_iters=20, reps=3,
                        fetch_rtt_s=0.03):
    """Per-call latency of a single kernel via the chained-loop protocol.

    ``kernel_fn(v) -> costs`` is called ``num_iters`` times inside one
    jitted ``fori_loop``; each iteration's input depends infinitesimally on
    the previous costs (``v + min(costs) * 1e-30``), forcing serial
    execution with ONE host fetch at the end (CLAUDE.md rule: never trust
    naive ``block_until_ready`` through the tunneled worker).  Returns the
    best-of-``reps`` per-call time in milliseconds, with ``fetch_rtt_s``
    subtracted from each rep's total.
    """
    @jax.jit
    def chain(v):
        def body(i, v):
            return v + jnp.min(kernel_fn(v)) * 1e-30
        return jax.lax.fori_loop(0, num_iters, body, v)

    np.asarray(chain(v0))  # compile + warm
    best = np.inf
    for rep in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(v0 + jnp.float32(1e-6 * rep)))
        best = min(best, (time.perf_counter() - t0 - fetch_rtt_s) / num_iters)
    return 1000.0 * best


def device_liveness_probe(deadline_s=75.0, platform=None):
    """Check the accelerator answers a trivial computation within a deadline.

    The tethered TPU worker has a documented wedge mode where even
    ``jnp.ones((8, 8)).sum()`` blocks for hours; a wedged in-process JAX
    client cannot recover, so the probe runs in a SUBPROCESS (killed on
    timeout — never leaves a second live TPU client behind).  Returns
    ``(alive: bool, detail: str)``; run it BEFORE this process touches the
    device so benchmark artifacts can name "worker unresponsive" in under
    ~deadline_s instead of burning a full watchdog cycle.
    """
    import subprocess
    import sys
    # ``platform`` forces a backend via jax.config.update — the ONLY
    # reliable override here, since this environment's sitecustomize
    # clobbers a JAX_PLATFORMS env var at interpreter start.
    force = ("jax.config.update('jax_platforms', {!r}); ".format(platform)
             if platform else "")
    code = ("import jax; " + force + "import jax.numpy as jnp; "
            "jnp.ones((8, 8)).sum().block_until_ready()")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=deadline_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, "liveness probe timed out after {:.0f} s".format(
            deadline_s)
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return False, "liveness probe exited rc={}: {}".format(
            r.returncode, tail[-1] if tail else "no stderr")
    return True, "ok"


def measure_fetch_rtt(n=5):
    """Estimate the host<->device fetch round trip for timing correction."""
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(x * 1.0)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(x + float(i))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
