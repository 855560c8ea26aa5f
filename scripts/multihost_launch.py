#!/usr/bin/env python3
"""Multi-host MPPI launch: one process per host, a mesh spanning all.

On a real TPU pod slice, run THIS SCRIPT unmodified on every host (JAX
autodetects coordinator/process topology from the TPU environment):

    python scripts/multihost_launch.py

On a CPU/GPU cluster (or for a localhost rehearsal), pass the process
group explicitly; ``--demo`` spawns the whole 2-process x 2-virtual-CPU-
device rehearsal on this machine and checks the sharded solve against the
single-device solver:

    python scripts/multihost_launch.py --demo

What one process does:
  1. ``multihost.initialize`` — join the process group.
  2. ``multihost.global_mesh`` — (scenario, k) mesh over ALL devices;
     scenario spans processes (DCN), rollouts span local devices (ICI).
  3. ``multihost.assert_uniform_static`` — fail fast on config mismatch.
  4. ``multihost.host_local_scenarios`` — feed per-host scenario data.
  5. run the sharded solve; fetch only the locally-addressable results.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEMO_PORT = 12355
DEMO_PROCS = 2
DEMO_LOCAL_DEVICES = 2


def worker(args):
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count={}".format(
                DEMO_LOCAL_DEVICES))
    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mppi_numba_tpu.parallel import multihost

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    pid = jax.process_index()
    nproc = jax.process_count()
    print("[proc {}/{}] local devices: {}, global devices: {}".format(
        pid, nproc, len(jax.local_devices()), len(jax.devices())), flush=True)

    import jax.numpy as jnp
    import __graft_entry__ as g
    from mppi_numba_tpu.parallel.sharded import get_sharded_terrain_solver

    mesh = multihost.global_mesh()
    n_s = dict(mesh.shape)["scenario"]
    per_proc = n_s // nproc
    S = n_s
    K = 32 * dict(mesh.shape)["k"]

    static, maps, task, u0 = g._make_problem(S=S, K=K, M=8, T=10, H=13,
                                             W=15)
    multihost.assert_uniform_static(static, mesh)

    # Per-process scenario data -> global sharded batch.
    lo = pid * per_proc
    local = jax.tree.map(lambda x: np.asarray(x)[lo:lo + per_proc],
                         (maps, task, u0))
    maps_g, task_g, u0_g = multihost.host_local_scenarios(mesh, local)
    keys_g = multihost.host_local_scenarios(
        mesh, np.stack([np.asarray(jax.random.PRNGKey(s))
                        for s in range(S)])[lo:lo + per_proc])

    solver = get_sharded_terrain_solver(static, mesh)
    u, costs = solver(keys_g, maps_g, task_g, u0_g)

    # Fetch only locally-addressable shards; verify against the
    # single-device solver for OUR scenarios.
    from mppi_numba_tpu.solver import get_terrain_solver
    single = get_terrain_solver(static)
    local_u = {int(sh.index[0].start or 0) + i: np.asarray(sh.data)[i]
               for sh in u.addressable_shards
               for i in range(sh.data.shape[0])}
    checked = 0
    for s, u_s in sorted(local_u.items()):
        maps_s = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[s]), maps)
        task_s = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[s]), task)
        u_ref, _ = single(jax.random.PRNGKey(s), maps_s, task_s,
                          jnp.zeros((10, 2), jnp.float32))
        np.testing.assert_allclose(u_s, np.asarray(u_ref), rtol=2e-4,
                                   atol=2e-5)
        checked += 1
    print("[proc {}] sharded solve matches single-device on {} local "
          "scenarios: OK".format(pid, checked), flush=True)


def demo():
    """Spawn the 2-process localhost rehearsal and wait for both."""
    procs = []
    for pid in range(DEMO_PROCS):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", "localhost:{}".format(DEMO_PORT),
             "--num-processes", str(DEMO_PROCS),
             "--process-id", str(pid), "--cpu"],
            cwd=REPO))
    rcs = [p.wait(timeout=300) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print("multihost demo: all {} processes OK".format(DEMO_PROCS))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true",
                    help="run the 2-process localhost CPU rehearsal")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (TPU pods: omit)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend with {} virtual devices"
                    .format(DEMO_LOCAL_DEVICES))
    args = ap.parse_args()
    if args.demo:
        demo()
    else:
        worker(args)


if __name__ == "__main__":
    main()
