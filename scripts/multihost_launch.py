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

    if args.mesh_axis == "k":
        # WORST-CASE layout (SCALING.md "K-sharded across hosts"): one
        # solve's rollout axis spans every process, so the per-iteration
        # pmin/psum collectives AND the shard-local map-sample all-gather
        # cross the inter-process fabric (gloo here, DCN on a pod).
        mesh = multihost.global_mesh(num_scenario_shards=1)
    else:
        mesh = multihost.global_mesh()
    n_s = dict(mesh.shape)["scenario"]
    per_proc = n_s // nproc
    S = max(n_s, 2)
    K = 32 * dict(mesh.shape)["k"]

    static, maps, task, u0 = g._make_problem(S=S, K=K, M=8, T=10, H=13,
                                             W=15)
    multihost.assert_uniform_static(static, mesh)

    # Per-process scenario data -> global sharded batch.  When the scenario
    # axis does not span processes (k-mode), the batch is replicated and
    # every process feeds the full S scenarios.
    if per_proc == 0:
        lo, hi = 0, S
    else:
        lo, hi = pid * (S // nproc), (pid + 1) * (S // nproc)
    local = jax.tree.map(lambda x: np.asarray(x)[lo:hi],
                         (maps, task, u0))
    maps_g, task_g, u0_g = multihost.host_local_scenarios(mesh, local)
    keys_g = multihost.host_local_scenarios(
        mesh, np.stack([np.asarray(jax.random.PRNGKey(s))
                        for s in range(S)])[lo:hi])

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


def demo(num_procs=DEMO_PROCS, mesh_axis="scenario"):
    """Spawn the localhost rehearsal and wait for all processes."""
    procs = []
    for pid in range(num_procs):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", "localhost:{}".format(DEMO_PORT),
             "--num-processes", str(num_procs),
             "--process-id", str(pid), "--cpu",
             "--mesh-axis", mesh_axis],
            cwd=REPO))
    rcs = [p.wait(timeout=600) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print("multihost demo: all {} processes OK (mesh axis across "
          "processes: {})".format(num_procs, mesh_axis))


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
    ap.add_argument("--mesh-axis", choices=("scenario", "k"),
                    default="scenario",
                    help="which mesh axis spans processes: 'scenario' "
                         "(default, pure data parallelism over DCN) or 'k' "
                         "(worst case: per-iteration collectives cross the "
                         "inter-process fabric)")
    ap.add_argument("--procs", type=int, default=DEMO_PROCS,
                    help="process count for --demo (2 or 4)")
    args = ap.parse_args()
    if args.demo:
        demo(args.procs, args.mesh_axis)
    else:
        worker(args)


if __name__ == "__main__":
    main()
