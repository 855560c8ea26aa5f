#!/usr/bin/env python3
"""Full reference-scale benchmark (reference: benchmark.ipynb[cell 5-7]):
3 methods x 4 vegetation densities x 10 envs x 5 alphas x 3 realizations =
1,800 closed-loop trials, on the device-batched engine.

Reference wall-clock on RTX 3070: 2,421 s.  Saves the DataFrame + full
experiment config to mppi_benchmark/ (same keys as the reference pickle).

Each (method, alpha) sweep runs in its OWN subprocess and lands in a
partial pickle: the tethered TPU worker occasionally crashes/restarts under
sustained load, and a wedged JAX client cannot recover in-process.  The
parent retries failed sweeps and finally aggregates.  Environments and
ground-truth realizations are regenerated identically in every subprocess
(fixed seeds, fixed generation order), so trials stay PAIRED across methods
exactly like the reference's pre-generated env table.
"""

import argparse
import os
import pickle
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable_compile_cache():
    """Persistent XLA compile cache: sweep subprocesses (and re-runs) reuse
    each other's executables — measured 16 s -> 0.6 s across processes on
    the tethered v5e."""
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


GRASS_DENSITY_LIST = [1.0, 0.7, 0.4, 0.1]
ENVS_PER_DENSITY = 10
TRIALS_PER_ENV = 3
ALPHA_LIST = [1.0, 0.8, 0.6, 0.4, 0.2]
METHOD_LIST = ["noisy_dyn", "risk_dyn", "nom_dyn_risk_cost"]
PAPER_METHOD_LIST = METHOD_LIST + ["baseline"]
GRID_SHAPE = (9, 9)
MUD_MARGIN = 1
RES = 1.0
MAX_STEPS = 150
OUT_DIR = "mppi_benchmark"
# The committed reference notebook says u_std=[2, 3] (benchmark.ipynb[cell
# 5]), but the PAPER pickle's embedded config records u_std=[2, 2] — the
# notebook's [2,2] line is commented out, i.e. it was edited after the
# paper run.  --paper-u-std reproduces the paper's recorded value.
U_STD_ANG = 3.0
DIST_WEIGHT = 1.0


def build_problem():
    import mppi_numba_tpu as m
    world = m.make_benchmark_world(num_bins=20, rng=np.random.RandomState(0))
    cfg = m.Config(T=10.0, dt=0.1, num_grid_samples=1024,
                   num_control_rollouts=1024, max_speed_padding=5.0,
                   num_vis_state_rollouts=50, max_map_dim=(15, 15), seed=1,
                   use_tdm=True)
    params = m.default_benchmark_params(cfg, GRID_SHAPE, MUD_MARGIN)
    params["u_std"] = np.array([2.0, U_STD_ANG])
    if DIST_WEIGHT != 1.0:
        params["dist_weight"] = DIST_WEIGHT
    return world, cfg, params


def _ustd_tag():
    tag = "" if U_STD_ANG == 3.0 else "_us{:g}".format(U_STD_ANG)
    if DIST_WEIGHT != 1.0:
        tag += "_dw{:g}".format(DIST_WEIGHT)
    if sorted(METHOD_LIST) not in (sorted(["noisy_dyn", "risk_dyn",
                                           "nom_dyn_risk_cost"]),
                                   sorted(PAPER_METHOD_LIST)):
        # A --methods-restricted run must not clobber full-run artifacts.
        tag += "_" + "-".join(METHOD_LIST)
    return tag


def sweep_path(method):
    return os.path.join(OUT_DIR, "partial_{}_e{}_t{}{}.pickle".format(
        method, ENVS_PER_DENSITY, TRIALS_PER_ENV, _ustd_tag()))


def run_one_sweep(method):
    """Child-process entry: one method (all alphas) -> partial pickle.

    All 5 alphas share ONE executable per method (traced cvar_alpha /
    alpha_dyn), so per-method isolation costs a single XLA compile while
    keeping crash blast-radius small.
    """
    enable_compile_cache()
    from mppi_numba_tpu.benchmark import run_trials_device
    world, cfg, params = build_problem()
    # The tethered worker's RPC deadline bites on LONG single executions;
    # noisy_dyn (M=1024) runs ~2 ms/solve so the default 30-episode chunk
    # is a ~9 s call healthy — but the shared worker degrades up to ~3x on
    # bad days, and a repeated wedge pattern (round 5: only ever the
    # noisy_dyn sweep, twice in one evening) points at chunks brushing the
    # deadline.  Halve-to-thirds the chunk for the heavy method: ~3 s/call
    # healthy, still amortizing dispatch.
    chunk = 10 if method == "noisy_dyn" else 30
    df = run_trials_device(cfg, world, MAX_STEPS, GRID_SHAPE, MUD_MARGIN,
                           RES, params, GRASS_DENSITY_LIST, ENVS_PER_DENSITY,
                           TRIALS_PER_ENV, ALPHA_LIST, [method], verbose=True,
                           batch_chunk=chunk)
    os.makedirs(OUT_DIR, exist_ok=True)
    df.to_pickle(sweep_path(method))


def main():
    global ENVS_PER_DENSITY, TRIALS_PER_ENV, METHOD_LIST, U_STD_ANG, \
        DIST_WEIGHT
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", metavar="METHOD",
                        help="internal: run one method's sweep")
    parser.add_argument("--retries", type=int, default=2)
    parser.add_argument("--envs", type=int, default=ENVS_PER_DENSITY,
                        help="environments per density (reference: 10; "
                             "paper run: 40)")
    parser.add_argument("--trials", type=int, default=TRIALS_PER_ENV,
                        help="ground-truth realizations per env "
                             "(reference: 3; paper run: 5)")
    parser.add_argument("--paper", action="store_true",
                        help="full paper reproduction: 40 envs x 5 "
                             "realizations x 4 methods incl. the nominal "
                             "'baseline' = 16,000 trials")
    parser.add_argument("--u-std-ang", type=float, default=U_STD_ANG,
                        help="angular control-noise std (committed notebook:"
                             " 3.0; the paper pickle's recorded config: 2.0)")
    parser.add_argument("--paper-u-std", action="store_true",
                        help="shorthand for --u-std-ang 2.0 (the value the "
                             "paper run actually used per its pickle)")
    parser.add_argument("--dist-weight", type=float, default=DIST_WEIGHT,
                        help="stage-cost distance weight (sensitivity "
                             "probes; the paper pickle does not record it, "
                             "so the paper may have used a different "
                             "code-default than today's 1.0)")
    parser.add_argument("--methods", default=None,
                        help="comma list restricting the sweep methods")
    args = parser.parse_args()

    ENVS_PER_DENSITY = args.envs
    TRIALS_PER_ENV = args.trials
    U_STD_ANG = 2.0 if args.paper_u_std else args.u_std_ang
    DIST_WEIGHT = args.dist_weight
    if args.paper:
        ENVS_PER_DENSITY, TRIALS_PER_ENV = 40, 5
        METHOD_LIST = PAPER_METHOD_LIST
    if args.methods:
        METHOD_LIST = args.methods.split(",")

    if args.sweep:
        run_one_sweep(args.sweep)
        return

    import pandas as pd

    t0 = time.time()
    ran_any = False
    pending = list(METHOD_LIST)
    for attempt in range(args.retries + 1):
        failed = []
        for meth in pending:
            if os.path.exists(sweep_path(meth)):
                print("sweep {}: cached".format(meth))
                continue
            ran_any = True
            print("sweep {}: launching".format(meth), flush=True)
            # Watchdog: the tethered worker can HANG (child idles forever at
            # ~zero CPU waiting on a dead RPC), which subprocess isolation
            # alone cannot detect — kill and retry after a generous budget
            # scaled to the method's cost and the trial count.
            # Healthy pace is ~0.2-0.7 s/trial (noisy_dyn) but the shared
            # tethered worker degrades up to ~3x on bad days — budget for
            # the worst observed pace, not the best.
            per_trial_s = 4.0 if meth == "noisy_dyn" else 0.8
            budget = max(1800, int(per_trial_s * ENVS_PER_DENSITY * 4
                                   * TRIALS_PER_ENV * len(ALPHA_LIST)) + 600)
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--sweep", meth,
                     "--envs", str(ENVS_PER_DENSITY),
                     "--trials", str(TRIALS_PER_ENV),
                     "--u-std-ang", str(U_STD_ANG),
                     "--dist-weight", str(DIST_WEIGHT),
                     # The child must see the SAME method list so its
                     # sweep_path() tag matches the parent's (a mismatch
                     # defeats resume caching and the final aggregation).
                     "--methods", ",".join(METHOD_LIST)],
                    cwd=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    timeout=budget)
                rc = r.returncode
            except subprocess.TimeoutExpired:
                print("sweep {} WATCHDOG TIMEOUT after {}s".format(
                    meth, budget))
                rc = -1
            if rc != 0:
                print("sweep {} FAILED (rc={})".format(meth, rc))
                failed.append(meth)
                time.sleep(20)      # give a crashed worker time to restart
        pending = failed
        if not pending:
            break
        print("retrying {} failed sweeps (attempt {}/{})".format(
            len(pending), attempt + 2, args.retries + 1))
    if pending:
        print("GIVING UP on sweeps:", pending)

    frames = [pd.read_pickle(sweep_path(meth)) for meth in METHOD_LIST
              if os.path.exists(sweep_path(meth))]
    df = pd.concat(frames, ignore_index=True)
    wall = time.time() - t0
    if ran_any:
        print("Benchmark took {:.2f}s for {} trials (reference: 2421 s)"
              .format(wall, len(df)))
    else:
        print("All sweeps cached; reporting stats only "
              "(wall-clock not re-measured).")

    print("\nSuccess rate by method:")
    print(df.groupby("method")["success"].mean())
    print("\nSuccess rate by method x alpha:")
    print(df.groupby(["method", "alpha"])["success"].mean().unstack())
    print("\nMean time-to-goal on successes:")
    print(df[df.success].groupby("method")["time_to_goal"].mean())

    fname = os.path.join(OUT_DIR,
                         "envs_{}_trials_{}_densities_{}_device{}.pickle"
                         .format(ENVS_PER_DENSITY, TRIALS_PER_ENV,
                                 len(GRASS_DENSITY_LIST), _ustd_tag()))
    prev = None
    if os.path.exists(fname):
        # Guarded read: a truncated/corrupt aggregate (killed mid-dump —
        # the crash environment this script is built around) must not
        # abort aggregation; fall through to a clean re-save instead.
        try:
            with open(fname, "rb") as fh:
                prev = pickle.load(fh)
            prev["logger"]["method"]
        except Exception as e:  # noqa: BLE001
            print("existing {} unreadable ({}); re-saving"
                  .format(fname, type(e).__name__))
            prev = None
    if prev is not None:
        have = set(prev["logger"]["method"].unique())
        if not ran_any:
            # Only skip when the existing pickle actually covers every
            # method: a GIVING-UP run saves a partial aggregate, and
            # treating that as final would freeze an incomplete artifact
            # (round-5 bug).
            if set(METHOD_LIST) <= have:
                print("not re-saving {} (would clobber the measured wall "
                      "clock)".format(fname))
                return
            print("existing {} lacks methods {}; re-saving from cached "
                  "sweeps (wall-clock kept from the measured partial run)"
                  .format(fname, sorted(set(METHOD_LIST) - have)))
            wall = prev.get("wall_clock_s", wall)
        # Never DROP methods the existing aggregate has but this run's
        # partials lack (e.g. a cleaned-up partial + a failed re-sweep):
        # merge the previous rows in so a less complete run cannot
        # clobber a more complete artifact.
        missing_here = have - set(df["method"].unique())
        if missing_here:
            print("merging methods {} from the existing aggregate"
                  .format(sorted(missing_here)))
            keep = prev["logger"][prev["logger"]["method"]
                                  .isin(sorted(missing_here))]
            df = pd.concat([df, keep], ignore_index=True)

    world, cfg, params = build_problem()
    os.makedirs(OUT_DIR, exist_ok=True)
    out = dict(
        logger=df, cfg=cfg, max_speed=3.0, max_steps=MAX_STEPS,
        grid_shape=GRID_SHAPE, mud_margin=MUD_MARGIN, res=RES,
        num_pmf_bins=world["num_pmf_bins"], bin_values=world["bin_values"],
        bin_values_bounds=world["bin_values_bounds"],
        default_mppi_params=params,
        grass_density_list=GRASS_DENSITY_LIST,
        envs_per_density=ENVS_PER_DENSITY, trials_per_env=TRIALS_PER_ENV,
        alpha_list=ALPHA_LIST, method_list=METHOD_LIST,
        pmf_bounds=[0, 1.0], bush_weights=[0.6, 0.4], bush_means=[0, 0.8],
        bush_std=[0.15, 0.1], dirt_weights=[1], dirt_means=[0.65],
        dirt_std=[0.1], wall_clock_s=wall, engine="device")
    with open(fname, "wb") as fh:
        pickle.dump(out, fh)
    print("saved:", fname)


if __name__ == "__main__":
    main()
