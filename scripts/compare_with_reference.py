#!/usr/bin/env python3
"""Side-by-side statistical comparison: this engine's TPU benchmark run vs
the reference's committed 16,000-trial paper run.

Loads the reference's own pickle
(`/root/reference/mppi_benchmark/envs_40_trials_5_*.pickle`, written by its
benchmark.ipynb on an RTX 3070) through the tolerant unpickler and overlays
success-rate-by-alpha curves for the three shared methods against our
device-batched TPU run.  Writes plots/reference_comparison.png.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from mppi_numba_tpu.checkpoint import load_experiment, load_reference_experiment

DEFAULT_REF = ("/root/reference/mppi_benchmark/"
               "envs_40_trials_5_densities_4_date_20220907-2234.pickle")
DEFAULT_OURS = "mppi_benchmark/envs_40_trials_5_densities_4_device.pickle"

LABELS = {
    "noisy_dyn": "Stochastic Traction (Proposed)",
    "risk_dyn": "Deterministic Traction (CVaR)",
    "nom_dyn_risk_cost": "Nominal + CVaR Time Cost",
    "baseline": "Nominal Dynamics (baseline)",
}
COLORS = {"noisy_dyn": "tab:red", "risk_dyn": "tab:green",
          "nom_dyn_risk_cost": "tab:blue", "baseline": "k"}


def main():
    ours_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OURS
    ref_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_REF
    ours = load_experiment(ours_path)
    ref = load_reference_experiment(ref_path)
    alphas = sorted(set(ours["alpha_list"]))

    fig, ax = plt.subplots(figsize=(7.5, 5))
    shared = [m for m in LABELS
              if m in set(ours["logger"].method) & set(ref["logger"].method)]
    tag_ours = "ours (TPU v5e, {}k trials)".format(
        len(ours["logger"]) // 1000)
    tag_ref = "reference paper run (RTX 3070, {}k trials)".format(
        len(ref["logger"]) // 1000)
    for meth in shared:
        for data, style, tag in ((ours, "-o", tag_ours),
                                 (ref, "--s", tag_ref)):
            df = data["logger"]
            rates = [df[(df.method == meth) & (df.alpha == a)]["success"]
                     .mean() for a in alphas]
            ax.plot(alphas, rates, style, color=COLORS[meth],
                    alpha=1.0 if style == "-o" else 0.55,
                    label="{} — {}".format(LABELS[meth], tag))
    ax.set_xlabel("CVaR alpha")
    ax.set_ylabel("success rate")
    ax.set_ylim(0, 1.02)
    ax.set_title("Success rate by alpha: TPU engine vs reference paper data")
    ax.legend(fontsize=7.5, loc="lower left")
    ax.grid(alpha=0.3)
    out = "plots/reference_comparison.png"
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("saved", out)

    print("\nOverall success (ours vs reference paper run):")
    for meth in shared:
        o = ours["logger"][ours["logger"].method == meth]["success"].mean()
        r = ref["logger"][ref["logger"].method == meth]["success"].mean()
        print("  {:22s} {:.3f} vs {:.3f}".format(meth, o, r))

    # Per-density breakdown (reference: benchmark_vis.ipynb[cell 8-10]
    # grouping) — localizes WHERE any success / time-to-goal delta between
    # the engines comes from.
    densities = sorted(set(ours["grass_density_list"]))
    fig, axes = plt.subplots(2, len(densities),
                             figsize=(3.4 * len(densities), 7.2),
                             sharex=True, squeeze=False)
    for di, dens in enumerate(densities):
        ax_s, ax_t = axes[0, di], axes[1, di]
        for meth in shared:
            for data, style in ((ours, "-o"), (ref, "--s")):
                df = data["logger"]
                sel = (df.method == meth) & (df.grass_density == dens)
                rates = [df[sel & (df.alpha == a)]["success"].mean()
                         for a in alphas]
                ttg = [df[sel & (df.alpha == a) & df.success]
                       ["time_to_goal"].mean() for a in alphas]
                a_vis = 1.0 if style == "-o" else 0.55
                ax_s.plot(alphas, rates, style, color=COLORS[meth],
                          alpha=a_vis, ms=4)
                ax_t.plot(alphas, ttg, style, color=COLORS[meth],
                          alpha=a_vis, ms=4)
        ax_s.set_title("veg. density {}".format(dens))
        ax_s.set_ylim(0, 1.02)
        ax_s.grid(alpha=0.3)
        ax_t.grid(alpha=0.3)
        ax_t.set_xlabel("CVaR alpha")
        if di == 0:
            ax_s.set_ylabel("success rate")
            ax_t.set_ylabel("time-to-goal on successes (s)")
    handles = [plt.Line2D([], [], color=COLORS[m], label=LABELS[m])
               for m in shared]
    handles += [plt.Line2D([], [], color="gray", ls="-", marker="o",
                           label="ours (TPU)"),
                plt.Line2D([], [], color="gray", ls="--", marker="s",
                           label="reference paper run")]
    fig.legend(handles=handles, fontsize=8, loc="lower center", ncol=3)
    fig.suptitle("Per-density success and time-to-goal: TPU engine vs "
                 "reference paper data")
    fig.tight_layout(rect=(0, 0.06, 1, 0.97))
    out2 = "plots/reference_comparison_by_density.png"
    fig.savefig(out2, dpi=110, bbox_inches="tight")
    print("saved", out2)

    print("\nMean time-to-goal on successes by density "
          "(ours vs reference paper run):")
    for meth in shared:
        for dens in densities:
            od = ours["logger"]
            rd = ref["logger"]
            o = od[(od.method == meth) & (od.grass_density == dens)
                   & od.success]["time_to_goal"].mean()
            r = rd[(rd.method == meth) & (rd.grass_density == dens)
                   & rd.success]["time_to_goal"].mean()
            print("  {:22s} density {:.1f}: {:6.2f}s vs {:6.2f}s"
                  .format(meth, dens, o, r))


if __name__ == "__main__":
    main()
