"""Generate ESS-cost scaling plots for the FHN noiseless-obs CHMC experiments.

TPU-native counterpart of the reference's plot generator: reads the
experiment output directories produced by
``fhn_model_noiseless_obs_chmc_experiment.py`` (whose on-disk contract
matches the reference's), computes the derived cost metrics

* ``tau_step``  -- average wall time per constrained leapfrog step
  (total sampling time / total integrator steps),
* ``n_bar``     -- average projection-solver iterations per step,
* ``tau_eff``   -- sampling time per effective sample (per parameter),

and plots them against the grid variables R (obs per subsequence),
S (steps per obs) and T (number of obs) with log-log least-squares fits.
"""

import argparse
import glob
import json
import os
from pathlib import Path

import numpy as np

parser = argparse.ArgumentParser(
    description="Generate FHN noiseless-obs CHMC scaling plots",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
parser.add_argument("--experiment-dir", type=Path, default="experiments")
parser.add_argument("--output-dir", type=Path, default="figures")
parser.add_argument("--params", nargs="+", default=["σ", "ϵ", "γ", "β"])
args = parser.parse_args()

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

root = args.experiment_dir / "fhn_noiseless_chmc"
os.makedirs(args.output_dir, exist_ok=True)

rows = []
for exp_dir in sorted(glob.glob(str(root / "R_*_S_*_T_*"))):
    try:
        with open(os.path.join(exp_dir, "summary.json")) as f:
            summary = json.load(f)
        with open(os.path.join(exp_dir, "args.json")) as f:
            cfg = json.load(f)
    except FileNotFoundError:
        continue
    n_step_files = glob.glob(os.path.join(exp_dir, "stats_*_n_step.npy"))
    total_steps = sum(int(np.load(f).sum()) for f in n_step_files)
    solver_files = glob.glob(os.path.join(exp_dir, "trace_*_constr_calls.npy"))
    total_solver = sum(
        int(np.load(f)[-1] - np.load(f)[0]) for f in solver_files
    )
    row = {
        "R": cfg["num_obs_per_subseq"],
        "S": cfg["num_steps_per_obs"],
        "T": cfg["num_obs"],
        "splitting": cfg["splitting"],
        "seed": cfg["seed"],
        "time": summary["total_sampling_time"],
        "total_steps": total_steps,
        "tau_step": summary["total_sampling_time"] / max(total_steps, 1),
        "n_bar": total_solver / max(2 * total_steps, 1),
    }
    for p in args.params:
        ess = summary.get("ess_bulk", {}).get(p)
        if ess:
            row[f"tau_eff_{p}"] = summary["total_sampling_time"] / ess
        row[f"r_hat_{p}"] = summary.get("r_hat", {}).get(p, np.nan)
    rows.append(row)

if not rows:
    raise SystemExit(f"no experiment outputs found under {root}")
df = pd.DataFrame(rows)
df.to_csv(args.output_dir / "fhn_noiseless_chmc_summary.csv", index=False)


def loglog_fit_label(ax, x, y, xname, yname):
    good = (x > 0) & (y > 0) & np.isfinite(y)
    if good.sum() < 2:
        return None
    slope, intercept = np.polyfit(np.log(x[good]), np.log(y[good]), 1)
    xs = np.linspace(x[good].min(), x[good].max(), 50)
    ax.plot(xs, np.exp(intercept) * xs**slope, "--", lw=0.8)
    return f"{yname} ∝ {xname}^{slope:.2f}"


for grid_var, fixed in (("R", ("S", "T")), ("S", ("R", "T")), ("T", ("R", "S"))):
    sub = df[df.splitting == "standard"]
    if sub.empty:
        sub = df
    # hold the other grid variables at their modal (default) values
    for fv in fixed:
        if sub[fv].nunique() > 1:
            sub = sub[sub[fv] == sub[fv].mode().iloc[0]]
    if sub[grid_var].nunique() < 2:
        continue
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    g = sub.groupby(grid_var)
    x = np.asarray(sorted(sub[grid_var].unique()), dtype=float)

    tau_step = g["tau_step"].median().values
    axes[0].plot(x, tau_step, "o-")
    label = loglog_fit_label(axes[0], x, tau_step, grid_var, "τ_step")
    axes[0].set(xscale="log", yscale="log", xlabel=grid_var, ylabel="τ_step (s)")
    if label:
        axes[0].set_title(label, fontsize=9)

    n_bar = g["n_bar"].median().values
    axes[1].plot(x, n_bar, "o-")
    axes[1].set(xscale="log", xlabel=grid_var, ylabel="avg solver iters / step")
    axes[1].set_ylim(0, max(7, np.nanmax(n_bar) * 1.1))

    for p in args.params:
        col = f"tau_eff_{p}"
        if col in sub:
            (line,) = axes[2].plot(x, g[col].median().values, "o-", label=p)
            # R-hat > 1.01 runs marked with crosses (reference
            # ``fhn_model_noisy_obs_generate_plots.py:69-76`` flagging).
            bad = sub[sub[f"r_hat_{p}"] > 1.01]
            if len(bad):
                axes[2].plot(
                    bad[grid_var], bad[col], "x", color=line.get_color(), ms=8
                )
    axes[2].set(
        xscale="log", yscale="log", xlabel=grid_var, ylabel="time per eff. sample (s)"
    )
    axes[2].legend(fontsize=7)
    fig.tight_layout()
    out = args.output_dir / f"fhn_noiseless_chmc_vs_{grid_var}.pdf"
    fig.savefig(out)
    print(f"wrote {out}")

# Splitting comparison: standard vs Gaussian splitting tau_eff overlay when
# both are present (the reference grid drivers loop over both splittings).
if df.splitting.nunique() > 1:
    fig, axes = plt.subplots(
        1, len(args.params), sharey=True, figsize=(3 * len(args.params), 2.6)
    )
    for j, p in enumerate(args.params):
        col = f"tau_eff_{p}"
        for i, (split, sub) in enumerate(df.groupby("splitting")):
            if col not in sub:
                continue
            g = sub.groupby("R")[col].median()
            axes[j].plot(g.index, g.values, "o:", color=f"C{i}", label=split)
        axes[j].set(title=p, xscale="log", yscale="log", xlabel="R")
    axes[0].set_ylabel("time per eff. sample (s)")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    out = args.output_dir / "fhn_noiseless_chmc_splitting_comparison.pdf"
    fig.savefig(out)
    print(f"wrote {out}")
