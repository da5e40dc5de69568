"""Generate comparison plots for the FHN noisy-obs experiments (CHMC vs HMC).

TPU-native counterpart of the reference's noisy-obs plot generator: overlays
time-per-effective-sample against the observation noise level for the CHMC
and HMC algorithm variants, flagging runs with split-R-hat > 1.01.
"""

import argparse
import glob
import json
import os
from pathlib import Path

import numpy as np

parser = argparse.ArgumentParser(
    description="Generate FHN noisy-obs comparison plots",
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


def collect(subdir, algorithm):
    rows = []
    for exp_dir in sorted(glob.glob(str(args.experiment_dir / subdir / "sigma_*"))):
        try:
            with open(os.path.join(exp_dir, "summary.json")) as f:
                summary = json.load(f)
            with open(os.path.join(exp_dir, "args.json")) as f:
                cfg = json.load(f)
        except FileNotFoundError:
            continue
        for p in args.params:
            ess = summary.get("ess_bulk", {}).get(p)
            rhat = summary.get("r_hat", {}).get(p, np.nan)
            if not ess:
                continue
            rows.append(
                {
                    "algorithm": algorithm,
                    "sigma_y": cfg["observation_noise_std"],
                    "metric_type": cfg.get("metric_type", "-"),
                    "param": p,
                    "tau_eff": summary["total_sampling_time"] / ess,
                    "r_hat": rhat,
                    "converged": rhat <= 1.01,
                    "dir": exp_dir,
                }
            )
    return rows


rows = collect("fhn_noisy_chmc", "CHMC") + collect("fhn_noisy_hmc", "HMC")
if not rows:
    raise SystemExit(f"no experiment outputs found under {args.experiment_dir}")
os.makedirs(args.output_dir, exist_ok=True)
df = pd.DataFrame(rows)
df.to_csv(args.output_dir / "fhn_noisy_summary.csv", index=False)

fig, ax = plt.subplots(figsize=(5, 3.4))
for (algo, metric), sub in df.groupby(["algorithm", "metric_type"]):
    g = sub.groupby("sigma_y")["tau_eff"].median()
    label = algo if metric in ("-", "identity") else f"{algo} ({metric})"
    (line,) = ax.plot(g.index, g.values, "o-", label=label)
    bad = sub[~sub.converged]
    if len(bad):
        ax.plot(bad.sigma_y, bad.tau_eff, "x", color=line.get_color(), ms=8)
ax.set(
    xscale="log",
    yscale="log",
    xlabel="observation noise σ_y",
    ylabel="time per effective sample (s)",
)
ax.legend(fontsize=8)
fig.tight_layout()
out = args.output_dir / "fhn_noisy_chmc_vs_hmc.pdf"
fig.savefig(out)
print(f"wrote {out}")

# Per-parameter tau_eff panels vs sigma_y with R-hat > 1.01 cross markers
# (reference ``fhn_model_noisy_obs_generate_plots.py:62-91``).
fig, axes = plt.subplots(
    1, len(args.params), sharex=True, sharey=True, figsize=(3 * len(args.params), 2.6)
)
for j, p in enumerate(args.params):
    sub_p = df[df.param == p]
    for i, (algo, sub) in enumerate(sub_p.groupby("algorithm")):
        g = sub.groupby("sigma_y")["tau_eff"].median()
        axes[j].plot(g.index, g.values, "o:", color=f"C{i}", label=algo)
        bad = sub[~sub.converged]
        if len(bad):
            axes[j].plot(bad.sigma_y, bad.tau_eff, "x", color=f"C{i}", ms=6)
    axes[j].set(title=p, xscale="log", yscale="log", xlabel="σ_y")
axes[0].set_ylabel("time per eff. sample (s)")
axes[0].legend(fontsize=7)
fig.tight_layout()
out = args.output_dir / "fhn_noisy_tau_eff_per_param.pdf"
fig.savefig(out)
print(f"wrote {out}")

# Posterior overlays: the same posterior sampled by the two independent
# algorithms must agree (the reference's cross-implementation validation
# role, filled by its Julia bridge baseline overlay).
for sigma_y, sub in df.groupby("sigma_y"):
    dirs = {a: s["dir"].iloc[-1] for a, s in sub.groupby("algorithm") if "dir" in s}
    if len(dirs) < 2:
        continue
    fig, axes = plt.subplots(
        1, len(args.params), figsize=(3 * len(args.params), 2.6)
    )
    for j, p in enumerate(args.params):
        for algo, d in sorted(dirs.items()):
            files = glob.glob(os.path.join(d, f"trace_*_{p}.npy"))
            if not files:
                continue
            draws = np.concatenate([np.load(f) for f in files])
            axes[j].hist(draws, bins=40, density=True, alpha=0.5, label=algo)
        axes[j].set_title(p)
        axes[j].set_yticks([])
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    out = args.output_dir / f"fhn_noisy_posterior_sigma_{sigma_y}.pdf"
    fig.savefig(out)
    print(f"wrote {out}")
