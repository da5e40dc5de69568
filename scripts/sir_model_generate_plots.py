"""Generate posterior and efficiency plots for the SIR experiments.

TPU-native counterpart of the reference's SIR plot generator: per-noise-level
time-per-effective-sample bars (CHMC vs HMC) and cross-algorithm posterior
histogram overlays (the reference's cross-implementation validation of the
posterior, ``sir_model_generate_plots.py:134-197``).
"""

import argparse
import glob
import json
import os
from pathlib import Path

import numpy as np

parser = argparse.ArgumentParser(
    description="Generate SIR model comparison plots",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
parser.add_argument("--experiment-dir", type=Path, default="experiments")
parser.add_argument("--output-dir", type=Path, default="figures")
parser.add_argument("--params", nargs="+", default=["β", "γ", "ζ", "ϵ"])
args = parser.parse_args()

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

os.makedirs(args.output_dir, exist_ok=True)


def latest_dirs(subdir):
    return sorted(glob.glob(str(args.experiment_dir / subdir / "sigma_*")))


rows = []
for algo, subdir in (("CHMC", "sir_chmc"), ("HMC", "sir_hmc")):
    for exp_dir in latest_dirs(subdir):
        try:
            with open(os.path.join(exp_dir, "summary.json")) as f:
                summary = json.load(f)
            with open(os.path.join(exp_dir, "args.json")) as f:
                cfg = json.load(f)
        except FileNotFoundError:
            continue
        for p in args.params:
            ess = summary.get("ess_bulk", {}).get(p)
            if ess:
                rows.append(
                    {
                        "algorithm": algo,
                        "sigma_y": cfg["observation_noise_std"],
                        "param": p,
                        "tau_eff": summary["total_sampling_time"] / ess,
                        "r_hat": summary.get("r_hat", {}).get(p, np.nan),
                        "dir": exp_dir,
                    }
                )

if not rows:
    raise SystemExit(f"no experiment outputs found under {args.experiment_dir}")
df = pd.DataFrame(rows)
df.to_csv(args.output_dir / "sir_summary.csv", index=False)

# Efficiency bars per noise level.
fig, ax = plt.subplots(figsize=(6, 3.4))
pivot = df.groupby(["sigma_y", "algorithm"])["tau_eff"].median().unstack()
pivot.plot.bar(ax=ax, logy=True)
ax.set(xlabel="observation noise σ_y", ylabel="time per eff. sample (s)")
fig.tight_layout()
fig.savefig(args.output_dir / "sir_tau_eff.pdf")
print(f"wrote {args.output_dir / 'sir_tau_eff.pdf'}")

# Posterior histogram overlays: CHMC vs HMC at each noise level (the two
# independent algorithms must agree -- cross-validation of the posterior).
for sigma_y, sub in df.groupby("sigma_y"):
    dirs = {a: s["dir"].iloc[0] for a, s in sub.groupby("algorithm")}
    if len(dirs) < 2:
        continue
    fig, axes = plt.subplots(1, len(args.params), figsize=(3 * len(args.params), 2.8))
    for j, p in enumerate(args.params):
        for algo, d in dirs.items():
            files = glob.glob(os.path.join(d, f"trace_*_{p}.npy"))
            if not files:
                continue
            draws = np.concatenate([np.load(f) for f in files])
            axes[j].hist(draws, bins=40, density=True, alpha=0.5, label=algo)
        axes[j].set_title(p)
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    out = args.output_dir / f"sir_posterior_sigma_{sigma_y}.pdf"
    fig.savefig(out)
    print(f"wrote {out}")
