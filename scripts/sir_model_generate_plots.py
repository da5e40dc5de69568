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

# Per-parameter tau_eff panels vs sigma_y with R-hat > 1.01 cross markers
# (reference ``sir_model_generate_plots.py:252-289``).
fixed_noise = df[df.sigma_y > 0]
if fixed_noise.sigma_y.nunique() > 1:
    fig, axes = plt.subplots(
        1,
        len(args.params),
        sharex=True,
        sharey=True,
        figsize=(3 * len(args.params), 2.6),
    )
    for j, p in enumerate(args.params):
        sub_p = fixed_noise[fixed_noise.param == p]
        for i, (algo, sub) in enumerate(sub_p.groupby("algorithm")):
            g = sub.groupby("sigma_y")["tau_eff"].median()
            axes[j].plot(g.index, g.values, "o:", color=f"C{i}", label=algo)
            bad = sub[sub.r_hat > 1.01]
            if len(bad):
                axes[j].plot(bad.sigma_y, bad.tau_eff, "x", color=f"C{i}", ms=6)
        axes[j].set(title=p, xscale="log", yscale="log", xlabel="σ_y")
    axes[0].set_ylabel("time per eff. sample (s)")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    out = args.output_dir / "sir_tau_eff_per_param.pdf"
    fig.savefig(out)
    print(f"wrote {out}")


def load_param_draws(exp_dir, p):
    files = sorted(glob.glob(os.path.join(exp_dir, f"trace_*_{p}.npy")))
    if not files:
        return None
    return np.concatenate([np.load(f) for f in files])


def dirs_with_traces(sub):
    """Per algorithm, the first experiment dir that actually holds traces.

    Multiple runs can share a sigma_y (e.g. a short evidence run whose
    traces were pruned next to the full canonical run); draw-level plots
    must use one that kept its ``trace_*.npy`` files, else the figure is
    silently empty (the round-2 placeholder-figure failure mode).
    """
    out = {}
    for a, s in sub.groupby("algorithm"):
        for d in s["dir"]:
            if glob.glob(os.path.join(d, "trace_*.npy")):
                out[a] = d
                break
    return out


# Posterior histogram overlays: CHMC vs HMC at each noise level (the two
# independent algorithms must agree -- cross-validation of the posterior).
for sigma_y, sub in df.groupby("sigma_y"):
    dirs = dirs_with_traces(sub)
    if len(dirs) < 2:
        continue
    fig, axes = plt.subplots(1, len(args.params), figsize=(3 * len(args.params), 2.8))
    for j, p in enumerate(args.params):
        for algo, d in dirs.items():
            draws = load_param_draws(d, p)
            if draws is None:
                continue
            axes[j].hist(draws, bins=40, density=True, alpha=0.5, label=algo)
        axes[j].set_title(p)
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    out = args.output_dir / f"sir_posterior_sigma_{sigma_y}.pdf"
    fig.savefig(out)
    print(f"wrote {out}")

# Pair plots: lower-triangular scatter matrix over the parameters, both
# algorithms overlaid (reference ``sir_model_generate_plots.py:163-197``;
# heavy-tailed params are log-transformed there -- mirrored via dict below).
log_transform = {"γ", "ϵ", "σ_y"}
for sigma_y, sub in df.groupby("sigma_y"):
    dirs = dirs_with_traces(sub)
    if not dirs:
        continue
    k = len(args.params)
    fig, axes = plt.subplots(k, k, figsize=(2 * k, 2 * k), dpi=120)
    for i_alg, (algo, d) in enumerate(sorted(dirs.items())):
        draws = {}
        for p in args.params:
            arr = load_param_draws(d, p)
            if arr is not None:
                arr = arr.reshape(-1)
                draws[p] = np.log(arr) if p in log_transform else arr
        names = [p for p in args.params if p in draws]
        for r in range(k):
            for c in range(k):
                ax = axes[r, c]
                if r < c or r >= len(names) or c >= len(names):
                    ax.set_visible(False)
                    continue
                pr, pc = names[r], names[c]
                lab = lambda p: f"log {p}" if p in log_transform else p
                if r == c:
                    ax.hist(
                        draws[pr], bins=40, density=True, alpha=0.5,
                        color=f"C{i_alg}", label=algo,
                    )
                    ax.set_yticks([])
                else:
                    sl = slice(None, None, max(1, len(draws[pc]) // 4000))
                    ax.plot(
                        draws[pc][sl], draws[pr][sl], ".", ms=1,
                        color=f"C{i_alg}", alpha=0.4,
                    )
                if r == k - 1:
                    ax.set_xlabel(lab(pc), fontsize=8)
                if c == 0 and r > 0:
                    ax.set_ylabel(lab(pr), fontsize=8)
    axes[0, 0].legend(fontsize=7, loc="upper right")
    fig.tight_layout(pad=0.4)
    out = args.output_dir / f"sir_pair_plots_sigma_{sigma_y}.pdf"
    fig.savefig(out)
    print(f"wrote {out}")
