"""Posterior corner plot + convergence diagnostics for a completed FHN run.

Analysis-figure generator for canonical-run evidence (reference analog:
the corner/trace figures of ``FitzHugh-Nagumo_example.ipynb`` cells 40-47
and the per-parameter diagnostics in
``scripts/fhn_model_noisy_obs_generate_plots.py``).  Reads the on-disk
trace contract (``trace_<chain>_<param>.npy`` + ``summary.json``) written
by the experiment CLIs and produces:

  corner_<tag>.pdf        pooled-draw corner plot, truth lines overlaid
  traces_<tag>.pdf        per-chain trace plots with R-hat annotations
"""

import argparse
import glob
import json
import os
import re
from pathlib import Path

import numpy as np

parser = argparse.ArgumentParser(
    description="Corner + trace figures for a completed FHN experiment run",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
parser.add_argument("--run-dir", type=Path, required=True)
parser.add_argument("--output-dir", type=Path, default="figures")
parser.add_argument("--tag", default=None, help="filename tag (default: run dir name)")
parser.add_argument(
    "--params", nargs="+", default=["σ", "ϵ", "γ", "β", "x_0[0]", "x_0[1]"]
)
parser.add_argument(
    "--truth",
    nargs="+",
    type=float,
    default=[0.3, 0.1, 1.5, 0.8],
    help="data-generating values for the leading params (FHN defaults)",
)
args = parser.parse_args()

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load_param(run_dir, p):
    """Stack per-chain traces for one param -> (num_chain, num_iter)."""
    if p.startswith("x_0"):
        idx = int(re.search(r"\[(\d+)\]", p).group(1))
        files = sorted(
            glob.glob(str(run_dir / "trace_*_x_0.npy")),
            key=lambda f: int(re.search(r"trace_(\d+)_", f).group(1)),
        )
        return np.stack([np.load(f)[:, idx] for f in files])
    files = sorted(
        glob.glob(str(run_dir / f"trace_*_{p}.npy")),
        key=lambda f: int(re.search(r"trace_(\d+)_", f).group(1)),
    )
    return np.stack([np.load(f) for f in files])


if not glob.glob(str(args.run_dir / "trace_*.npy")):
    raise SystemExit(
        f"no trace_*.npy files under {args.run_dir} — run the experiment with "
        "trace output (or use scripts/summarize_checkpoint.py --emit-traces "
        "to materialise traces from a checkpoint)"
    )
with open(args.run_dir / "summary.json") as f:
    summary = json.load(f)
tag = args.tag or args.run_dir.name
os.makedirs(args.output_dir, exist_ok=True)

chains = {p: load_param(args.run_dir, p) for p in args.params}
n_chain, n_iter = next(iter(chains.values())).shape
truth = dict(zip(["σ", "ϵ", "γ", "β"], args.truth))

# --- corner plot (pooled draws) ---
k = len(args.params)
fig, axes = plt.subplots(k, k, figsize=(1.7 * k, 1.7 * k))
for i, pi in enumerate(args.params):
    xi = chains[pi].ravel()
    for j, pj in enumerate(args.params):
        ax = axes[i, j]
        if j > i:
            ax.axis("off")
            continue
        if i == j:
            ax.hist(xi, bins=60, density=True, color="C0", alpha=0.8)
            if pi in truth:
                ax.axvline(truth[pi], color="C3", lw=1)
        else:
            xj = chains[pj].ravel()
            ax.hist2d(xj, xi, bins=50, cmap="Blues")
            if pj in truth:
                ax.axvline(truth[pj], color="C3", lw=0.8)
            if pi in truth:
                ax.axhline(truth[pi], color="C3", lw=0.8)
        if i == k - 1:
            ax.set_xlabel(pj, fontsize=9)
        else:
            ax.set_xticklabels([])
        if j == 0 and i > 0:
            ax.set_ylabel(pi, fontsize=9)
        else:
            ax.set_yticklabels([])
        ax.tick_params(labelsize=6)
fig.suptitle(
    f"{tag}: {n_chain} chains x {n_iter} draws (red = data-generating value)",
    fontsize=10,
)
fig.tight_layout()
out = args.output_dir / f"corner_{tag}.pdf"
fig.savefig(out)
print(f"wrote {out}")

# --- per-chain traces with R-hat annotations ---
fig, axes = plt.subplots(len(args.params), 1, figsize=(7, 1.5 * len(args.params)),
                         sharex=True)
for ax, p in zip(axes, args.params):
    for c in range(min(n_chain, 16)):
        ax.plot(chains[p][c], lw=0.3, alpha=0.6)
    rhat = summary.get("r_hat", {}).get(p, float("nan"))
    ess = summary.get("ess_bulk", {}).get(p, float("nan"))
    flag = " ⚠" if rhat > 1.01 else ""
    ax.set_ylabel(p, fontsize=9)
    ax.set_title(f"R̂={rhat:.3f}{flag}   ESS_bulk={ess:.0f}", fontsize=8, loc="right")
    if p in truth:
        ax.axhline(truth[p], color="C3", lw=0.8, ls="--")
axes[-1].set_xlabel("main iteration")
fig.tight_layout()
out = args.output_dir / f"traces_{tag}.pdf"
fig.savefig(out)
print(f"wrote {out}")
