"""Recompute the diagnostic columns of an experiment's ``summary.json``.

Loads the per-chain ``trace_<chain>_<param>.npy`` files written by the
experiment CLIs (the reference's on-disk trace contract), stacks them to
``(chains, draws)`` and recomputes mean / sd / ess_bulk / ess_tail / r_hat
with ``manifold_mcmc_tpu.utils.stats``, preserving every other key in
``summary.json`` (timings, call totals, step size).

Exists so that diagnostics fixes (e.g. the average-rank tie handling in
``_rank_normalize`` that un-pinned ``ess_tail``) can be re-applied to
completed runs without re-running them.

Usage: python scripts/recompute_summary_stats.py OUTPUT_DIR [OUTPUT_DIR ...]
"""

import glob
import json
import re
import sys

import numpy as np

sys.path.insert(0, ".")

from manifold_mcmc_tpu.utils import stats


def recompute(out_dir):
    with open(f"{out_dir}/summary.json") as f:
        summary = json.load(f)
    params = list(summary["mean"])
    traces = {}
    for p in params:
        # Component labels like "x_0[1]" live in trace_<chain>_x_0.npy
        # with a trailing component axis.
        m_comp = re.match(r"^(.*)\[(\d+)\]$", p)
        base, comp = (m_comp.group(1), int(m_comp.group(2))) if m_comp else (p, None)
        chunks = {}
        for fn in glob.glob(f"{out_dir}/trace_*_{base}.npy"):
            m = re.match(rf".*/trace_(\d+)_{re.escape(base)}\.npy$", fn)
            if m:
                arr = np.load(fn)
                chunks[int(m.group(1))] = arr if comp is None else arr[..., comp]
        if not chunks:
            print(f"{out_dir}: no traces for {p!r}; skipping dir")
            return False
        traces[p] = np.stack([chunks[i] for i in sorted(chunks)])
    cols = stats.summary(traces)
    old_tail = summary.get("ess_tail", {})
    summary.update(cols)
    with open(f"{out_dir}/summary.json", "w") as f:
        json.dump(summary, f, ensure_ascii=False, indent=2)
    for p in params:
        print(
            f"{out_dir}: {p} ess_tail {old_tail.get(p, float('nan')):.3g}"
            f" -> {cols['ess_tail'][p]:.3g}, r_hat {cols['r_hat'][p]:.4f}"
        )
    return True


if __name__ == "__main__":
    for d in sys.argv[1:]:
        recompute(d.rstrip("/"))
