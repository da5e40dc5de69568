"""Summarise a mid-run experiment checkpoint into ``partial_summary.json``.

The host-loop drivers checkpoint every iteration (``checkpoint.npz`` with
``trc__*`` / ``stc__*`` ring arrays and ``warm_done`` / ``main_done``
progress counters -- see ``manifold_mcmc_tpu/samplers/chains.py``), so a run
killed by a wall-clock deadline still holds every completed main-phase draw.
This tool computes the same per-variable summary the experiment CLIs write
at completion (``manifold_mcmc_tpu/utils/stats.summary``, mirroring the
reference's arviz table at ``/root/reference/scripts/utils.py:368-381``)
from whatever prefix of the main phase finished, without touching the
checkpoint (resume still works afterwards).

Usage:
    python scripts/summarize_checkpoint.py OUTPUT_DIR [--min-draws N]
        [--emit-traces]

``--emit-traces`` additionally writes ``trace_<chain>_<var>.npy`` /
``stats_<chain>_<stat>.npy`` files for the completed main-phase prefix, so
the plot generators (which glob exactly those patterns, mirroring the
reference's memmap contract at ``/root/reference/scripts/utils.py:507,556``)
work on an unfinished run.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from manifold_mcmc_tpu.utils import output, stats


def _load_completed_traces(ck):
    """Extract ``(warm_done, main_done, traces, stats)`` from either schema.

    HMC host-loop checkpoints store ring buffers with ``warm_done`` /
    ``main_done`` iteration counters; CHMC host-loop checkpoints store a
    ``sweep`` counter plus per-key ``(chains, sweeps_done, partitions, ...)``
    arrays holding exactly the completed main sweeps
    (``samplers/chains.py`` ``_save_payload``).
    """
    def load(prefix, main_done=None):
        out = {}
        for key in ck.files:
            if key.startswith(prefix):
                arr = ck[key]
                if main_done is not None:  # ring-buffer schema
                    out[key[len(prefix):]] = arr[:, :main_done]
                else:  # completed-sweeps schema: flatten (sweeps, partitions)
                    out[key[len(prefix):]] = arr.reshape(
                        (arr.shape[0], arr.shape[1] * arr.shape[2])
                        + arr.shape[3:]
                    )
        return out

    if "main_done" in ck.files:
        warm_done = int(ck["warm_done"])
        main_done = int(ck["main_done"])
        return warm_done, main_done, load("trc__", main_done), load(
            "stc__", main_done
        )
    sweep = int(ck["sweep"])
    main_sweeps_done = 0
    num_partition = 1
    for key in ck.files:
        if key.startswith("trc__"):
            main_sweeps_done, num_partition = ck[key].shape[1:3]
            break
    main_done = int(main_sweeps_done * num_partition)
    warm_done = int((sweep - main_sweeps_done) * num_partition)
    return warm_done, main_done, load("trc__"), load("stc__")


def summarize_checkpoint(output_dir, min_draws=8, emit_traces=False):
    ck_path = os.path.join(output_dir, "checkpoint.npz")
    ck = np.load(ck_path, allow_pickle=True)
    warm_done, main_done, traces, sampler_stats = _load_completed_traces(ck)
    if main_done < min_draws:
        raise SystemExit(
            f"only {main_done} main draws in checkpoint (< {min_draws}); "
            "nothing to summarise"
        )
    param_names = [
        k for k in traces if not k.endswith("_calls") and k != "hamiltonian"
    ]
    out = stats.summary(traces, param_names)
    out["partial"] = True
    out["warm_up_iters_completed"] = warm_done
    out["main_iters_completed"] = main_done
    out["num_chains"] = int(next(iter(traces.values())).shape[0])
    if "step_size" in ck.files:
        out["final_integrator_step_size"] = float(ck["step_size"])
    if "da_log_step" in ck.files:
        ls = np.asarray(ck["da_log_step"], dtype=np.float64)
        with np.errstate(over="ignore"):
            eps = np.exp(ls)
        out["per_chain_step_size"] = {
            "median": float(np.median(eps)),
            "min": float(eps.min()),
            "max": float(eps.max()),
        }
    for key, value in sampler_stats.items():
        out.setdefault("sampler_stats_mean", {})[key] = float(
            np.nanmean(np.asarray(value, dtype=np.float64))
        )
    for key, value in traces.items():
        if key.endswith("_calls"):
            out["total_" + key] = int(np.asarray(value)[:, -1].sum())
    dest = os.path.join(output_dir, "partial_summary.json")
    with open(dest, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=2)
    if emit_traces:
        output.write_traces(output_dir, traces)
        output.write_stats(output_dir, sampler_stats)
    return dest, out


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("output_dir")
    parser.add_argument("--min-draws", type=int, default=8)
    parser.add_argument(
        "--emit-traces",
        action="store_true",
        help="also write trace_*/stats_*.npy for the completed prefix",
    )
    args = parser.parse_args()
    dest, out = summarize_checkpoint(
        args.output_dir, args.min_draws, emit_traces=args.emit_traces
    )
    print(f"wrote {dest}")
    print(
        f"completed: {out['warm_up_iters_completed']} warm-up + "
        f"{out['main_iters_completed']} main iterations, "
        f"{out['num_chains']} chains"
    )
    for col in ("mean", "ess_bulk", "r_hat"):
        row = ", ".join(f"{k}={v:.3g}" for k, v in out[col].items() if v == v)
        print(f"{col}: {row}")


if __name__ == "__main__":
    main()
