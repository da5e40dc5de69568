"""Experiment output IO: the reference's on-disk trace/summary contract.

The reference's plot pipeline globs ``trace_<chain>_<var>.npy`` /
``stats_<chain>_<stat>.npy`` files and reads ``summary.json`` / ``args.json``
from each experiment directory (``scripts/utils.py:484-569``, memmap writing
enabled at ``:330-331``).  This module writes the same layout from the
samplers' stacked ``(chains, iters, ...)`` arrays so the reference's analysis
/ plotting scripts work unchanged on this framework's outputs.
"""

import json
import logging
import os

import numpy as np

__all__ = [
    "create_output_dir_and_save_args",
    "setup_logger",
    "write_traces",
    "write_stats",
    "save_summary",
]


def create_output_dir_and_save_args(output_dir, args_dict):
    """Create the experiment directory and persist the full configuration."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "args.json"), "w") as f:
        json.dump(args_dict, f, indent=2, default=str)


def setup_logger(output_dir):
    """Root INFO logger into ``<output_dir>/info.log`` (reference
    ``scripts/utils.py:177-183``)."""
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    logger.handlers = []
    logger.addHandler(logging.FileHandler(os.path.join(output_dir, "info.log")))
    return logger


def _write_per_chain(output_dir, prefix, arrays):
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        for c in range(arr.shape[0]):
            path = os.path.join(output_dir, f"{prefix}_{c}_{name}.npy")
            np.save(path, arr[c])


def write_traces(output_dir, traces):
    """Write ``trace_<chain>_<var>.npy`` files from (chains, iters, ...) arrays."""
    _write_per_chain(output_dir, "trace", traces)


def write_stats(output_dir, stats):
    """Write ``stats_<chain>_<stat>.npy`` files from (chains, iters, ...) arrays."""
    _write_per_chain(output_dir, "stats", stats)


def save_summary(
    output_dir,
    summary_dict,
    sampling_time,
    final_step_size,
    traces=None,
    print_summary=True,
):
    """Assemble and persist ``summary.json`` (reference ``utils.py:368-381``).

    Adds ``total_sampling_time``, ``final_integrator_step_size`` and -- for
    every traced cumulative ``*_calls`` counter -- a ``total_<name>`` field
    summing the final counter value over chains.
    """
    out = dict(summary_dict)
    out["total_sampling_time"] = float(sampling_time)
    out["final_integrator_step_size"] = float(final_step_size)
    if traces is not None:
        for key, value in traces.items():
            if key.endswith("_calls"):
                arr = np.asarray(value)
                out["total_" + key] = int(arr[:, -1].sum())
    with open(os.path.join(output_dir, "summary.json"), "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=2)
    if print_summary:
        print(f"Integrator step size = {final_step_size:.2g}")
        print(f"Total sampling time = {sampling_time:.0f} seconds")
        for col in ("mean", "sd", "ess_bulk", "r_hat"):
            if col in out and isinstance(out[col], dict):
                row = ", ".join(
                    f"{k}={v:.3g}" for k, v in out[col].items() if v == v
                )
                print(f"{col}: {row}")
    return out
