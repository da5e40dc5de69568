"""Chain-state checkpointing for crash-durable / resumable sampling.

The reference's durability story is per-iteration ``.npy`` memmaps plus the
``args.json`` snapshot (SURVEY.md section 5, "Checkpoint / resume"); chains
restart from scratch after a crash.  This module adds true resume: persist
the complete sampler state -- positions, conditioning sequences, adapted step
size and the PRNG key -- and restart main-phase sampling exactly where it
stopped via ``sample_chmc_chains(..., num_warm_up_iter=0,
init_step_size=...)``.

Format: a single ``.npz`` (portable, no framework dependency).
"""

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path, result, key, extra=None):
    """Persist a sampling-result dict (from ``sample_chmc_chains``) + rng key."""
    payload = {
        "final_pos": np.asarray(result["final_pos"]),
        "final_step_size": np.asarray(result["final_step_size"]),
        "key": np.asarray(key),
    }
    if "final_x_obs_seq" in result:
        payload["final_x_obs_seq"] = np.asarray(result["final_x_obs_seq"])
    for name, value in (extra or {}).items():
        payload[f"extra_{name}"] = np.asarray(value)
    np.savez(path, **payload)


def load_checkpoint(path):
    """Load a checkpoint into a plain dict of NumPy arrays."""
    with np.load(path) as data:
        out = {k: data[k] for k in data.files}
    return out
