"""Measure what depth-20 NUTS trees ACTUALLY do on the SIR HMC posterior.

The reference's HMC default is ``max_tree_depth=20`` (``scripts/utils.py:
94-101``); this repo's completed SIR HMC canonical ran at the documented
depth-10 deviation, where EVERY tree hit the 1023-step cap (median n_step
1023, ``experiments/sir_hmc_canonical_tpu/sigma1_d10``).  Depth 10 cannot
distinguish "trees would U-turn at ~2^11 steps" (depth 20 feasible: ~2x
the d10 cost) from "trees run to 2^20" (infeasible: ~1024x).  This probe
answers that with a measurement: starting from the d10 run's FINAL chain
states (stationary) at its equilibrated step size, it runs a few
iterations at ``max_tree_depth=20`` through the chunked dispatcher and
reports the realized tree depths / step counts / wall time per iteration.

Output: one JSON line; also appended context for
``experiments/sir_hmc_canonical_tpu/FINDINGS.md``.

Env: MMT_D20_CHAINS (64), MMT_D20_ITERS (4), MMT_D20_CHUNK (4096),
MMT_D20_DEPTH (20).
"""

import json
import os
import sys
import time

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "scripts"))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# bf16-default matmuls on TPU break f32 tolerance contracts (see
# probe_solver_tail.py); match the experiment CLIs / bench.py.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from manifold_mcmc_tpu.models import sir  # noqa: E402
from manifold_mcmc_tpu.samplers.chains import (  # noqa: E402
    sample_hmc_chains_host_loop,
)
from manifold_mcmc_tpu.systems.euclidean import (  # noqa: E402
    EuclideanSystem,
    make_conditioned_diffusion_neg_log_dens,
)

CKPT = os.path.join(
    _repo, "experiments", "sir_hmc_canonical_tpu", "sigma1_d10", "checkpoint.npz"
)


def main():
    num_chains = int(os.environ.get("MMT_D20_CHAINS", 64))
    num_iters = int(os.environ.get("MMT_D20_ITERS", 4))
    chunk = int(os.environ.get("MMT_D20_CHUNK", 4096))
    depth = int(os.environ.get("MMT_D20_DEPTH", 20))
    dtype = jnp.float32

    with np.load(CKPT, allow_pickle=True) as ck:
        q_final = np.asarray(ck["q"])[:num_chains]
        step_size = float(ck["step_size"])

    data = np.load(
        os.path.join(_repo, "scripts", "data", "sir_model_boarding_school_data.npz")
    )
    y_seq = jnp.asarray(data["y_seq"], dtype)
    neg_log_dens = make_conditioned_diffusion_neg_log_dens(
        float(data["obs_interval"]),
        20,
        y_seq,
        sir.dim_z,
        sir.dim_v_0,
        sir.dim_v,
        sir.forward_func,
        sir.generate_x_0,
        sir.generate_z,
        1.0,
        sir.obs_func,
    )
    system = EuclideanSystem(neg_log_dens)

    sys.stderr.write(
        f"[d20-probe] {num_chains} chains from d10 final state, "
        f"step={step_size:.3e}, depth={depth}, chunk={chunk}\n"
    )
    # Round-4 advisor finding: a single wall/iters quotient folds the first
    # dispatch's executable load / possible cold compile (up to ~100x a
    # steady iteration) into the per-iteration cost that prices the
    # depth-20 canonical run.  Burn one UNTIMED iteration first so the
    # timed window is compile-free, and record the warm-up's own wall so
    # the JSON shows how (un)warm the cache actually was.
    t_warm = time.time()
    warm = sample_hmc_chains_host_loop(
        system,
        jnp.asarray(q_final, dtype),
        jax.random.PRNGKey(20200810),
        num_warm_up_iter=0,
        num_main_iter=1,
        max_tree_depth=depth,
        init_step_size=step_size,
        find_init_step_size=False,
        max_steps_per_dispatch=chunk,
    )
    jax.block_until_ready(warm["final_pos"])
    compile_iter_wall = time.time() - t_warm

    t0 = time.time()
    result = sample_hmc_chains_host_loop(
        system,
        warm["final_pos"],
        jax.random.PRNGKey(20200811),
        num_warm_up_iter=0,
        num_main_iter=num_iters,
        max_tree_depth=depth,
        init_step_size=step_size,
        find_init_step_size=False,
        max_steps_per_dispatch=chunk,
        progress_every=1,
    )
    jax.block_until_ready(result["final_pos"])
    wall = time.time() - t0

    n_step = np.asarray(result["stats"]["n_step"])  # (chains, iters)
    tree_depth = np.asarray(result["stats"]["tree_depth"])
    iter_times = [wall / max(num_iters, 1)]
    out = {
        "chains": num_chains,
        "iters": num_iters,
        "max_tree_depth": depth,
        "step_size": step_size,
        "chunk": chunk,
        "wall_s_total": round(wall, 1),
        "iter_wall_s": [round(t, 1) for t in iter_times],
        "untimed_first_iter_wall_s": round(compile_iter_wall, 1),
        "n_step_median": float(np.median(n_step)),
        "n_step_p90": float(np.percentile(n_step, 90)),
        "n_step_max": int(n_step.max()),
        "tree_depth_median": float(np.median(tree_depth)),
        "tree_depth_max": int(tree_depth.max()),
        "frac_at_depth_cap": float(np.mean(tree_depth >= depth)),
        "accept_mean": float(np.asarray(result["stats"]["accept_stat"]).mean()),
        "d10_reference_iter_s": 341.25 / 2500,
        "note": (
            "d10 canonical: every tree capped at 1023 steps (136.5 ms per "
            "256-chain iteration).  The realized depth here, at the SAME "
            "equilibrated step size from stationarity, decides the depth-20 "
            "canonical cost: wall ~= 3000 iters x (realized steps) x "
            "(per-step latency)."
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
