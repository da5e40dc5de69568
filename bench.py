"""Headline benchmark: FHN noiseless-obs CHMC effective samples per second.

Runs the reference's canonical configuration (T=100 observations at interval
0.2, S=25 steps/obs, R=5 obs/subsequence, quasi-Newton projection solver, dynamic
multinomial HMC with dual-averaging warm-up -- reference
``scripts/fhn_model_noiseless_obs_chmc_experiment.py:31-66``) with 1024
vmapped chains in float32 on one TPU chip, and reports pooled bulk-ESS per
wall-clock second over the parameters (sigma, eps, gamma, beta).

Baseline: the reference publishes no absolute ESS/sec (BASELINE.md); its
tau_eff figure axes bound the CPU cost at 0.1-10 s per effective sample for
the R-grid (4 chains, 1 core).  We take 1.0 effective samples/sec as the CPU
reference point (the axis midrange, BASELINE.md "tau_eff observed range"),
so ``vs_baseline`` is the speedup over that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Env overrides: MMT_BENCH_CHAINS, MMT_BENCH_WARM, MMT_BENCH_MAIN,
MMT_BENCH_T/S/R, MMT_BENCH_X64.
"""

import json
import os
import subprocess
import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
if os.environ.get("MMT_BENCH_X64") == "1":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from manifold_mcmc_tpu.init.interpolation import (
        find_initial_state_by_linear_interpolation,
    )
    from manifold_mcmc_tpu.models import fhn
    from manifold_mcmc_tpu.samplers.chains import (
        sample_chmc_chains_host_loop,
    )
    from manifold_mcmc_tpu.systems.constrained import (
        ConditionedDiffusionConstrainedSystem,
    )
    from manifold_mcmc_tpu.utils import stats as diag
    from manifold_mcmc_tpu.utils.config import default_tolerances

    num_chains = int(os.environ.get("MMT_BENCH_CHAINS", 1024))
    num_warm = int(os.environ.get("MMT_BENCH_WARM", 64))
    num_main = int(os.environ.get("MMT_BENCH_MAIN", 128))
    T = int(os.environ.get("MMT_BENCH_T", 100))
    S = int(os.environ.get("MMT_BENCH_S", 25))
    R = int(os.environ.get("MMT_BENCH_R", 5))
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tols = default_tolerances()

    # --- data generation (reference seed + true parameters) -------------- #
    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)
    x0_true = jnp.array([-0.5, 0.2], dtype)
    steps_data = 1000  # fine data grid (reference uses 10000; 1000 suffices)
    v_data = jnp.asarray(rng.standard_normal((T * steps_data, fhn.dim_v)), dtype)
    y_seq = fhn.generate_y_seq(z_true, x0_true, v_data, 0.2 / steps_data, steps_data)

    system = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=R,
        y_seq=y_seq,
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        dim_v_0=fhn.dim_v_0,
    )

    # --- chain initialisation (observation-consistent targets) ----------- #
    def x_obs_target(key):
        noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
        return jnp.concatenate([y_seq, noise], axis=-1)

    @jax.jit
    def init_chains(key):
        keys = jax.random.split(key, num_chains)

        def one(k):
            k_t, k_q = jax.random.split(k)
            return find_initial_state_by_linear_interpolation(
                system, k_q, x_obs_target(k_t)
            )

        return jax.vmap(one)(keys)

    t0 = time.time()
    q_init, x_obs_init = init_chains(jax.random.PRNGKey(20200710))
    jax.block_until_ready(q_init)
    init_time = time.time() - t0

    def trace_func(q):
        z = fhn.generate_z(q[: fhn.dim_z])
        return {"sigma": z[0], "eps": z[1], "gamma": z[2], "beta": z[3]}

    solver = os.environ.get("MMT_BENCH_SOLVER", "quasi-newton")
    max_tree_depth = int(os.environ.get("MMT_BENCH_MAX_TREE_DEPTH", 8))
    ckpt = os.environ.get(
        "MMT_BENCH_CKPT",
        f"/tmp/mmt_bench_warm_{num_chains}_{T}_{S}_{R}.npz",
    )

    common = dict(
        projection_solver=solver,
        max_tree_depth=max_tree_depth,
        constraint_tol=tols["constraint_tol"],
        position_tol=tols["position_tol"],
        reverse_check_tol=tols["reverse_check_tol"],
        divergence_tol=tols["divergence_tol"],
        trace_func=trace_func,
        init_step_size=float(os.environ.get("MMT_BENCH_INIT_STEP", 0.5)),
    )

    # Phase 1 (untimed): adaptation, checkpointed so crashed attempts resume.
    t0 = time.time()
    warm = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(1),
        num_warm_up_iter=num_warm,
        num_main_iter=0,
        checkpoint_path=ckpt,
        checkpoint_every=8,
        progress_every=8,
        **common,
    )
    jax.block_until_ready(warm["final_pos"])
    compile_time = time.time() - t0  # includes compiles + warm-up sweeps

    # Phase 2 (timed): pure main sampling with hot executables.
    common["init_step_size"] = float(warm["final_step_size"])
    t0 = time.time()
    result = sample_chmc_chains_host_loop(
        system,
        warm["final_pos"],
        warm["final_x_obs_seq"],
        jax.random.PRNGKey(2),
        num_warm_up_iter=0,
        num_main_iter=num_main,
        checkpoint_path=None,
        checkpoint_every=0,
        **common,
    )
    jax.block_until_ready(result["final_pos"])
    total_time = time.time() - t0

    traces = {k: np.asarray(v) for k, v in result["traces"].items()}
    stats = result["stats"]
    n_steps_total = int(np.asarray(stats["n_step"]).sum())
    accept = float(np.asarray(stats["accept_stat"]).mean())
    ess = {
        name: diag.ess_bulk(traces[name])
        for name in ("sigma", "eps", "gamma", "beta")
    }
    min_ess = float(min(ess.values()))
    ess_per_sec = min_ess / total_time
    # Effective per-constrained-leapfrog-step latency (all chains pooled).
    step_latency = total_time / max(n_steps_total, 1)

    baseline_ess_per_sec = 1.0  # documented CPU-reference estimate (BASELINE.md)
    out = {
        "metric": "fhn_noiseless_chmc_ess_per_sec",
        "value": round(ess_per_sec, 3),
        "unit": "ess/s",
        "vs_baseline": round(ess_per_sec / baseline_ess_per_sec, 3),
        "min_param_ess_bulk": round(min_ess, 1),
        "ess_bulk": {k: round(v, 1) for k, v in ess.items()},
        "wall_time_s": round(total_time, 2),
        "compile_time_s": round(compile_time, 1),
        "init_time_s": round(init_time, 1),
        "pooled_step_latency_s": float(f"{step_latency:.3e}"),
        "mean_accept_stat": round(accept, 3),
        "num_chains": num_chains,
        "num_warm_up_iter": num_warm,
        "num_main_iter": num_main,
        "config": {"T": T, "S": S, "R": R, "dtype": str(dtype.__name__)},
        "final_step_size": round(float(result["final_step_size"]), 5),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


def _run_with_retries():
    """Run the measurement in child processes, retrying on TPU worker faults.

    The tunnelled TPU runtime occasionally crashes its worker under heavy
    executable load; the persistent compilation cache makes each retry cheap
    (compiles are reused), so a few attempts converge to a clean run.
    """
    attempts = int(os.environ.get("MMT_BENCH_ATTEMPTS", 7))
    env = dict(os.environ)
    env["MMT_BENCH_CHILD"] = "1"
    chains = int(env.get("MMT_BENCH_CHAINS", 1024))
    results = []
    failures_at_this_size = 0
    for attempt in range(attempts):
        env["MMT_BENCH_CHAINS"] = str(chains)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("{") and '"metric"' in ln
            ),
            None,
        )
        if line is not None:
            results.append(line)
            # The first success pays the remote compiles (persistent cache
            # cold); one more cache-warm success gives the clean timing.
            if len(results) == 2:
                break
            failures_at_this_size = 0
        else:
            failures_at_this_size += 1
            sys.stderr.write(
                f"[bench] attempt {attempt + 1}/{attempts} failed at "
                f"{chains} chains (rc={proc.returncode}); stderr tail:\n"
                + "\n".join(proc.stderr.splitlines()[-5:])
                + "\n"
            )
            if failures_at_this_size >= 2 and chains > 128 and not results:
                chains //= 2  # fall back: faults may be memory-driven
                failures_at_this_size = 0
    if not results:
        return 1
    print(results[-1])
    return 0


if __name__ == "__main__":
    if os.environ.get("MMT_BENCH_CHILD") == "1":
        sys.exit(main())
    sys.exit(_run_with_retries())
