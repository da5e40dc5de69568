"""A/B the f32 fleet's ~18% projection non-convergence against tighter arms.

Round-4 verdict weak item 5: at the bench operating point the batched f32
fleet masks a tail of non-converged projection solves as rejections
(``solver_tail_probe_1024c_2026-08-20.json``: ok_rate ~0.82 at every cap),
where the reference's f64 Newton solves converge essentially always at
tolerances ``/root/reference/scripts/utils.py:149-160`` /
``sde/mici_extensions.py:1047-1055``.  The indirect bound ("accept 0.839,
ESS within 3%") left the *statistical* cost unmeasured.  This harness
measures it directly with the production host-loop sampler: identical
stationary start (committed fixture), identical RNG stream, three arms --

  base      cap 24, f32 default tolerances, step 0.205  (bench operating point)
  tight     cap 50, constraint tol x0.25,   step 0.205  (reference-like demands)
  smallstep cap 24, f32 default tolerances, step 0.180  (shrink the tail by dt)

-- reporting per arm: masked-rejection rate (convergence_error /
non_reversible_step), mean accept, ESS per draw, per-sweep wall, ESS/sec,
and per-parameter posterior moments, plus each arm's moment distance from
the CPU f64 golden canonical arm (4 chains, Newton, reference defaults --
``experiments/fhn_noiseless_chmc_canonical_cpu_f64``) in units of that
arm's posterior standard deviation.

Run on the chip: python benchmarks/ab_solver_tolerance.py
Env: MMT_AB_CHAINS (1024), MMT_AB_MAIN (32 main iters/arm),
MMT_AB_ARMS ("base,tight,smallstep").
Output: benchmarks/results/ab_solver_tolerance.json
"""

import json
import os
import sys
import time

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from manifold_mcmc_tpu.models import fhn  # noqa: E402
from manifold_mcmc_tpu.samplers.chains import (  # noqa: E402
    sample_chmc_chains_host_loop,
)
from manifold_mcmc_tpu.systems.constrained import (  # noqa: E402
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.utils import stats as diag  # noqa: E402
from manifold_mcmc_tpu.utils.config import default_tolerances  # noqa: E402

OUT = os.path.join(_repo, "benchmarks", "results", "ab_solver_tolerance.json")
# v2 fixture: seeded from the converged CPU golden arm and decohered on-chip
# (see scripts/make_stationary_fixture.py).  It carries its own y_seq (the
# golden arm's 10000-steps-per-obs data grid); the system MUST be built on
# that data so the fixture states lie on the manifold.
FIXTURE = os.path.join(
    _repo, "benchmarks", "fixtures", "fhn_canonical_stationary_v2.npz"
)
CPU_CKPT = os.path.join(
    _repo, "experiments", "fhn_noiseless_chmc_canonical_cpu_f64", "checkpoint.npz"
)
PARAMS = ("sigma", "eps", "gamma", "beta")


def build_system(y_seq):
    return ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=25,
        num_obs_per_subseq=5,
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


def golden_moments():
    """Posterior mean/std per parameter from the CPU f64 golden arm."""
    names = {"σ": "sigma", "ϵ": "eps", "γ": "gamma", "β": "beta"}
    out = {}
    with np.load(CPU_CKPT, allow_pickle=True) as ck:
        for k, name in names.items():
            v = np.asarray(ck[f"trc__{k}"], np.float64).reshape(-1)
            out[name] = {"mean": float(v.mean()), "std": float(v.std())}
    return out


def _trace_func(q):
    z = fhn.generate_z(q[: fhn.dim_z])
    return {"sigma": z[0], "eps": z[1], "gamma": z[2], "beta": z[3]}


def run_arm(name, cfg, system, q0, x_obs0, num_main):
    tols = default_tolerances()
    t0 = time.time()
    res = sample_chmc_chains_host_loop(
        system,
        q0,
        x_obs0,
        jax.random.PRNGKey(1),
        num_warm_up_iter=0,
        num_main_iter=num_main,
        projection_solver="quasi-newton",
        max_solver_iters=cfg["cap"],
        constraint_tol=tols["constraint_tol"] * cfg.get("tol_scale", 1.0),
        position_tol=tols["position_tol"] * cfg.get("tol_scale", 1.0),
        reverse_check_tol=tols["reverse_check_tol"],
        divergence_tol=tols["divergence_tol"],
        max_tree_depth=6,
        init_step_size=cfg["step"],
        trace_func=_trace_func,
        checkpoint_path=None,
        progress_every=8,
    )
    jax.block_until_ready(res["final_pos"])
    wall = time.time() - t0
    stats = {k: np.asarray(v) for k, v in res["stats"].items()}
    traces = {k: np.asarray(res["traces"][k]) for k in PARAMS}
    n_chains, n_draws = traces["sigma"].shape[0], traces["sigma"][0].size
    clean = res["timings"].get("clean_main_sweep_s") or res["timings"][
        "main_sweep_s"
    ][1:]
    per_sweep = float(np.median(clean)) if clean else float("nan")
    n_sweeps = res["n_main_sweeps_done"]
    ess = {
        k: float(diag.ess_bulk(v.reshape(n_chains, -1))) for k, v in traces.items()
    }
    min_ess = min(ess.values())
    main_time = per_sweep * n_sweeps
    conv_err = float(stats["convergence_error"].mean())
    nonrev = float(stats["non_reversible_step"].mean())
    arm = {
        "config": cfg,
        "num_chains": n_chains,
        "num_draws_per_chain": int(n_draws),
        "mean_accept_stat": float(np.nanmean(stats["accept_stat"])),
        "convergence_error_rate": conv_err,
        "non_reversible_rate": nonrev,
        "avg_solver_iters_per_step": float(stats["n_solver_iters"].mean())
        / max(float(stats["n_step"].mean()), 1.0),
        "per_sweep_s_median": per_sweep,
        "ess_bulk": ess,
        "min_param_ess_bulk": min_ess,
        "ess_per_draw": min_ess / max(n_chains * n_draws, 1),
        "ess_per_sec": min_ess / main_time if main_time else float("nan"),
        "wall_s": round(wall, 1),
        "posterior": {
            k: {
                "mean": float(traces[k].astype(np.float64).mean()),
                "std": float(traces[k].astype(np.float64).std()),
            }
            for k in PARAMS
        },
    }
    print(f"[ab-solver] {name}: accept {arm['mean_accept_stat']:.3f} "
          f"conv_err {conv_err:.3f} min_ess {min_ess:.0f} "
          f"sweep {per_sweep:.1f}s", flush=True)
    return arm


def main():
    num_chains = int(os.environ.get("MMT_AB_CHAINS", 1024))
    num_main = int(os.environ.get("MMT_AB_MAIN", 32))
    arm_names = os.environ.get("MMT_AB_ARMS", "base,tight,smallstep").split(",")
    cfgs = {
        "base": {"cap": 24, "tol_scale": 1.0, "step": 0.205},
        "tight": {"cap": 50, "tol_scale": 0.25, "step": 0.205},
        "smallstep": {"cap": 24, "tol_scale": 1.0, "step": 0.180},
    }
    dtype = jnp.float32
    with np.load(FIXTURE, allow_pickle=True) as fx:
        q0 = jnp.asarray(np.asarray(fx["q"])[:num_chains], dtype)
        x_obs0 = jnp.asarray(np.asarray(fx["x_obs"])[:num_chains], dtype)
        y_seq = jnp.asarray(np.asarray(fx["y_seq"]), dtype)
    system = build_system(y_seq)
    golden = golden_moments() if os.path.exists(CPU_CKPT) else None
    out = {
        "study": "solver non-convergence statistical cost A/B (round-5)",
        "start": "stationary fixture",
        "num_main_iter_per_arm": num_main,
        "golden_cpu_moments": golden,
        "arms": {},
        "date": time.strftime("%Y-%m-%d"),
    }
    for name in arm_names:
        arm = run_arm(name, cfgs[name], system, q0, x_obs0, num_main)
        if golden:
            arm["moment_distance_vs_golden_sd"] = {
                k: abs(arm["posterior"][k]["mean"] - golden[k]["mean"])
                / max(golden[k]["std"], 1e-12)
                for k in PARAMS
            }
        out["arms"][name] = arm
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
    print(f"[ab-solver] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
