"""Build a genuinely stationary 1024-chain bench fixture from the golden arm.

Round-5 discovery (``benchmarks/results/fleet_init_dispersion_study_2026-08-21.json``):
the previous bench fixture -- the final state of a 250-iteration depth-6
in-run warm-up -- left the fleet carrying near-initialisation dispersion in
the global-parameter block (between-chain eps spread 1.56 vs posterior sd
0.0084 measured on the converged CPU f64 golden arm), so every warm=0 bench
ESS window measured an inward crawl, not stationary-phase mixing, and the
r_hat <= 1.05 gate was unreachable at any feasible window.

This script replaces that fixture with one seeded from the CONVERGED golden
canonical run (reference config ``/root/reference/scripts/
fhn_model_noiseless_obs_chmc_experiment.py:31-66``: 4 chains, f64, Newton,
dual-averaged step 0.2005, depth 10; r_hat <= 1.003 at 632 draws):

  seed mode (local CPU, f64):
    * regenerate the golden arm's y_seq exactly (seed 20200710, 10000
      data steps per observation, f64) and VERIFY each checkpointed chain
      state satisfies the constraint on that data (max |c| ~ 1e-9) -- an
      exact provenance check that the two data paths agree;
    * tile the 4 converged states to N chains, cast f32, report the f32
      residuals, and write the pre-fixture (q, x_obs, y_seq).
  decohere mode (TPU chip, f32):
    * run K host-loop sweeps at the bench operating point so the N/4
      clones of each source state separate within the typical set (fresh
      per-chain RNG; chaotic constrained dynamics decorrelate in a few
      draws), then write the final fixture + mixing diagnostics.

Usage:
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu \
    python scripts/make_stationary_fixture.py --mode seed
  python scripts/make_stationary_fixture.py --mode decohere   # on the chip
"""

import argparse
import json
import os
import sys
import time

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

parser = argparse.ArgumentParser()
parser.add_argument("--mode", choices=("seed", "decohere"), required=True)
parser.add_argument("--num-chains", type=int, default=1024)
parser.add_argument("--decohere-sweeps", type=int, default=24)
parser.add_argument("--step-size", type=float, default=0.205)
parser.add_argument("--solver-iters-cap", type=int, default=24)
args = parser.parse_args()

if args.mode == "seed":
    jax.config.update("jax_enable_x64", True)
else:
    jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from manifold_mcmc_tpu.models import fhn  # noqa: E402
from manifold_mcmc_tpu.systems.constrained import (  # noqa: E402
    ConditionedDiffusionConstrainedSystem,
)

CPU_CKPT = os.path.join(
    _repo, "experiments", "fhn_noiseless_chmc_canonical_cpu_f64", "checkpoint.npz"
)
PRE = os.path.join(
    _repo, "benchmarks", "fixtures", "fhn_canonical_stationary_v2_pre.npz"
)
OUT = os.path.join(
    _repo, "benchmarks", "fixtures", "fhn_canonical_stationary_v2.npz"
)

T, S, R = 100, 25, 5
STEPS_DATA = 10000  # golden arm / reference data grid (args.json of the run)


def make_y_seq(dtype):
    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)
    x0_true = jnp.array([-0.5, 0.2], dtype)
    v = jnp.asarray(rng.standard_normal((T * STEPS_DATA, fhn.dim_v)), dtype)
    return fhn.generate_y_seq(z_true, x0_true, v, 0.2 / STEPS_DATA, STEPS_DATA)


def build_system(y_seq):
    return ConditionedDiffusionConstrainedSystem(
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


def max_resid(system, q, x_obs):
    def one(qi, xi):
        c0 = system.constr(qi, xi, 0)
        c1 = system.constr(qi, xi, 1)
        return jnp.maximum(jnp.max(jnp.abs(c0)), jnp.max(jnp.abs(c1)))

    return np.asarray(jax.jit(jax.vmap(one))(q, x_obs))


if args.mode == "seed":
    y64 = make_y_seq(jnp.float64)
    with np.load(CPU_CKPT, allow_pickle=True) as ck:
        q4 = np.asarray(ck["q"], np.float64)
        x4 = np.asarray(ck["x_obs"], np.float64)
        sweep = int(ck["sweep"])
    sys64 = build_system(y64)
    r64 = max_resid(sys64, jnp.asarray(q4), jnp.asarray(x4))
    print("golden-state f64 residuals on regenerated y_seq:", r64)
    if not (r64 < 1e-6).all():
        raise SystemExit(
            "FATAL: golden states do not satisfy the regenerated constraint "
            "(data path mismatch) -- refusing to build the fixture"
        )
    reps = args.num_chains // 4
    q = np.tile(q4, (reps, 1)).astype(np.float32)
    x = np.tile(x4, (reps, 1, 1)).astype(np.float32)
    y32 = np.asarray(y64, np.float32)
    sys32 = build_system(jnp.asarray(y32))
    r32 = max_resid(sys32, jnp.asarray(q[:8]), jnp.asarray(x[:8]))
    print("tiled f32 residuals (first 8):", r32)
    np.savez(
        PRE,
        q=q,
        x_obs=x,
        y_seq=y32,
        num_chains=args.num_chains,
        config_TSR=np.array([T, S, R]),
        dtype="float32",
        splitting="standard",
        provenance=json.dumps(
            {
                "stage": "pre-decoherence",
                "source": "experiments/fhn_noiseless_chmc_canonical_cpu_f64/"
                f"checkpoint.npz (sweep {sweep}, r_hat<=1.003, 4 chains "
                "tiled x%d)" % reps,
                "steps_data": STEPS_DATA,
                "f64_residual_max": float(r64.max()),
                "f32_residual_max_first8": float(r32.max()),
                "date": time.strftime("%Y-%m-%d"),
            }
        ),
    )
    print(f"wrote {PRE}")
    raise SystemExit(0)

# ---- decohere mode (chip) ------------------------------------------------- #
from manifold_mcmc_tpu.samplers.chains import (  # noqa: E402
    sample_chmc_chains_host_loop,
)
from manifold_mcmc_tpu.utils import stats as diag  # noqa: E402
from manifold_mcmc_tpu.utils.config import default_tolerances  # noqa: E402

dtype = jnp.float32
with np.load(PRE, allow_pickle=True) as fx:
    q0 = jnp.asarray(np.asarray(fx["q"])[: args.num_chains], dtype)
    x0 = jnp.asarray(np.asarray(fx["x_obs"])[: args.num_chains], dtype)
    y32 = jnp.asarray(np.asarray(fx["y_seq"]), dtype)
    pre_prov = json.loads(str(fx["provenance"]))
system = build_system(y32)
tols = default_tolerances()


def trace_func(q):
    z = fhn.generate_z(q[: fhn.dim_z])
    return {"sigma": z[0], "eps": z[1], "gamma": z[2], "beta": z[3]}


t0 = time.time()
res = sample_chmc_chains_host_loop(
    system,
    q0,
    x0,
    jax.random.PRNGKey(20260821),
    num_warm_up_iter=0,
    num_main_iter=2 * args.decohere_sweeps,
    projection_solver="quasi-newton",
    max_solver_iters=args.solver_iters_cap,
    constraint_tol=tols["constraint_tol"],
    position_tol=tols["position_tol"],
    reverse_check_tol=tols["reverse_check_tol"],
    divergence_tol=tols["divergence_tol"],
    max_tree_depth=6,
    init_step_size=args.step_size,
    trace_func=trace_func,
    checkpoint_path=None,
    progress_every=4,
)
jax.block_until_ready(res["final_pos"])
wall = time.time() - t0
traces = {k: np.asarray(v, np.float64) for k, v in res["traces"].items()}
stats = {k: np.asarray(v) for k, v in res["stats"].items()}
eps = traces["eps"].reshape(args.num_chains, -1)
final_eps = eps[:, -1]
accept = float(np.nanmean(stats["accept_stat"]))
diagnostics = {
    "decohere_sweeps": args.decohere_sweeps,
    "step_size": args.step_size,
    "mean_accept_stat": accept,
    "convergence_error_rate": float(stats["convergence_error"].mean()),
    "final_between_chain_eps_sd": float(final_eps.std()),
    "final_eps_mean": float(final_eps.mean()),
    "per_draw_move_abs_eps": float(np.abs(np.diff(eps, axis=1)).mean()),
    "wall_s": round(wall, 1),
}
print("decohere diagnostics:", json.dumps(diagnostics, indent=2))
np.savez(
    OUT,
    q=np.asarray(res["final_pos"], np.float32),
    x_obs=np.asarray(res["final_x_obs_seq"], np.float32),
    y_seq=np.asarray(y32, np.float32),
    num_chains=args.num_chains,
    config_TSR=np.array([T, S, R]),
    dtype="float32",
    splitting="standard",
    provenance=json.dumps(
        {
            "stage": "stationary fixture v2",
            "seed_provenance": pre_prov,
            "decohere": diagnostics,
            "date": time.strftime("%Y-%m-%d"),
        }
    ),
)
print(f"wrote {OUT}")
