"""Measure the CPU-reference denominator for the headline benchmark.

BASELINE.md: the reference publishes no absolute numbers, so the CPU
baseline must be measured.  The reference's pinned environment
(jax==0.2.21/mici==0.1.10, ``/root/reference/setup.py:13-20``) cannot be
installed in this image (no package installs), so this script measures the
agreed stand-in (VERDICT round 1, item 3): this repo's own f64 CPU golden
path at the reference's canonical configuration -- FHN noiseless-obs CHMC,
T=100 obs / S=25 steps per obs / R=5 obs per subsequence, Newton projection
solver with the reference tolerances (constraint 1e-9 / position 1e-8,
``scripts/utils.py:149-160`` in the reference), 4 chains, single CPU core.

The measured quantity is the reference's own cost unit tau_step -- seconds
per constrained leapfrog step, pooled over chains
(``fhn_model_noiseless_obs_generate_plots.py:99-109``).  Because the TPU
build runs the *identical* sampler, ESS per integrator step matches between
platforms, so ESS/sec ratios reduce to tau_step ratios; bench.py combines
this file's tau_step with its TPU measurement.

Note this stand-in is conservative (favours the baseline): the repo's CPU
path executes whole vmapped sweeps inside single XLA programs, whereas the
reference's Mici host loop crosses the host/device boundary at every system
method call (``mici_extensions.py:66-79``), so the true pinned-env reference
would be slower than the number recorded here.

Writes BASELINE_MEASURED.json at the repo root.

Usage: python scripts/measure_cpu_baseline.py  (strip the axon env vars and
set JAX_PLATFORMS=cpu; see .claude/skills/verify/SKILL.md).
"""

import argparse
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure_config(T, S, R, num_chains, reps, step_size):
    from manifold_mcmc_tpu.init.interpolation import (
        find_initial_state_by_linear_interpolation,
    )
    from manifold_mcmc_tpu.models import fhn
    from manifold_mcmc_tpu.samplers.integrators import make_constrained_integrator
    from manifold_mcmc_tpu.systems.constrained import (
        ConditionedDiffusionConstrainedSystem,
    )
    from manifold_mcmc_tpu.systems.metrics import IdentityMetric

    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8])
    x0_true = jnp.array([-0.5, 0.2])
    steps_data = 1000
    v_data = jnp.asarray(rng.standard_normal((T * steps_data, fhn.dim_v)))
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
    metric = IdentityMetric()

    def x_obs_target(key):
        noise = jax.random.normal(key, y_seq.shape, jnp.float64) * 0.5
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

    qs, x_obs = init_chains(jax.random.PRNGKey(0))
    jax.block_until_ready(qs)

    @jax.jit
    def do_step(qs, x_obs, moms):
        def one(q, xo, mom):
            integ = make_constrained_integrator(
                system,
                xo,
                partition=0,
                projection_solver="newton",
                constraint_tol=1e-9,
                position_tol=1e-8,
                reverse_check_tol=2e-8,
            )
            pt = integ.init(q, mom, metric)
            pt = pt._replace(
                mom=system.project_onto_cotangent_space(
                    pt.mom, pt.jac, pt.chol, metric
                )
            )
            new_pt, ok, _nonrev, iters = integ.step(pt, step_size, metric)
            return new_pt.pos, ok, iters
        return jax.vmap(one)(qs, x_obs, moms)

    moms = jax.random.normal(jax.random.PRNGKey(1), qs.shape, jnp.float64) * 0.5
    out = do_step(qs, x_obs, moms)  # compile
    jax.block_until_ready(out)
    ok = np.asarray(out[1])
    iters = np.asarray(out[2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = do_step(qs, x_obs, moms)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return {
        "T": T,
        "S": S,
        "R": R,
        "num_chains": num_chains,
        "batched_step_s": float(f"{dt:.4g}"),
        "tau_step_pooled_s": float(f"{dt / num_chains:.4g}"),
        "solver_ok_frac": float(ok.mean()),
        "mean_solver_iters": float(iters.mean()),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--num-chains", type=int, default=4)
    p.add_argument("--step-size", type=float, default=0.3)
    p.add_argument(
        "--configs",
        type=str,
        default="100x25,50x25,25x10",
        help="comma-separated TxS pairs (R fixed at 5)",
    )
    p.add_argument(
        "--output",
        type=str,
        default=os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json"),
    )
    args = p.parse_args()

    configs = []
    for spec in args.configs.split(","):
        T, S = (int(v) for v in spec.split("x"))
        print(f"measuring T={T} S={S} ...", flush=True)
        cfg = measure_config(T, S, 5, args.num_chains, args.reps, args.step_size)
        print(cfg, flush=True)
        configs.append(cfg)

    payload = {
        "description": (
            "repo f64-CPU golden path at the reference canonical config "
            "(Newton solver, reference tolerances, 4 vmapped chains, 1 core); "
            "conservative stand-in for the uninstallable pinned reference env"
        ),
        "metric": "tau_step_pooled_s (s per constrained leapfrog step, pooled over chains)",
        "machine": {
            "platform": platform.platform(),
            "processor": platform.processor(),
            "cpu_count": os.cpu_count(),
            "jax_version": jax.__version__,
            "device": str(jax.devices()[0]),
        },
        "configs": configs,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(args.output, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {os.path.abspath(args.output)}")


if __name__ == "__main__":
    main()
