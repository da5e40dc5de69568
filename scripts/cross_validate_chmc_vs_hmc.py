"""Cross-implementation posterior validation: CHMC vs standard HMC.

The reference validates its manifold-CHMC posterior by overlaying it against
standard (non-centred, unconstrained) HMC and a third-party Julia sampler on
the same noisy-observation FHN data
(``scripts/fhn_model_noisy_obs_generate_plots.py:35-60``).  The pinned
reference environment and Julia are not installable in this image, so this
script performs the strongest available in-repo analogue: the two *completely
disjoint* algorithm paths of this framework --

* CHMC: the noisy-observation constrained system (blocked constraint
  Jacobian, Woodbury Gram algebra, RATTLE integrator, projection solvers),
  where the observation noise coordinates are part of the latent state and
  the observations enter through the exact constraint ``c(q) = 0``; and
* HMC: the unconstrained non-centred posterior (plain forward-simulation
  scan + Gaussian likelihood, leapfrog integrator)

-- target the SAME posterior over the model parameters.  They share no
density, gradient, linear-algebra or integrator code beyond the SDE step
function itself, so posterior agreement is a genuine end-to-end
cross-validation of the manifold machinery (constraint, Gram log-det
gradient, projections, tree sampling).

Gate: for each parameter, |mean_CHMC - mean_HMC| must be within
``--z-tol`` combined Monte-Carlo standard errors (SE = sd / sqrt(ess_bulk)),
and the posterior standard deviations must agree to ``--sd-rtol``.

Writes ``cross_validation.json`` into --output-dir and exits non-zero on
disagreement.  Runs on CPU (strip axon env; see verify skill) or TPU.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-obs", type=int, default=20)
    p.add_argument("--num-steps-per-obs", type=int, default=5)
    p.add_argument("--num-obs-per-subseq", type=int, default=5)
    p.add_argument("--observation-noise-std", type=float, default=0.1)
    p.add_argument("--num-chain", type=int, default=4)
    p.add_argument("--num-warm-up-iter", type=int, default=120)
    p.add_argument("--num-main-iter", type=int, default=400)
    p.add_argument("--max-tree-depth", type=int, default=6)
    p.add_argument("--seed", type=int, default=20200710)
    p.add_argument("--z-tol", type=float, default=5.0)
    p.add_argument("--sd-rtol", type=float, default=0.5)
    p.add_argument("--x64", action="store_true", default=True)
    p.add_argument("--no-x64", dest="x64", action="store_false")
    p.add_argument("--output-dir", type=str, default="/tmp/mmt_cross_validation")
    args = p.parse_args()

    import jax

    jax.config.update("jax_enable_x64", args.x64)

    import jax.numpy as jnp
    import numpy as np

    from manifold_mcmc_tpu.init.interpolation import (
        find_initial_state_by_linear_interpolation,
    )
    from manifold_mcmc_tpu.models import fhn
    from manifold_mcmc_tpu.samplers.chains import (
        sample_chmc_chains,
        sample_hmc_chains,
    )
    from manifold_mcmc_tpu.systems.constrained import (
        ConditionedDiffusionConstrainedSystem,
    )
    from manifold_mcmc_tpu.systems.euclidean import (
        EuclideanSystem,
        make_conditioned_diffusion_neg_log_dens,
    )
    from manifold_mcmc_tpu.utils import stats as diag
    from manifold_mcmc_tpu.utils.config import default_tolerances

    dtype = jnp.float64 if args.x64 else jnp.float32
    tols = default_tolerances()
    T, S = args.num_obs, args.num_steps_per_obs
    sigma_y = args.observation_noise_std

    data = np.load(
        os.path.join(
            os.path.dirname(__file__), "data", "fhn_model_noisy_obs_simulated_data.npz"
        )
    )
    obs_interval = float(data["obs_interval"])
    y_seq = jnp.asarray(
        (data["y_seq_mean"][:T] + sigma_y * data["n_seq"][:T])[:, None], dtype
    )

    params = ("sigma", "eps", "gamma", "beta")

    def trace_func(q):
        z = fhn.generate_z(q[: fhn.dim_z])
        return dict(zip(params, z))

    # ------------------------- CHMC (manifold) path ---------------------- #
    system = ConditionedDiffusionConstrainedSystem(
        obs_interval=obs_interval,
        num_steps_per_obs=S,
        num_obs_per_subseq=args.num_obs_per_subseq,
        y_seq=y_seq,
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        generate_sigma=sigma_y,
        dim_v_0=fhn.dim_v_0,
    )

    def x_obs_target(key):
        noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
        return jnp.concatenate([y_seq, noise], axis=-1)

    keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.num_chain)
    q_init, x_obs_init = jax.vmap(
        lambda k: find_initial_state_by_linear_interpolation(
            system, jax.random.fold_in(k, 1), x_obs_target(jax.random.fold_in(k, 0))
        )
    )(keys)

    t0 = time.time()
    chmc = sample_chmc_chains(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(args.seed + 2),
        num_warm_up_iter=args.num_warm_up_iter,
        num_main_iter=args.num_main_iter,
        projection_solver="newton",
        max_tree_depth=args.max_tree_depth,
        trace_func=trace_func,
        **{k: tols[k] for k in ("constraint_tol", "position_tol", "reverse_check_tol")},
    )
    t_chmc = time.time() - t0

    # ------------------------- HMC (unconstrained) path ------------------ #
    nld = make_conditioned_diffusion_neg_log_dens(
        obs_interval=obs_interval,
        num_steps_per_obs=S,
        y_seq=y_seq,
        dim_u=fhn.dim_z,
        dim_v_0=fhn.dim_v_0,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        generate_sigma=sigma_y,
        obs_func=fhn.obs_func,
    )
    esys = EuclideanSystem(nld)
    dim_q_hmc = fhn.dim_z + fhn.dim_v_0 + T * S * fhn.dim_v
    hmc_init = q_init[:, :dim_q_hmc]

    t0 = time.time()
    hmc = sample_hmc_chains(
        esys,
        hmc_init,
        jax.random.PRNGKey(args.seed + 3),
        num_warm_up_iter=args.num_warm_up_iter,
        num_main_iter=args.num_main_iter,
        max_tree_depth=args.max_tree_depth + 4,  # HMC needs deeper trees here
        metric_type="identity",
        trace_func=trace_func,
    )
    t_hmc = time.time() - t0

    # ------------------------- agreement gate --------------------------- #
    report = {"params": {}, "ok": True}
    for name in params:
        a = np.asarray(chmc["traces"][name])
        b = np.asarray(hmc["traces"][name])
        ma, mb = float(a.mean()), float(b.mean())
        sa, sb = float(a.std()), float(b.std())
        ess_a = max(diag.ess_bulk(a), 4.0)
        ess_b = max(diag.ess_bulk(b), 4.0)
        se = float(np.sqrt(sa**2 / ess_a + sb**2 / ess_b))
        z = abs(ma - mb) / max(se, 1e-12)
        sd_rel = abs(sa - sb) / max(sa, sb)
        ok = bool(z < args.z_tol and sd_rel < args.sd_rtol)
        report["params"][name] = {
            "mean_chmc": round(ma, 5),
            "mean_hmc": round(mb, 5),
            "sd_chmc": round(sa, 5),
            "sd_hmc": round(sb, 5),
            "ess_chmc": round(float(ess_a), 1),
            "ess_hmc": round(float(ess_b), 1),
            "z_score": round(z, 2),
            "sd_rel_diff": round(sd_rel, 3),
            "ok": ok,
        }
        report["ok"] = report["ok"] and ok
    report["config"] = {
        "T": T,
        "S": S,
        "R": args.num_obs_per_subseq,
        "sigma_y": sigma_y,
        "num_chain": args.num_chain,
        "iters": [args.num_warm_up_iter, args.num_main_iter],
        "dtype": str(dtype.__name__),
    }
    report["wall_time_s"] = {"chmc": round(t_chmc, 1), "hmc": round(t_hmc, 1)}
    report["accept"] = {
        "chmc": round(float(np.asarray(chmc["stats"]["accept_stat"]).mean()), 3),
        "hmc": round(float(np.asarray(hmc["stats"]["accept_stat"]).mean()), 3),
    }

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, "cross_validation.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(("AGREE" if report["ok"] else "DISAGREE"), "->", out_path)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
