"""Probe the cross-chain projection-iteration tail at benchmark scale.

Under ``vmap`` the projection ``while_loop`` runs until every chain's solve
has converged (or hit the cap), so the batched constrained step's wall time
follows the MAX of the per-chain iteration counts.  This probe measures, at
the canonical FHN noiseless config (reference
``scripts/fhn_model_noiseless_obs_chmc_experiment.py:31-66``) and the tuned
step size, the distribution that drives that max:

* per-solve iteration quantiles (p50 / p90 / p99 / max) for the forward
  retraction and the reversibility-check retraction separately;
* fraction of solves hitting the iteration cap, and the fraction converging
  in the (lo, cap] window -- i.e. what an intermediate cap would truncate;
* batched wall time per step at several caps, with the per-chain ok rates.

Run on the TPU chip (ambient env).  Output: one JSON dict on stdout.

Env: MMT_PROBE_CHAINS (1024), MMT_PROBE_STEPS (48), MMT_PROBE_WARM (16),
MMT_PROBE_STEP_SIZE (0.23), MMT_PROBE_CAPS ("50,32,24").
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
# Match bench.py's precision: on TPU the default matmul precision runs
# bf16-input passes whose ~1e-3 error exceeds the f32 reverse-check
# tolerance (2e-4) and flags essentially every step non-reversible
# (measured in this probe's first two runs: ok_rate 1.7% vs the real
# sampler's 0.83 mean accept under "highest").
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from manifold_mcmc_tpu.init.interpolation import (  # noqa: E402
    find_initial_state_by_linear_interpolation,
)
from manifold_mcmc_tpu.models import fhn  # noqa: E402
from manifold_mcmc_tpu.systems.constrained import (  # noqa: E402
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.systems.metrics import IdentityMetric  # noqa: E402
from manifold_mcmc_tpu.utils.config import default_tolerances  # noqa: E402


def build_system(T=100, S=25, R=5):
    dtype = jnp.float32
    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)
    x0_true = jnp.array([-0.5, 0.2], dtype)
    steps_data = 1000
    v_data = jnp.asarray(rng.standard_normal((T * steps_data, fhn.dim_v)), dtype)
    y_seq = fhn.generate_y_seq(z_true, x0_true, v_data, 0.2 / steps_data, steps_data)
    return (
        ConditionedDiffusionConstrainedSystem(
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
        ),
        y_seq,
        dtype,
    )


def main():
    num_chains = int(os.environ.get("MMT_PROBE_CHAINS", 1024))
    num_steps = int(os.environ.get("MMT_PROBE_STEPS", 48))
    num_warm = int(os.environ.get("MMT_PROBE_WARM", 16))
    dt = float(os.environ.get("MMT_PROBE_STEP_SIZE", 0.23))
    caps = [int(c) for c in os.environ.get("MMT_PROBE_CAPS", "50,32,24").split(",")]

    system, y_seq, dtype = build_system()
    tols = default_tolerances()
    metric = IdentityMetric()
    partition = 0

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

    q, x_obs = init_chains(jax.random.PRNGKey(20200710))
    jax.block_until_ready(q)

    def make_step(max_iters):
        """One constrained leapfrog step (mirrors integrators.py:169-195)
        returning per-chain forward / reverse solve iterations + flags."""

        def solve(pos, jac, chol, dt_s, x_o):
            return system.quasi_newton_projection(
                pos,
                x_o,
                jac,
                chol,
                dt_s,
                metric,
                partition,
                tols["constraint_tol"],
                tols["position_tol"],
                tols["divergence_tol"],
                max_iters,
            )

        def one(q, mom, x_o):
            (logdet, (jac, chol)), grad = system.grad_log_det_sqrt_gram(
                q, x_o, metric, partition
            )
            mom = mom - 0.5 * dt * system.dh1_dpos(q, grad)
            mom = system.project_onto_cotangent_space(mom, jac, chol, metric)
            pos_f, mom_f = system.h2_flow(q, mom, dt, metric)
            res = solve(pos_f, jac, chol, dt, x_o)
            _, mom_factor = system.dh2_flow_dmom_factors(dt)
            mom_n = mom_f - mom_factor * res.mu
            (logdet_n, (jac_n, chol_n)), grad_n = system.grad_log_det_sqrt_gram(
                res.pos, x_o, metric, partition
            )
            # Project onto the NEW point's cotangent space BEFORE the reverse
            # flow -- the integrator does (integrators.py step: project_mom at
            # the last inner step precedes the reversibility flow); flowing
            # back with the unprojected momentum's normal-space component
            # lands off the start and fails every reversibility check (the
            # bug in this probe's first committed run).
            mom_n = system.project_onto_cotangent_space(
                mom_n, jac_n, chol_n, metric
            )
            pos_b, _ = system.h2_flow(res.pos, mom_n, -dt, metric)
            res_b = solve(pos_b, jac_n, chol_n, -dt, x_o)
            rev_ok = (
                res_b.converged
                & (jnp.max(jnp.abs(res_b.pos - q)) < tols["reverse_check_tol"])
            )
            mom_n = mom_n - 0.5 * dt * system.dh1_dpos(res.pos, grad_n)
            mom_n = system.project_onto_cotangent_space(
                mom_n, jac_n, chol_n, metric
            )
            ok = res.converged & rev_ok & jnp.isfinite(logdet_n)
            # rejected chains stay put (masked rejection semantics)
            q_out = jnp.where(ok, res.pos, q)
            mom_out = jnp.where(ok, mom_n, -mom)
            return q_out, mom_out, res.iters, res_b.iters, res.converged, rev_ok

        @jax.jit
        def batch(q, mom, x_obs):
            return jax.vmap(one)(q, mom, x_obs)

        return batch

    @jax.jit
    def momenta(key, q, x_obs):
        def one(k, qi, xi):
            jac = system.jacob_constr_blocks(qi, xi, partition)
            chol = system.chol_gram_blocks(jac, metric, partition)
            return system.sample_momentum(k, jac, chol, metric)

        return jax.vmap(one)(jax.random.split(key, num_chains), q, x_obs)

    key = jax.random.PRNGKey(7)
    out = {"chains": num_chains, "dt": dt, "steps": num_steps, "caps": {}}

    step50 = make_step(max(caps))
    mom = momenta(key, q, x_obs)
    # warm the state toward stationarity (and warm the compile cache)
    for i in range(num_warm):
        if i % 8 == 0:
            key, sub = jax.random.split(key)
            mom = momenta(sub, q, x_obs)
        q, mom, *_ = step50(q, mom, x_obs)
    jax.block_until_ready(q)
    q_probe, mom_probe = q, mom

    for cap in caps:
        step = make_step(cap)
        q, mom = q_probe, mom_probe
        # compile (and warm) outside the timed window
        q, mom, *_ = step(q, mom, x_obs)
        jax.block_until_ready(q)
        it_f, it_b, ok_f, ok_b = [], [], [], []
        t0 = time.time()
        for i in range(num_steps):
            if i % 8 == 0:
                key, sub = jax.random.split(key)
                mom = momenta(sub, q, x_obs)
            q, mom, i_f, i_b, c_f, c_b = step(q, mom, x_obs)
            it_f.append(np.asarray(i_f))
            it_b.append(np.asarray(i_b))
            ok_f.append(np.asarray(c_f))
            ok_b.append(np.asarray(c_b))
        jax.block_until_ready(q)
        wall = time.time() - t0
        it_f = np.stack(it_f)  # (steps, chains)
        it_b = np.stack(it_b)
        ok = np.stack(ok_f) & np.stack(ok_b)
        allit = np.concatenate([it_f.ravel(), it_b.ravel()])

        def q_(a, p):
            return float(np.percentile(a, p))

        out["caps"][str(cap)] = {
            "wall_per_step_ms": wall / num_steps * 1e3,
            "iters_p50": q_(allit, 50),
            "iters_p90": q_(allit, 90),
            "iters_p99": q_(allit, 99),
            "iters_max_mean_over_steps": float(
                np.mean(np.maximum(it_f.max(axis=1), it_b.max(axis=1)))
            ),
            "frac_at_cap": float(np.mean(allit >= cap)),
            "ok_rate": float(np.mean(ok)),
            "frac_solves_in_25_to_cap": float(
                np.mean((allit > 25) & (allit < cap))
            ),
        }
        print(
            f"[probe] cap={cap}: {out['caps'][str(cap)]}",
            file=sys.stderr,
            flush=True,
        )

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
