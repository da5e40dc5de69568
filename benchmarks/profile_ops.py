"""Per-operation TPU timing for the constrained-system hot path.

Times each kernel of the CHMC constrained leapfrog step (reference op-times
harness analog, ``/root/reference/scripts/fhn_model_noiseless_obs_chmc_operation_times.py``)
vmapped over chains at the canonical FHN noiseless config, and prints a JSON
report of per-call wall times.  Use to decide where optimisation effort goes
(constraint scan vs Jacobian vs Gram Cholesky vs projection).

Usage (ambient TPU env):  python benchmarks/profile_ops.py [num_chains]
Env: MMT_PROF_T/S/R, MMT_PROF_REPEATS.
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from manifold_mcmc_tpu.init.interpolation import (  # noqa: E402
    find_initial_state_by_linear_interpolation,
)
from manifold_mcmc_tpu.models import fhn  # noqa: E402
from manifold_mcmc_tpu.samplers.integrators import (  # noqa: E402
    make_constrained_integrator,
)
from manifold_mcmc_tpu.systems.constrained import (  # noqa: E402
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.systems.metrics import IdentityMetric  # noqa: E402
from manifold_mcmc_tpu.utils.config import default_tolerances  # noqa: E402


K_INNER = int(os.environ.get("MMT_PROF_INNER", 8))


def timeit(fn, *args, repeats=None, label=""):
    """Median wall time of ``fn(*args)`` with the tunnel round trip removed.

    A single dispatch through the remote TPU tunnel costs ~25 ms regardless
    of the program, so each op is timed as a ``lax.scan`` of ``K_INNER``
    dependent invocations inside ONE dispatch; the per-op cost is
    ``(T_loop - T_single) / (K - 1)`` -- the single-call time cancels the
    fixed overhead.  The scanned input is perturbed by a tiny multiple of
    the previous output so XLA cannot hoist the computation out of the loop.
    """
    import jax.numpy as _jnp
    from jax import lax as _lax

    repeats = repeats or int(os.environ.get("MMT_PROF_REPEATS", 5))

    def tree_mix(out):
        # A tiny but NON-underflowing data dependence: ~1e-6 relative input
        # perturbation per loop iteration (f32 eps is 1.2e-7, so multiplying
        # by (1 + 1e-30 * sum) would round back to the identical input and
        # XLA could hoist the op out of the loop).
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        mix = 0.0
        for x in leaves:
            if _jnp.issubdtype(x.dtype, _jnp.floating):
                mix = mix + _jnp.sum(x)
        return _jnp.tanh(mix) * 1e-6

    @jax.jit
    def looped(*args):
        def body(carry, _):
            eps, acc = carry
            first = jax.tree_util.tree_map(
                lambda x: x * (1.0 + eps)
                if _jnp.issubdtype(_jnp.asarray(x).dtype, _jnp.floating)
                else x,
                args[0],
            )
            out = fn(first, *args[1:])
            return (tree_mix(out), acc + tree_mix(out)), None

        dt0 = _jnp.asarray(jax.tree_util.tree_leaves(args[0])[0]).dtype
        (eps, acc), _ = _lax.scan(
            body,
            (_jnp.asarray(0.0, dt0), _jnp.asarray(0.0, dt0)),
            None,
            length=K_INNER,
        )
        return acc

    def run(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_single = run(fn, *args)
    t_loop = run(looped, *args)
    per_op = max(t_loop - t_single, 1e-9) / (K_INNER - 1)
    print(
        f"  {label:45s} {per_op * 1e3:10.2f} ms   (single call {t_single * 1e3:.1f})",
        file=sys.stderr,
    )
    return per_op


def main():
    num_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    T = int(os.environ.get("MMT_PROF_T", 100))
    S = int(os.environ.get("MMT_PROF_S", 25))
    R = int(os.environ.get("MMT_PROF_R", 5))
    dtype = jnp.float32
    tols = default_tolerances()

    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)
    x0_true = jnp.array([-0.5, 0.2], dtype)
    steps_data = 1000
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
    metric = IdentityMetric()

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

    q, x_obs = init_chains(jax.random.PRNGKey(0))
    jax.block_until_ready(q)
    print(f"chains={num_chains} T={T} S={S} R={R} dtype={dtype.__name__}",
          file=sys.stderr)

    results = {"num_chains": num_chains, "T": T, "S": S, "R": R}
    if os.environ.get("MMT_PROF_ONLY") == "transitions":
        mom = jax.vmap(
            lambda k: jax.random.normal(k, (system.layout.dim_q,), dtype)
        )(jax.random.split(jax.random.PRNGKey(1), num_chains))
        _profile_transitions(system, metric, tols, q, mom, x_obs, results)
        print(json.dumps(results))
        return

    # 1. constraint evaluation
    constr_v = jax.jit(jax.vmap(lambda q_, x_: system.constr(q_, x_, 0)))
    results["constr"] = timeit(constr_v, q, x_obs, label="constr (fwd scan)")

    # 2. structured Jacobian
    jac_v = jax.jit(jax.vmap(lambda q_, x_: system.jacob_constr_blocks(q_, x_, 0)))
    results["jacob_constr_blocks"] = timeit(
        jac_v, q, x_obs, label="jacob_constr_blocks (jacrev scans)"
    )
    jac = jac_v(q, x_obs)

    # 3. Gram Cholesky given the Jacobian
    chol_v = jax.jit(jax.vmap(lambda j: system.chol_gram_blocks(j, metric, 0)))
    results["chol_gram_blocks"] = timeit(
        chol_v, jac, label="chol_gram_blocks (Woodbury chol)"
    )
    chol = chol_v(jac)

    # 4. log det (jac + chol + logdet)
    logdet_v = jax.jit(
        jax.vmap(lambda q_, x_: system.log_det_sqrt_gram(q_, x_, metric, 0)[0])
    )
    results["log_det_sqrt_gram"] = timeit(
        logdet_v, q, x_obs, label="log_det_sqrt_gram (jac+chol)"
    )

    # 5. value+grad of log det (the h1 kick)
    grad_v = jax.jit(
        jax.vmap(
            lambda q_, x_: system.grad_log_det_sqrt_gram(q_, x_, metric, 0)[1]
        )
    )
    results["grad_log_det_sqrt_gram"] = timeit(
        grad_v, q, x_obs, label="grad_log_det_sqrt_gram (2nd-order AD)"
    )

    # 6. momentum cotangent projection (Gram solves only)
    mom = jax.vmap(
        lambda k: jax.random.normal(k, (system.layout.dim_q,), dtype)
    )(jax.random.split(jax.random.PRNGKey(1), num_chains))
    proj_mom_v = jax.jit(
        jax.vmap(
            lambda m, j, c: system.project_onto_cotangent_space(m, j, c, metric)
        )
    )
    results["project_onto_cotangent"] = timeit(
        proj_mom_v, mom, jac, chol, label="project_onto_cotangent (Gram solves)"
    )

    # 7. quasi-Newton projection, exactly k iterations (tol=0 forces max_iters)
    for k in (1, 2):
        qn_v = jax.jit(
            jax.vmap(
                lambda q_, x_, j, c: system.quasi_newton_projection(
                    q_, x_, j, c, 0.1, metric, 0,
                    constraint_tol=0.0, position_tol=0.0,
                    divergence_tol=1e10, max_iters=k,
                ).pos
            )
        )
        results[f"quasi_newton_{k}iter"] = timeit(
            qn_v, q, x_obs, jac, chol, label=f"quasi_newton_projection ({k} iter)"
        )

    # 8. Newton projection, 1 iteration
    nt_v = jax.jit(
        jax.vmap(
            lambda q_, x_, j: system.newton_projection(
                q_, x_, j, 0.1, metric, 0,
                constraint_tol=0.0, position_tol=0.0,
                divergence_tol=1e10, max_iters=1,
            ).pos
        )
    )
    results["newton_1iter"] = timeit(nt_v, q, x_obs, jac, label="newton_projection (1 iter)")

    # 9. full constrained leapfrog step (quasi-Newton, tolerances as in bench)
    integ = make_constrained_integrator(
        system, x_obs[0], partition=0, projection_solver="quasi-newton",
        reverse_check_tol=tols["reverse_check_tol"],
        constraint_tol=tols["constraint_tol"],
        position_tol=tols["position_tol"],
        divergence_tol=tols["divergence_tol"],
    )

    def one_step(q_, m_, x_):
        integ_i = make_constrained_integrator(
            system, x_, partition=0, projection_solver="quasi-newton",
            reverse_check_tol=tols["reverse_check_tol"],
            constraint_tol=tols["constraint_tol"],
            position_tol=tols["position_tol"],
            divergence_tol=tols["divergence_tol"],
        )
        pt = integ_i.init(q_, m_, metric)
        pt2, ok, _nonrev, iters = integ_i.step(pt, 0.01, metric)
        return pt2.pos, ok, iters

    step_v = jax.jit(jax.vmap(one_step))
    results["full_step_small_dt"] = timeit(
        step_v, q, mom, x_obs, label="full constrained step (dt=0.01)"
    )

    _profile_transitions(system, metric, tols, q, mom, x_obs, results)
    print(json.dumps(results))


def _profile_transitions(system, metric, tols, q, mom, x_obs, results):
    """Time whole HMC transitions (tree + steps + projections, in context)."""
    from manifold_mcmc_tpu.samplers.hmc import dynamic_multinomial_hmc, static_hmc
    from manifold_mcmc_tpu.samplers.integrators import (
        make_constrained_integrator,
    )

    num_chains = q.shape[0]
    depth = int(os.environ.get("MMT_PROF_DEPTH", 5))
    eps = float(os.environ.get("MMT_PROF_STEP", 0.05))
    max_iters = int(os.environ.get("MMT_PROF_MAX_ITERS", 50))

    def make_transition(kind):
        def transition(q_, m_, x_, key):
            integ_i = make_constrained_integrator(
                system, x_, partition=0, projection_solver="quasi-newton",
                reverse_check_tol=tols["reverse_check_tol"],
                constraint_tol=tols["constraint_tol"],
                position_tol=tols["position_tol"],
                divergence_tol=tols["divergence_tol"],
                max_iters=max_iters,
            )
            pt = integ_i.init(q_, m_, metric)
            pt = pt._replace(mom=integ_i.sample_momentum(key, pt, metric))
            if kind == "dynamic":
                pos, mom, stats = dynamic_multinomial_hmc(
                    integ_i, metric, pt, key, eps, depth
                )
            else:
                pos, mom, stats = static_hmc(
                    integ_i, metric, pt, key, eps, 2**depth
                )
            return pos, stats["n_step"], stats["n_solver_iters"], stats[
                "convergence_error"
            ]

        return jax.jit(jax.vmap(transition, in_axes=(0, 0, 0, 0)))

    keys = jax.random.split(jax.random.PRNGKey(7), num_chains)
    for kind in ("dynamic", "static"):
        fn = make_transition(kind)
        out = fn(q, mom, x_obs, keys)
        jax.block_until_ready(out)
        n_step_mean = float(np.asarray(out[1]).mean())
        solver_iters = np.asarray(out[2])
        err_frac = float(np.asarray(out[3]).mean())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(q, mom, x_obs, keys)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        per_step = med / max(2**depth, 1)
        print(
            f"  {kind} transition (depth {depth}, max_iters {max_iters}): "
            f"{med * 1e3:.1f} ms  avg n_step {n_step_mean:.1f}  "
            f"/2^depth {per_step * 1e3:.2f} ms  "
            f"solver iters mean {solver_iters.mean():.1f} "
            f"max {solver_iters.max()}  err_frac {err_frac:.3f}",
            file=sys.stderr,
        )
        results[f"{kind}_transition_s"] = med
        results[f"{kind}_transition_mean_n_step"] = n_step_mean
        results[f"{kind}_err_frac"] = err_frac


if __name__ == "__main__":
    main()
