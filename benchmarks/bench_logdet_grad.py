"""A/B TPU timing: analytic-cotangent vs AD grad of the half log-det Gram.

``grad log det sqrt Gram`` is the dominant per-leapfrog-step cost of CHMC at
canonical FHN shapes (the h1 half-step, reference AD formulation at
``/root/reference/sde/mici_extensions.py:1143-1146``).  This times the
system's two gradient modes (``logdet_grad`` constructor arg):

* ``ad``      -- reverse-mode AD through the blocked Cholesky (default);
* ``manual``  -- analytic cotangent ``G^-1 dc M^-1`` from the cached
  Woodbury factors (``ops/gram.logdet_gram_jac_cotangent``) backpropagated
  through the Jacobian computation only.

vmapped over chains at the canonical config, dispatch-corrected timer (the
~25 ms tunnel round trip cancels).  Values are cross-checked between modes.

Usage (ambient TPU env, chip must be free):
    python benchmarks/bench_logdet_grad.py [num_chains]
Env: MMT_PROF_T/S/R as in profile_ops; prints one JSON report.
"""

import json
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from profile_ops import timeit  # noqa: E402

from manifold_mcmc_tpu.init.interpolation import (  # noqa: E402
    find_initial_state_by_linear_interpolation,
)
from manifold_mcmc_tpu.models import fhn  # noqa: E402
from manifold_mcmc_tpu.systems.constrained import (  # noqa: E402
    ConditionedDiffusionConstrainedSystem,
)


def main():
    num_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    T = int(os.environ.get("MMT_PROF_T", 100))
    S = int(os.environ.get("MMT_PROF_S", 25))
    R = int(os.environ.get("MMT_PROF_R", 5))
    dtype = jnp.float32

    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)
    x0_true = jnp.array([-0.5, 0.2], dtype)
    steps_data = 1000
    v_data = jnp.asarray(rng.standard_normal((T * steps_data, fhn.dim_v)), dtype)
    y_seq = fhn.generate_y_seq(z_true, x0_true, v_data, 0.2 / steps_data, steps_data)

    def make_system(logdet_grad):
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
            logdet_grad=logdet_grad,
        )

    system = make_system("ad")

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
    print(f"chains={num_chains} T={T} S={S} R={R}", file=sys.stderr)

    results = {"num_chains": num_chains, "T": T, "S": S, "R": R}
    reference = None
    for mode in ("ad", "manual"):
        sys_mode = make_system(mode)
        grad_fn = jax.jit(
            jax.vmap(
                lambda q_, x_: sys_mode.grad_log_det_sqrt_gram(  # noqa: B023
                    q_, x_, partition=0
                )
            )
        )
        (val, _), grad = jax.block_until_ready(grad_fn(q, x_obs))
        if reference is None:
            reference = (np.asarray(val), np.asarray(grad))
        else:
            # Random interpolation targets leave a few chains at states whose
            # f32 Gram factorisation is non-finite in BOTH modes; compare
            # only chains finite in both and report the excluded count.
            val_a, grad_a = np.asarray(val), np.asarray(grad)
            finite = (
                np.isfinite(val_a)
                & np.isfinite(reference[0])
                & np.isfinite(grad_a).all(axis=-1)
                & np.isfinite(reference[1]).all(axis=-1)
            )
            results["num_nonfinite_chains_excluded"] = int((~finite).sum())
            val_err = float(
                np.max(np.abs(val_a[finite] - reference[0][finite]))
                / max(1e-30, float(np.max(np.abs(reference[0][finite]))))
            )
            grad_err = float(
                np.max(np.abs(grad_a[finite] - reference[1][finite]))
                / max(1e-30, float(np.max(np.abs(reference[1][finite]))))
            )
            results["max_rel_diff_val"] = val_err
            results["max_rel_diff_grad"] = grad_err
        results[f"grad_log_det_{mode}"] = timeit(
            lambda q_, x_: grad_fn(q_, x_)[1],
            q,
            x_obs,
            label=f"grad log-det-gram [{mode}]",
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
