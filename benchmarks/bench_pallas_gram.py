"""A/B TPU timing: fused Pallas Gram kernel vs the pure-XLA pipeline.

Times ``chol_gram_blocks`` + ``log_det_sqrt_gram_from_chol`` (the Woodbury
factorisation consumed by every constrained-leapfrog projection, reference
``/root/reference/sde/mici_extensions.py:626-820``) vmapped over chains at
the canonical FHN noiseless config, with ``MMT_GRAM_BACKEND`` switched
between ``jnp`` (default pure-XLA path) and ``pallas``
(``ops/pallas_gram.fused_chol_gram_middle``).  Uses the dispatch-corrected
timer from ``benchmarks/profile_ops.py`` (the ~25 ms tunnel round trip
cancels out).

Usage (ambient TPU env, chip must be free):
    python benchmarks/bench_pallas_gram.py [num_chains]
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
from manifold_mcmc_tpu.ops import gram as gram_ops  # noqa: E402
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
    jac_v = jax.jit(jax.vmap(lambda q_, x_: system.jacob_constr_blocks(q_, x_, 0)))
    jac = jax.block_until_ready(jac_v(q, x_obs))
    print(f"chains={num_chains} T={T} S={S} R={R}", file=sys.stderr)

    results = {"num_chains": num_chains, "T": T, "S": S, "R": R}
    reference_value = None
    backends = os.environ.get("MMT_PGRAM_BACKENDS", "jnp,pallas").split(",")
    for backend in backends:
        os.environ["MMT_GRAM_BACKEND"] = backend
        jax.clear_caches()

        def chol_and_logdet(jac_):
            chol = system.chol_gram_blocks(jac_)
            return gram_ops.log_det_sqrt_gram_from_chol(*chol)

        fn = jax.jit(jax.vmap(chol_and_logdet))
        value = jax.block_until_ready(fn(jac))
        if reference_value is None:
            reference_value = np.asarray(value)
        else:
            # A few chains' random-interpolation probe states are non-finite
            # in BOTH backends (f32 Gram); compare finite-in-both chains only
            # and report the excluded count.
            value_a = np.asarray(value)
            finite = np.isfinite(value_a) & np.isfinite(reference_value)
            results["num_nonfinite_chains_excluded"] = int((~finite).sum())
            err = float(
                np.max(np.abs(value_a[finite] - reference_value[finite]))
                / max(1e-30, float(np.max(np.abs(reference_value[finite]))))
            )
            results["max_rel_diff_vs_jnp"] = err
        results[f"chol_gram_logdet_{backend}"] = timeit(
            fn, jac, label=f"chol_gram+logdet [{backend}]"
        )

        # Gradient path: the fused kernel's custom_vjp replays the jnp
        # reference in the backward pass, so this quantifies what a
        # hand-written backward kernel could still win.
        grad_fn = jax.jit(
            jax.vmap(
                lambda q_, x_: system.grad_log_det_sqrt_gram(
                    q_, x_, partition=0
                )[1]
            )
        )
        jax.block_until_ready(grad_fn(q, x_obs))
        results[f"grad_log_det_{backend}"] = timeit(
            grad_fn, q, x_obs, label=f"grad log-det-gram [{backend}]"
        )
    os.environ.pop("MMT_GRAM_BACKEND", None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
