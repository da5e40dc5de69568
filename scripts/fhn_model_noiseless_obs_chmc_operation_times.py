"""Per-operation timing microbenchmark for the FHN noiseless CHMC system.

TPU-native counterpart of the reference's operation-times harness
(``scripts/fhn_model_noiseless_obs_chmc_operation_times.py``): times each
core system operation over a batch of random states via ``jit(vmap(op))``
(the reference uses ``jit(lax.map(op))`` on CPU, ``:30-65``), reporting the
median per-state latency over repeats for a grid of (R, S, T) settings.
Writes ``fhn_noiseless_call_times.json`` in the output directory.
"""

import argparse
import json
import os
import timeit

import utils

parser = argparse.ArgumentParser(
    description="FHN noiseless CHMC per-operation timing benchmark",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
utils.add_experiment_grid_args(parser)
parser.add_argument("--output-root-dir", default="experiments")
parser.add_argument("--num-state", type=int, default=1000, help="Batch size")
parser.add_argument("--num-repeat", type=int, default=10, help="Timing repeats")
parser.add_argument("--obs-interval", type=float, default=0.2)
parser.add_argument("--seed", type=int, default=20200710)
parser.add_argument("--x64", action="store_true")
parser.add_argument("--platform", default=None)
parser.add_argument(
    "--grid-variable",
    choices=("R", "S", "T", "all"),
    default="all",
    help="Which grid to sweep (others held at defaults)",
)
args = parser.parse_args()
utils.setup_jax(args)

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.utils.config import default_tolerances


def build_system(R, S, T, rng, dtype):
    dim_q = fhn.dim_z + fhn.dim_v_0 + T * S * fhn.dim_v
    q_probe = jnp.asarray(rng.standard_normal(dim_q) * 0.4, dtype)

    def build(y):
        return ConditionedDiffusionConstrainedSystem(
            obs_interval=args.obs_interval,
            num_steps_per_obs=S,
            num_obs_per_subseq=R,
            y_seq=y,
            dim_u=fhn.dim_z,
            dim_x=fhn.dim_x,
            dim_v=fhn.dim_v,
            forward_func=fhn.forward_func,
            generate_x_0=fhn.generate_x_0,
            generate_z=fhn.generate_z,
            obs_func=fhn.obs_func,
            dim_v_0=fhn.dim_v_0,
        )

    probe = build(jnp.zeros((T, 1), dtype))
    x_obs = probe.generate_x_obs_seq(q_probe)
    return build(fhn.obs_func(x_obs)), q_probe, x_obs


def get_batched_system_funcs(system, x_obs, tols):
    """Batched versions of the core system operations (reference ``:30-65``)."""

    def with_jac(f):
        def wrapped(q):
            jac = system.jacob_constr_blocks(q, x_obs, 0)
            return f(q, jac)

        return wrapped

    funcs = {
        "neg_log_dens": lambda q: system.neg_log_dens(q),
        "grad_neg_log_dens": lambda q: system.grad_neg_log_dens(q),
        "constr": lambda q: system.constr(q, x_obs, 0),
        "jacob_constr_blocks": lambda q: system.jacob_constr_blocks(q, x_obs, 0),
        "chol_gram_blocks": with_jac(
            lambda q, jac: system.chol_gram_blocks(jac)
        ),
        "log_det_sqrt_gram": lambda q: system.log_det_sqrt_gram(q, x_obs)[0],
        "grad_log_det_sqrt_gram": lambda q: system.grad_log_det_sqrt_gram(q, x_obs)[1],
        "normal_space_component": with_jac(
            lambda q, jac: system.normal_space_component(
                q, jac, system.chol_gram_blocks(jac)
            )
        ),
        "quasi_newton_projection": with_jac(
            lambda q, jac: system.quasi_newton_projection(
                q,
                x_obs,
                jac,
                system.chol_gram_blocks(jac),
                0.1,
                constraint_tol=tols["constraint_tol"],
                position_tol=tols["position_tol"],
            ).pos
        ),
    }
    return {name: jax.jit(jax.vmap(f)) for name, f in funcs.items()}


def main():
    dtype = jnp.float64 if args.x64 else jnp.float32
    tols = default_tolerances()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.output_root_dir, exist_ok=True)

    grids = []
    if args.grid_variable in ("R", "all"):
        grids += [
            (R, args.default_num_steps_per_obs, args.default_num_obs)
            for R in args.num_obs_per_subseq_grid
        ]
    if args.grid_variable in ("S", "all"):
        grids += [
            (args.default_num_obs_per_subseq, S, args.default_num_obs)
            for S in args.num_steps_per_obs_grid
        ]
    if args.grid_variable in ("T", "all"):
        grids += [
            (args.default_num_obs_per_subseq, args.default_num_steps_per_obs, T)
            for T in args.num_obs_grid
        ]
    # de-duplicate preserving order
    grids = list(dict.fromkeys(grids))

    results = {}
    for R, S, T in grids:
        if R > T:
            continue
        system, q_probe, x_obs = build_system(R, S, T, rng, dtype)
        qs = q_probe[None] + 0.01 * jnp.asarray(
            rng.standard_normal((args.num_state, q_probe.shape[0])), dtype
        )
        funcs = get_batched_system_funcs(system, x_obs, tols)
        op_times = {}
        for name, f in funcs.items():
            jax.block_until_ready(f(qs))  # compile
            times = timeit.repeat(
                lambda: jax.block_until_ready(f(qs)),
                number=1,
                repeat=args.num_repeat,
            )
            op_times[name] = float(np.median(times)) / args.num_state
        results[f"R_{R}_S_{S}_T_{T}"] = op_times
        print(f"R={R} S={S} T={T}: " + json.dumps(op_times))

    out_path = os.path.join(args.output_root_dir, "fhn_noiseless_call_times.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
