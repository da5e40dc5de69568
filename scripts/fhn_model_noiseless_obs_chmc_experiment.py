"""FitzHugh-Nagumo (noiseless observations) parameter inference with CHMC.

TPU-native counterpart of the reference experiment
(``scripts/fhn_model_noiseless_obs_chmc_experiment.py``): simulate data on a
fine grid at the true parameters, build the constrained system, initialise
chains by linear interpolation, sample with the fully on-device CHMC driver
and write the standard output contract.
"""

import argparse
import datetime
import os

import utils

parser = argparse.ArgumentParser(
    description="FitzHugh-Nagumo model experiment (noiseless obs, CHMC)",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
utils.add_common_experiment_args(
    parser,
    default_num_steps_per_obs=25,
    default_num_warm_up_iter=250,
    default_num_main_iter=1000,
)
utils.add_chmc_experiment_args(parser, default_num_obs_per_subseq=5)
parser.add_argument("--num-obs", type=int, default=100, help="Number of observations")
parser.add_argument(
    "--true-parameters",
    type=float,
    nargs=4,
    default=[0.3, 0.1, 1.5, 0.8],
    help="True [sigma, eps, gamma, beta] used to generate the data",
)
parser.add_argument(
    "--true-initial-state",
    type=float,
    nargs=2,
    default=[-0.5, 0.2],
    help="True initial state used to generate the data",
)
parser.add_argument(
    "--obs-interval", type=float, default=0.2, help="Interobservation interval"
)
parser.add_argument(
    "--num-steps-per-obs-data",
    type=int,
    default=10000,
    help="Steps per interobservation interval on the data-generation grid",
)
args = parser.parse_args()
utils.setup_jax(args)

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.init.interpolation import (
    find_initial_state_by_linear_interpolation,
)
from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.utils.output import (
    create_output_dir_and_save_args,
    setup_logger,
)

timestamp = datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
dir_name = (
    f"R_{args.num_obs_per_subseq}_S_{args.num_steps_per_obs}_T_{args.num_obs}_"
    f"H_{args.num_inner_h2_step}_{args.splitting}_splitting_{timestamp}"
)
output_dir = args.output_dir or os.path.join(
    args.output_root_dir, "fhn_noiseless_chmc", dir_name
)
create_output_dir_and_save_args(output_dir, vars(args))
logger = setup_logger(output_dir)

# --- simulate observed data at the true parameters --------------------- #
dtype = jnp.float64 if args.x64 else jnp.float32
rng = np.random.default_rng(args.seed)
delta_data = args.obs_interval / args.num_steps_per_obs_data
z_true = jnp.asarray(args.true_parameters, dtype)
x_0_true = jnp.asarray(args.true_initial_state, dtype)
v_seq_data = jnp.asarray(
    rng.standard_normal((args.num_obs * args.num_steps_per_obs_data, fhn.dim_v)),
    dtype,
)
y_seq = fhn.generate_y_seq(
    z_true, x_0_true, v_seq_data, delta_data, args.num_steps_per_obs_data
)

system = ConditionedDiffusionConstrainedSystem(
    obs_interval=args.obs_interval,
    num_steps_per_obs=args.num_steps_per_obs,
    num_obs_per_subseq=args.num_obs_per_subseq,
    y_seq=y_seq,
    dim_u=fhn.dim_z,
    dim_x=fhn.dim_x,
    dim_v=fhn.dim_v,
    forward_func=fhn.forward_func,
    generate_x_0=fhn.generate_x_0,
    generate_z=fhn.generate_z,
    obs_func=fhn.obs_func,
    use_gaussian_splitting=args.splitting == "gaussian",
    dim_v_0=fhn.dim_v_0,
)


def trace_func(q):
    z = fhn.generate_z(q[: fhn.dim_z])
    x_0 = fhn.generate_x_0(z, q[fhn.dim_z : fhn.dim_z + fhn.dim_v_0])
    return {"σ": z[0], "ϵ": z[1], "γ": z[2], "β": z[3], "x_0": x_0}


# --- initialise chains by linear interpolation -------------------------- #
def x_obs_target(key):
    noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
    return jnp.concatenate([y_seq, noise], axis=-1)


keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.num_chain)
with utils.cpu_init_scope():
    q_init, x_obs_init = jax.vmap(
        lambda k: find_initial_state_by_linear_interpolation(
            system, jax.random.fold_in(k, 1), x_obs_target(jax.random.fold_in(k, 0))
        )
    )(keys)
q_init, x_obs_init = jax.device_put(
    (q_init, x_obs_init), jax.devices()[0]
)

summary = utils.run_chmc_experiment(
    args,
    system,
    q_init,
    x_obs_init,
    trace_func,
    ["σ", "ϵ", "γ", "β", "x_0"],
    output_dir,
    obs_scale=float(jnp.abs(y_seq).max()),
)
