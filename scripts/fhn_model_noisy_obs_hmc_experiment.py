"""FitzHugh-Nagumo (noisy observations) inference with standard dynamic HMC.

TPU-native counterpart of the reference experiment
(``scripts/fhn_model_noisy_obs_hmc_experiment.py``): non-centred
unconstrained parameterisation with a scan-based Gaussian likelihood, dynamic
multinomial HMC and the selected adaptive metric.
"""

import argparse
import datetime
import os

import utils

parser = argparse.ArgumentParser(
    description="FitzHugh-Nagumo model experiment (noisy obs, HMC)",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
utils.add_common_experiment_args(
    parser,
    default_num_steps_per_obs=40,
    default_num_warm_up_iter=500,
    default_num_main_iter=2500,
)
utils.add_hmc_experiment_args(parser)
utils.add_observation_noise_std_arg(parser)
args = parser.parse_args()
utils.setup_jax(args)

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.systems.euclidean import (
    EuclideanSystem,
    GaussianEuclideanSystem,
    make_conditioned_diffusion_neg_log_dens,
)
from manifold_mcmc_tpu.utils.output import (
    create_output_dir_and_save_args,
    setup_logger,
)

infer_sigma_y = args.observation_noise_std < 0
sigma_y_data = abs(args.observation_noise_std)

timestamp = datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
dir_name = (
    f"sigma_{args.observation_noise_std}_S_{args.num_steps_per_obs}_"
    f"{args.metric_type}_metric_{args.splitting}_splitting_{timestamp}"
)
output_dir = args.output_dir or os.path.join(
    args.output_root_dir, "fhn_noisy_hmc", dir_name
)
create_output_dir_and_save_args(output_dir, vars(args))
logger = setup_logger(output_dir)

dtype = jnp.float64 if args.x64 else jnp.float32
data = np.load(
    os.path.join(os.path.dirname(__file__), "data", "fhn_model_noisy_obs_simulated_data.npz")
)
obs_interval = float(data["obs_interval"])
y_seq = jnp.asarray(
    (data["y_seq_mean"] + sigma_y_data * data["n_seq"])[:, None], dtype
)

dim_u = fhn.dim_z + (1 if infer_sigma_y else 0)
generate_sigma = fhn.generate_sigma_y if infer_sigma_y else sigma_y_data

neg_log_dens = make_conditioned_diffusion_neg_log_dens(
    obs_interval,
    args.num_steps_per_obs,
    y_seq,
    dim_u,
    fhn.dim_v_0,
    fhn.dim_v,
    fhn.forward_func,
    fhn.generate_x_0,
    fhn.generate_z,
    generate_sigma,
    fhn.obs_func,
    use_gaussian_splitting=args.splitting == "gaussian",
)
system = (
    GaussianEuclideanSystem(neg_log_dens)
    if args.splitting == "gaussian"
    else EuclideanSystem(neg_log_dens)
)

num_obs = y_seq.shape[0]
dim_q = dim_u + fhn.dim_v_0 + num_obs * args.num_steps_per_obs * fhn.dim_v
args.dim_param = dim_u + fhn.dim_v_0  # block-metric parameter block size


def trace_func(q):
    z = fhn.generate_z(q[: fhn.dim_z])
    x_0 = fhn.generate_x_0(z, q[dim_u : dim_u + fhn.dim_v_0])
    out = {"σ": z[0], "ϵ": z[1], "γ": z[2], "β": z[3], "x_0": x_0}
    if infer_sigma_y:
        out["σ_y"] = fhn.generate_sigma_y(q[:dim_u])
    return out


# Initialise chains by linear interpolation through a state sequence
# consistent with the observations (reference
# ``scripts/fhn_model_noisy_obs_hmc_experiment.py:105-134``): the unobserved
# coordinate is padded with 0.5-scaled noise and per-step noise vectors are
# solved so the path hits the targets.  Starting from a data-consistent path
# keeps early warm-up trees bounded; from white-noise paths the first
# iterations at max_tree_depth=20 run million-step trees.
from manifold_mcmc_tpu.init.interpolation import (  # noqa: E402
    find_initial_state_by_linear_interpolation,
    make_unconstrained_init_model,
)

init_model = make_unconstrained_init_model(
    obs_interval,
    args.num_steps_per_obs,
    num_obs,
    dim_u,
    fhn.dim_v_0,
    fhn.dim_v,
    fhn.dim_x,
    fhn.forward_func,
    fhn.generate_x_0,
    fhn.generate_z,
)


def x_obs_target(key):
    noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
    return jnp.concatenate([y_seq, noise], axis=-1)


init_keys = jax.random.split(
    jax.random.PRNGKey(args.seed + 1), args.num_chain
)
with utils.cpu_init_scope():
    q_init, _ = jax.vmap(
        lambda k: find_initial_state_by_linear_interpolation(
            init_model,
            jax.random.fold_in(k, 1),
            x_obs_target(jax.random.fold_in(k, 0)),
        )
    )(init_keys)
q_init = jax.device_put(q_init.astype(dtype), jax.devices()[0])

summary_vars = ["σ", "ϵ", "γ", "β", "x_0"] + (["σ_y"] if infer_sigma_y else [])
summary = utils.run_hmc_experiment(
    args, system, q_init, trace_func, summary_vars, output_dir
)
