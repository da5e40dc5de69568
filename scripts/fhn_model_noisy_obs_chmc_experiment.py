"""FitzHugh-Nagumo (noisy observations) parameter inference with CHMC.

TPU-native counterpart of the reference experiment
(``scripts/fhn_model_noisy_obs_chmc_experiment.py``): loads the canned
simulated dataset (observation means + standardised noise draws), composes
``y = mean + sigma * n`` for the requested noise level, and samples the
noisy-observation constrained system.  A negative ``--observation-noise-std``
treats the noise scale as unknown and infers it (|value| generates the data).
"""

import argparse
import datetime
import os

import utils

parser = argparse.ArgumentParser(
    description="FitzHugh-Nagumo model experiment (noisy obs, CHMC)",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
utils.add_common_experiment_args(
    parser,
    default_num_steps_per_obs=40,
    default_num_warm_up_iter=500,
    default_num_main_iter=2500,
)
utils.add_chmc_experiment_args(parser, default_num_obs_per_subseq=5)
utils.add_observation_noise_std_arg(parser)
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

infer_sigma_y = args.observation_noise_std < 0
sigma_y_data = abs(args.observation_noise_std)

timestamp = datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
dir_name = (
    f"sigma_{args.observation_noise_std}_R_{args.num_obs_per_subseq}_"
    f"S_{args.num_steps_per_obs}_H_{args.num_inner_h2_step}_"
    f"{args.splitting}_splitting_{timestamp}"
)
output_dir = args.output_dir or os.path.join(
    args.output_root_dir, "fhn_noisy_chmc", dir_name
)
create_output_dir_and_save_args(output_dir, vars(args))
logger = setup_logger(output_dir)

# --- load canned data and compose observations -------------------------- #
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

system = ConditionedDiffusionConstrainedSystem(
    obs_interval=obs_interval,
    num_steps_per_obs=args.num_steps_per_obs,
    num_obs_per_subseq=args.num_obs_per_subseq,
    y_seq=y_seq,
    dim_u=dim_u,
    dim_x=fhn.dim_x,
    dim_v=fhn.dim_v,
    forward_func=fhn.forward_func,
    generate_x_0=fhn.generate_x_0,
    generate_z=fhn.generate_z,
    obs_func=fhn.obs_func,
    generate_sigma=generate_sigma,
    use_gaussian_splitting=args.splitting == "gaussian",
    dim_v_0=fhn.dim_v_0,
)


def trace_func(q):
    z = fhn.generate_z(q[: fhn.dim_z])
    x_0 = fhn.generate_x_0(z, q[dim_u : dim_u + fhn.dim_v_0])
    out = {"σ": z[0], "ϵ": z[1], "γ": z[2], "β": z[3], "x_0": x_0}
    if infer_sigma_y:
        out["σ_y"] = fhn.generate_sigma_y(q[:dim_u])
    return out


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

summary_vars = ["σ", "ϵ", "γ", "β", "x_0"] + (["σ_y"] if infer_sigma_y else [])
summary = utils.run_chmc_experiment(
    args,
    system,
    q_init,
    x_obs_init,
    trace_func,
    summary_vars,
    output_dir,
    obs_scale=float(jnp.abs(y_seq).max()),
)
