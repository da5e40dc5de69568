"""SIR epidemic model inference on boarding-school data with standard HMC.

TPU-native counterpart of the reference experiment
(``scripts/sir_model_hmc_experiment.py``).
"""

import argparse
import datetime
import os

import utils

parser = argparse.ArgumentParser(
    description="SIR model experiment (boarding school data, HMC)",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
utils.add_common_experiment_args(
    parser,
    default_num_steps_per_obs=20,
    default_num_warm_up_iter=500,
    default_num_main_iter=2500,
)
utils.add_hmc_experiment_args(parser)
utils.add_observation_noise_std_arg(parser, default_val=1.0)
args = parser.parse_args()
utils.setup_jax(args)

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.models import sir
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
sigma_y = abs(args.observation_noise_std)

timestamp = datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
dir_name = (
    f"sigma_{args.observation_noise_std}_S_{args.num_steps_per_obs}_"
    f"{args.metric_type}_metric_{args.splitting}_splitting_{timestamp}"
)
output_dir = args.output_dir or os.path.join(
    args.output_root_dir, "sir_hmc", dir_name
)
create_output_dir_and_save_args(output_dir, vars(args))
logger = setup_logger(output_dir)

dtype = jnp.float64 if args.x64 else jnp.float32
data = np.load(
    os.path.join(os.path.dirname(__file__), "data", "sir_model_boarding_school_data.npz")
)
obs_interval = float(data["obs_interval"])
# Host-CPU-resident data: the CPU-scoped init below otherwise re-fetches an
# accelerator-resident y_seq through the tunnel (a wedge opportunity per
# transfer on flaky runtimes -- see the CHMC script's note).
with utils.cpu_init_scope():
    y_seq = jnp.asarray(data["y_seq"], dtype)

dim_u = sir.dim_z + (1 if infer_sigma_y else 0)
generate_sigma = sir.generate_sigma_y if infer_sigma_y else sigma_y

neg_log_dens = make_conditioned_diffusion_neg_log_dens(
    obs_interval,
    args.num_steps_per_obs,
    y_seq,
    dim_u,
    sir.dim_v_0,
    sir.dim_v,
    sir.forward_func,
    sir.generate_x_0,
    sir.generate_z,
    generate_sigma,
    sir.obs_func,
    use_gaussian_splitting=args.splitting == "gaussian",
)
system = (
    GaussianEuclideanSystem(neg_log_dens)
    if args.splitting == "gaussian"
    else EuclideanSystem(neg_log_dens)
)

num_obs = y_seq.shape[0]
dim_q = dim_u + sir.dim_v_0 + num_obs * args.num_steps_per_obs * sir.dim_v
args.dim_param = dim_u + sir.dim_v_0


def trace_func(q):
    z = sir.generate_z(q[: sir.dim_z])
    out = {"β": z[0], "γ": z[1], "ζ": z[2], "ϵ": z[3], "α_0": jnp.exp(q[dim_u])}
    if infer_sigma_y:
        out["σ_y"] = sir.generate_sigma_y(q[:dim_u])
    return out


# Initialise by the chain-vmapped gradient-descent on the exact posterior
# (reference ``scripts/sir_model_hmc_experiment.py:105-128`` runs the same
# noisy-system routine for its HMC chains).  The routine is defined on the
# constrained (noisy) layout, so descend through an init-only constrained
# system and keep the ``[u, v_0, v]`` core; the absorbed obs-noise
# coordinates are dropped (the HMC target integrates them out analytically).
from manifold_mcmc_tpu.init.optimization import (  # noqa: E402
    find_initial_states_by_gradient_descent_noisy_system,
)
from manifold_mcmc_tpu.systems.constrained import (  # noqa: E402
    ConditionedDiffusionConstrainedSystem,
)

with utils.cpu_init_scope():
    init_system = ConditionedDiffusionConstrainedSystem(
        obs_interval=obs_interval,
        num_steps_per_obs=args.num_steps_per_obs,
        num_obs_per_subseq=None,
        y_seq=y_seq,
        dim_u=dim_u,
        dim_x=sir.dim_x,
        dim_v=sir.dim_v,
        forward_func=sir.forward_func,
        generate_x_0=sir.generate_x_0,
        generate_z=sir.generate_z,
        obs_func=sir.obs_func,
        generate_sigma=generate_sigma,
        dim_v_0=sir.dim_v_0,
    )
# On resume the host-loop driver restores chain state from the checkpoint,
# so the expensive fleet init is skipped (the saved q is already the
# dim_q-truncated HMC state).
resumed = utils.checkpoint_resume_state(output_dir, keys=("q",))
if resumed is None:
    with utils.cpu_init_scope():
        q_init_full, _ = find_initial_states_by_gradient_descent_noisy_system(
            init_system, jax.random.PRNGKey(args.seed + 1), num_chains=args.num_chain
        )
    q_init_full = q_init_full[:, :dim_q]
else:
    (q_init_full,) = resumed
q_init = jax.device_put(
    q_init_full.astype(dtype), jax.devices()[0]
)

summary_vars = ["β", "γ", "ζ", "ϵ", "α_0"] + (["σ_y"] if infer_sigma_y else [])
summary = utils.run_hmc_experiment(
    args, system, q_init, trace_func, summary_vars, output_dir
)
