"""SIR epidemic model inference on boarding-school data with CHMC.

TPU-native counterpart of the reference experiment
(``scripts/sir_model_chmc_experiment.py``): real data (14 daily infected
counts), noisy-observation constrained system, initialisation by gradient
descent on the posterior with residual absorption.
"""

import argparse
import datetime
import os

import utils

parser = argparse.ArgumentParser(
    description="SIR model experiment (boarding school data, CHMC)",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter,
)
utils.add_common_experiment_args(
    parser,
    default_num_steps_per_obs=20,
    default_num_warm_up_iter=500,
    default_num_main_iter=2500,
)
utils.add_chmc_experiment_args(parser, default_num_obs_per_subseq=14)
utils.add_observation_noise_std_arg(parser, default_val=1.0)
args = parser.parse_args()
utils.setup_jax(args)

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.init.optimization import (
    find_initial_states_by_gradient_descent_noisy_system,
)
from manifold_mcmc_tpu.models import sir
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.utils.output import (
    create_output_dir_and_save_args,
    setup_logger,
)

infer_sigma_y = args.observation_noise_std < 0
sigma_y = abs(args.observation_noise_std)

timestamp = datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
dir_name = (
    f"sigma_{args.observation_noise_std}_R_{args.num_obs_per_subseq}_"
    f"S_{args.num_steps_per_obs}_H_{args.num_inner_h2_step}_"
    f"{args.splitting}_splitting_{timestamp}"
)
output_dir = args.output_dir or os.path.join(
    args.output_root_dir, "sir_chmc", dir_name
)
create_output_dir_and_save_args(output_dir, vars(args))
logger = setup_logger(output_dir)

dtype = jnp.float64 if args.x64 else jnp.float32
data = np.load(
    os.path.join(os.path.dirname(__file__), "data", "sir_model_boarding_school_data.npz")
)
obs_interval = float(data["obs_interval"])

dim_u = sir.dim_z + (1 if infer_sigma_y else 0)
generate_sigma = sir.generate_sigma_y if infer_sigma_y else sigma_y

# Data and system arrays live on the HOST CPU backend: the initialisation
# phase below runs entirely on CPU, and an accelerator-resident y_seq
# would be re-fetched through the tunnel by every init computation that
# closes over the system -- each such device->host transfer is a wedge
# opportunity on a flaky tunnel (observed: three SIR launches hung
# mid-init on a lost transfer, connection-reader thread parked forever).
# The sampling phase is unaffected: its inputs are explicitly device_put
# to the accelerator, and jitted sweeps bake the small closed-over arrays
# as executable constants.
with utils.cpu_init_scope():
    y_seq = jnp.asarray(data["y_seq"], dtype)
    system = ConditionedDiffusionConstrainedSystem(
        obs_interval=obs_interval,
        num_steps_per_obs=args.num_steps_per_obs,
        num_obs_per_subseq=args.num_obs_per_subseq,
        y_seq=y_seq,
        dim_u=dim_u,
        dim_x=sir.dim_x,
        dim_v=sir.dim_v,
        forward_func=sir.forward_func,
        generate_x_0=sir.generate_x_0,
        generate_z=sir.generate_z,
        obs_func=sir.obs_func,
        generate_sigma=generate_sigma,
        use_gaussian_splitting=args.splitting == "gaussian",
        dim_v_0=sir.dim_v_0,
    )


def trace_func(q):
    z = sir.generate_z(q[: sir.dim_z])
    out = {"β": z[0], "γ": z[1], "ζ": z[2], "ϵ": z[3], "α_0": jnp.exp(q[dim_u])}
    if infer_sigma_y:
        out["σ_y"] = sir.generate_sigma_y(q[:dim_u])
    return out


# Initialise the whole fleet by one chain-vmapped gradient-descent loop with
# residual absorption (one jitted program, not one host loop per chain --
# essential at 256+ chains through a high-latency accelerator tunnel).  On
# resume the host-loop driver restores chain state from the checkpoint, so
# the init (and its on-manifold pre-flight check) is skipped entirely.
resumed = utils.checkpoint_resume_state(output_dir)
if resumed is None:
    key = jax.random.PRNGKey(args.seed + 1)
    with utils.cpu_init_scope():
        q_init, x_obs_init = find_initial_states_by_gradient_descent_noisy_system(
            system, key, num_chains=args.num_chain
        )
else:
    q_init, x_obs_init = resumed
# SIR observations are daily infected counts (up to ~300), so the f32
# constraint tolerance must be relative to that scale — see
# utils/config.default_tolerances.
obs_scale = float(jnp.abs(y_seq).max())
tols = utils.resolve_chmc_tolerances(args, obs_scale=obs_scale)
if resumed is None:
    # Pre-flight on-manifold check on the CPU backend, BEFORE the single
    # explicit transfer to the accelerator (the only tunnel touch of the
    # whole init phase).
    with utils.cpu_init_scope():
        c_val = float(
            jnp.abs(
                jax.vmap(lambda q, x: system.constr(q, x, 0))(q_init, x_obs_init)
            ).max()
        )
    assert c_val < tols["constraint_tol"], (
        f"init off manifold: max|c|={c_val:.2e} vs tol {tols['constraint_tol']:.2e}"
    )
q_init, x_obs_init = jax.device_put(
    (q_init.astype(dtype), x_obs_init.astype(dtype)), jax.devices()[0]
)

summary_vars = ["β", "γ", "ζ", "ϵ", "α_0"] + (["σ_y"] if infer_sigma_y else [])
summary = utils.run_chmc_experiment(
    args,
    system,
    q_init,
    x_obs_init,
    trace_func,
    summary_vars,
    output_dir,
    obs_scale=obs_scale,
)
