"""Worked FitzHugh-Nagumo example: simulate, infer with CHMC, diagnose.

Script counterpart of the reference's ``FitzHugh-Nagumo_example.ipynb``
tutorial: end-to-end inference for the hypoelliptic FitzHugh-Nagumo model
from noiseless observations of the first state component.

Run on CPU (double precision) with:

    JAX_PLATFORMS=cpu python examples/fhn_example.py --x64

or on an accelerator in float32 simply with:

    python examples/fhn_example.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--x64", action="store_true")
parser.add_argument("--num-obs", type=int, default=40)
parser.add_argument("--num-steps-per-obs", type=int, default=10)
parser.add_argument("--num-obs-per-subseq", type=int, default=5)
parser.add_argument("--num-chain", type=int, default=8)
parser.add_argument("--num-warm-up-iter", type=int, default=100)
parser.add_argument("--num-main-iter", type=int, default=400)
args = parser.parse_args()

import jax

jax.config.update("jax_default_matmul_precision", "highest")
if args.x64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.init.interpolation import (
    find_initial_state_by_linear_interpolation,
)
from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.utils import stats as diag
from manifold_mcmc_tpu.utils.config import default_tolerances

# ----------------------------------------------------------------------- #
# 1. Simulate observed data at known true parameters.                      #
#                                                                          #
# The FHN SDE dX0 = (X0 - X0^3 - X1)/eps dt, dX1 = (gamma X0 - X1 + beta)  #
# dt + sigma dW is hypoelliptic: noise only enters X1 but spreads to X0    #
# through the drift, which is why the strong order-1.5 Taylor scheme is    #
# used for time discretisation (it injects noise into both components      #
# within a step).                                                          #
# ----------------------------------------------------------------------- #
dtype = jnp.float64 if args.x64 else jnp.float32
rng = np.random.default_rng(20200710)
z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)  # [sigma, eps, gamma, beta]
x_0_true = jnp.array([-0.5, 0.2], dtype)
obs_interval = 0.2
steps_data = 1000
v_data = jnp.asarray(
    rng.standard_normal((args.num_obs * steps_data, fhn.dim_v)), dtype
)
y_seq = fhn.generate_y_seq(
    z_true, x_0_true, v_data, obs_interval / steps_data, steps_data
)
print(f"simulated {args.num_obs} observations, range "
      f"[{float(y_seq.min()):.2f}, {float(y_seq.max()):.2f}]")

# ----------------------------------------------------------------------- #
# 2. Build the constrained system: the posterior over the flat latent      #
#    vector q = [u, v_0, v_1..ST] restricted to the manifold where the     #
#    simulated path reproduces the observations exactly.                   #
# ----------------------------------------------------------------------- #
system = ConditionedDiffusionConstrainedSystem(
    obs_interval=obs_interval,
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
    dim_v_0=fhn.dim_v_0,
)

# ----------------------------------------------------------------------- #
# 3. Initialise chains exactly on the manifold by linear interpolation.    #
# ----------------------------------------------------------------------- #
def x_obs_target(key):
    # Target states consistent with the observations: observed coordinate =
    # y exactly, unobserved coordinate drawn from a broad Gaussian.
    noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
    return jnp.concatenate([y_seq, noise], axis=-1)


keys = jax.random.split(jax.random.PRNGKey(1), args.num_chain)
q_init, x_obs_init = jax.vmap(
    lambda k: find_initial_state_by_linear_interpolation(
        system, jax.random.fold_in(k, 1), x_obs_target(jax.random.fold_in(k, 0))
    )
)(keys)
c0 = jax.vmap(lambda q, x: system.constr(q, x, 0))(q_init, x_obs_init)
print(f"init max|c| = {float(jnp.abs(c0).max()):.2e} (on manifold)")

# ----------------------------------------------------------------------- #
# 4. Sample with constrained HMC (dynamic multinomial trees, alternating   #
#    staggered partitions, dual-averaging step size adaptation).           #
# ----------------------------------------------------------------------- #
tols = default_tolerances()
t0 = time.time()
result = sample_chmc_chains(
    system,
    q_init,
    x_obs_init,
    jax.random.PRNGKey(2),
    num_warm_up_iter=args.num_warm_up_iter,
    num_main_iter=args.num_main_iter,
    max_tree_depth=8,
    trace_func=lambda q: {
        "σ": fhn.generate_z(q[:4])[0],
        "ϵ": fhn.generate_z(q[:4])[1],
        "γ": fhn.generate_z(q[:4])[2],
        "β": fhn.generate_z(q[:4])[3],
    },
    **tols,
)
jax.block_until_ready(result["final_pos"])
elapsed = time.time() - t0
print(f"sampling took {elapsed:.1f}s "
      f"(adapted step size {float(result['final_step_size']):.3g}, "
      f"mean accept {float(np.asarray(result['stats']['accept_stat']).mean()):.2f})")

# ----------------------------------------------------------------------- #
# 5. Diagnostics: posterior means should bracket the true parameters with  #
#    healthy ESS and split-R-hat ~ 1.                                      #
# ----------------------------------------------------------------------- #
traces = {k: np.asarray(v) for k, v in result["traces"].items()}
summary = diag.summary(traces, ["σ", "ϵ", "γ", "β"])
true_vals = dict(zip(["σ", "ϵ", "γ", "β"], np.asarray(z_true)))
print(f"{'param':>6} {'true':>7} {'mean':>8} {'sd':>7} {'ess_bulk':>9} {'r_hat':>6}")
for p in ["σ", "ϵ", "γ", "β"]:
    print(
        f"{p:>6} {true_vals[p]:7.3f} {summary['mean'][p]:8.3f} "
        f"{summary['sd'][p]:7.3f} {summary['ess_bulk'][p]:9.1f} "
        f"{summary['r_hat'][p]:6.3f}"
    )
