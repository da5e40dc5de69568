"""Hypoelliptic FitzHugh-Nagumo model of neural spiking.

TPU-native rebuild of ``/root/reference/sde/example_models/fhn.py``.  The SDE

    dX_0 = (X_0 - X_0^3 - X_1) / eps dt
    dX_1 = (gamma X_0 - X_1 + beta) dt + sigma dW

is hypoelliptic (noise enters only the second component) and is discretised
with the strong order 1.5 Taylor scheme for additive noise so the noiseless
first component still receives stochastic forcing within a step.  Parameters
``z = [sigma, eps, gamma, beta]`` have log-normal priors on the first three
components and a normal prior on ``beta``; observations are the first state
component.
"""

import jax.numpy as jnp

from manifold_mcmc_tpu.models.base import make_generate_x_seq, make_generate_y_seq
from manifold_mcmc_tpu.ops.integrators import strong_order_1p5_step

dim_x = 2
dim_w = 1
dim_z = 4
dim_y = 1
dim_v_0 = dim_x
dim_v = 2 * dim_w


def drift_func(x, z):
    sigma, eps, gamma, beta = z
    return jnp.array([(x[0] - x[0] ** 3 - x[1]) / eps, gamma * x[0] - x[1] + beta])


def diff_coeff(x, z):
    sigma, eps, gamma, beta = z
    return jnp.array([[0.0 * sigma], [sigma]])


forward_func = strong_order_1p5_step(drift_func, diff_coeff, noise_type="additive")


def obs_func(x_seq):
    return x_seq[..., 0:1]


def generate_z(u):
    # z = [sigma, eps, gamma, beta]
    return jnp.array([jnp.exp(u[0]), jnp.exp(u[1]), jnp.exp(u[2]), u[3]])


def generate_sigma_y(u):
    return jnp.exp(u[dim_z])


def generate_x_0(z, v_0):
    # x_0 = v_0 - [0, 1] * beta, written component-wise so it broadcasts
    # over trailing batch axes of v_0 (SoA fast-path contract).
    return jnp.stack([v_0[0], v_0[1] - z[3]], axis=0)


generate_x_seq = make_generate_x_seq(forward_func)
generate_y_seq = make_generate_y_seq(forward_func, obs_func)
