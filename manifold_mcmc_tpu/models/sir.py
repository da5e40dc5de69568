"""Susceptible-infected-recovered epidemic model with time-varying contact rate.

TPU-native rebuild of ``/root/reference/sde/example_models/sir.py``.  The
original-domain state is ``[S, I, log(alpha)]`` with contact rate ``alpha``
following an Ornstein-Uhlenbeck process in log space; the diffusion
approximation to the jump process gives demographic square-root noise:

    dS = -alpha S I / N dt + sqrt(alpha S I / N) dW_1
    dI = (alpha S I / N - beta I) dt - sqrt(alpha S I / N) dW_1
         + sqrt(beta I) dW_2
    dc = gamma (zeta - c) dt + eps dW_3          (c = log alpha)

Integration is performed in log-transformed coordinates
``x = [log S, log I, log alpha]`` with an Euler-Maruyama step.  The reference
derives the log-domain coefficients symbolically via Ito's lemma and lets
SymPy *simplify* them; simplification matters because the naive composition
``J_f a + (1/2) (BB^T : H_f)`` at ``x = exp(y)`` contains ``1/I^2``
intermediates that overflow long before the simplified expressions do.  An AD
pipeline cannot cancel those symbols, so here the log-domain drift and
diffusion coefficient are written in closed form (hand-derived; validated
against the generic ``ops.transforms.transform_sde`` at benign states in
``tests/test_models.py``):

    a_u = -exp(c+w)/N - exp(c+w-u)/(2N)
    a_w =  exp(c+u)/N - beta - exp(c+u-w)/(2N) - beta exp(-w) / 2
    a_c =  gamma (zeta - c)
    B   = [[ sqrt(exp(c+w-u)/N),        0,               0  ],
           [-sqrt(exp(c+u-w)/N),  sqrt(beta exp(-w)),    0  ],
           [        0,                  0,              eps ]]

with ``u = log S``, ``w = log I``.

State components ``u, w`` are clipped below at a dtype-dependent floor
(-500 in f64, matching the reference's choice where ``exp(+-500)`` stays
finite in double precision; -30 in f32 so first-derivative products of
``exp(-w)`` terms stay below the f32 overflow threshold) and frozen there via
``lax.select`` so both values and gradients stay finite as populations go
extinct (the gradient-safe double-where pattern of reference ``sir.py:54-70``).

Parameters ``z = [beta, gamma, zeta, eps]``; observations are the infected
count ``I = exp(w)``.
"""

import jax.numpy as jnp
from jax import lax

from manifold_mcmc_tpu.models.base import make_generate_x_seq, make_generate_y_seq
from manifold_mcmc_tpu.ops.integrators import euler_maruyama_step

dim_x = 3
dim_y = 1
dim_w = 3
dim_z = 4
dim_v_0 = 1
dim_v = dim_w

N = 763  # total population size S + I + R


def drift_func(x, z):
    """Original-domain drift for state ``[S, I, log(alpha)]``."""
    alpha = jnp.exp(x[2])
    beta, gamma, zeta, eps = z
    return jnp.array(
        [
            -alpha * x[0] * x[1] / N,
            alpha * x[0] * x[1] / N - beta * x[1],
            gamma * (zeta - x[2]),
        ]
    )


def diff_coeff(x, z):
    """Original-domain diffusion coefficient for state ``[S, I, log(alpha)]``."""
    alpha = jnp.exp(x[2])
    beta, gamma, zeta, eps = z
    infection_noise = jnp.sqrt(alpha * x[0] * x[1] / N)
    zero = jnp.zeros_like(infection_noise)
    return jnp.array(
        [
            [infection_noise, zero, zero],
            [-infection_noise, jnp.sqrt(beta * x[1]), zero],
            [zero, zero, eps + zero],
        ]
    )


def log_domain_drift_func(x, z):
    """Ito-transformed drift in ``[log S, log I, log alpha]`` coordinates."""
    u, w, c = x
    beta, gamma, zeta, eps = z
    return jnp.array(
        [
            -jnp.exp(c + w) / N - jnp.exp(c + w - u) / (2 * N),
            jnp.exp(c + u) / N
            - beta
            - jnp.exp(c + u - w) / (2 * N)
            - beta * jnp.exp(-w) / 2,
            gamma * (zeta - c),
        ]
    )


def log_domain_diff_coeff(x, z):
    """Ito-transformed diffusion coefficient in log coordinates."""
    u, w, c = x
    beta, gamma, zeta, eps = z
    zero = jnp.zeros_like(u)
    return jnp.array(
        [
            [jnp.sqrt(jnp.exp(c + w - u) / N), zero, zero],
            [-jnp.sqrt(jnp.exp(c + u - w) / N), jnp.sqrt(beta * jnp.exp(-w)), zero],
            [zero, zero, eps + zero],
        ]
    )


_forward_func = euler_maruyama_step(log_domain_drift_func, log_domain_diff_coeff)


def _log_floor(dtype):
    return -500.0 if jnp.finfo(dtype).bits >= 64 else -30.0


def forward_func(z, x, v, dt):
    floor = _log_floor(x.dtype)
    x = x.at[:2].set(jnp.clip(x[:2], min=floor))
    x_next = _forward_func(z, x, v, dt)
    return jnp.array(
        [
            lax.select(x[0] > floor, x_next[0], x[0]),
            lax.select(x[1] > floor, x_next[1], x[1]),
            x_next[2],
        ]
    )


def obs_func(x_seq):
    return jnp.exp(x_seq[..., 1:2])


def generate_z(u):
    return jnp.array(
        [
            jnp.exp(u[0]),  # beta
            jnp.exp(u[1]),  # gamma
            u[2],  # zeta
            jnp.exp(jnp.sqrt(0.75) * u[3] + 0.5 * u[1] - 3),  # eps
        ]
    )


def generate_x_0(z, v_0):
    one = jnp.ones_like(v_0[0])
    return jnp.stack(
        [jnp.log(762.0) * one, jnp.log(1.0) * one, v_0[0]], axis=0
    )


def generate_sigma_y(u):
    return jnp.exp(u[dim_z])


generate_x_seq = make_generate_x_seq(forward_func)
generate_y_seq = make_generate_y_seq(forward_func, obs_func)
