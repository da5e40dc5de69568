"""Euclidean-metric Hamiltonian systems for standard (unconstrained) HMC.

Functional replacement for the ``mici.systems.EuclideanMetricSystem`` /
``GaussianEuclideanMetricSystem`` surface the reference plugs into
(``scripts/utils.py:221-228``), plus the conditioned-diffusion negative
log-density factory (reference ``sde/mici_extensions.py:82-205``).

Unlike the reference -- where the density functions are NumPy-wrapped and
non-finite values raise ``HamiltonianDivergenceError`` on the host -- these
systems stay fully traceable: non-finite Hamiltonians surface as data and the
samplers convert them into per-chain divergence flags / rejections.
"""

import jax
import jax.numpy as jnp
from jax import lax

from manifold_mcmc_tpu.utils.pytree import split

__all__ = [
    "EuclideanSystem",
    "GaussianEuclideanSystem",
    "make_conditioned_diffusion_neg_log_dens",
]


def make_conditioned_diffusion_neg_log_dens(
    obs_interval,
    num_steps_per_obs,
    y_seq,
    dim_u,
    dim_v_0,
    dim_v,
    forward_func,
    generate_x_0,
    generate_z,
    generate_sigma,
    obs_func,
    use_gaussian_splitting=False,
    unroll=None,
):
    """Negative log posterior density of the non-centred diffusion model.

    The latent ``q = [u, v_0, v_seq_flat]`` has a standard-normal prior; the
    likelihood is Gaussian around the simulated observation means.  With
    ``use_gaussian_splitting`` the ``(1/2) q.q`` prior term is *excluded* (it
    is handled exactly by the Gaussian system's rotation flow).

    Returns a pure jittable ``neg_log_dens(q)`` (reference
    ``mici_extensions.py:165-184``).
    """
    y_seq = jnp.asarray(y_seq)
    if y_seq.ndim == 1:
        y_seq = y_seq[:, None]
    num_obs, dim_y = y_seq.shape
    delta = obs_interval / num_steps_per_obs
    num_step = num_steps_per_obs * num_obs
    if not callable(generate_sigma):
        sigma_const = float(generate_sigma)

        def generate_sigma(u):  # noqa: F811 - constant closure
            return jnp.asarray(sigma_const, dtype=u.dtype)

    # Within-interval steps are unrolled in the scan body (loop overhead
    # dominates on TPU -- the per-step state is tiny), but the unroll factor
    # is CAPPED: every executable containing this graph (and especially its
    # AD transpose) grows linearly with the unroll, and remote workers with
    # bounded SHARED program memory fail program loads with
    # RESOURCE_EXHAUSTED once a few oversized executables are resident
    # (observed at num_steps_per_obs=40, the reference's canonical noisy-obs
    # configuration -- scripts/fhn_model_noisy_obs_hmc_experiment.py:32-40;
    # an unroll-20 strong-1.5 grad body replicated into the search + tree
    # programs still failed under ambient worker pressure, unroll 8 loads).
    if unroll is None:
        unroll = next(
            u
            for u in range(min(num_steps_per_obs, 8), 0, -1)
            if num_steps_per_obs % u == 0
        )
    num_chunks = num_steps_per_obs // unroll

    def neg_log_dens(q):
        u, v_0, v_flat = split(q, (dim_u, dim_v_0))
        z = generate_z(u)
        sigma = generate_sigma(u)
        x_0 = generate_x_0(z, v_0)
        v_by_obs = v_flat.reshape((num_obs, num_steps_per_obs, dim_v))

        def body(x, v_obs):
            if num_chunks == 1:
                for i in range(num_steps_per_obs):
                    x = forward_func(z, x, v_obs[i], delta)
                return x, x

            def inner(x, v_chunk):
                for i in range(unroll):
                    x = forward_func(z, x, v_chunk[i], delta)
                return x, None

            x, _ = lax.scan(
                inner, x, v_obs.reshape((num_chunks, unroll, dim_v))
            )
            return x, x

        _, x_obs_states = lax.scan(body, x_0, v_by_obs)
        y_mean = obs_func(x_obs_states)
        nld = 0.5 * jnp.sum(((y_seq - y_mean) / sigma) ** 2) + (
            num_obs * dim_y
        ) * jnp.log(sigma)
        if not use_gaussian_splitting:
            nld = nld + 0.5 * jnp.sum(q**2)
        return nld

    return neg_log_dens


class EuclideanSystem:
    """Hamiltonian system ``h = nld(q) + (1/2) p.M^-1 p`` on flat space."""

    def __init__(self, neg_log_dens):
        self.neg_log_dens = jax.jit(neg_log_dens)
        self.val_and_grad_neg_log_dens = jax.jit(jax.value_and_grad(neg_log_dens))

    def h1(self, q, nld_val):
        return nld_val

    def dh1_dpos(self, q, nld_grad):
        return nld_grad

    def h2(self, q, mom, metric):
        return 0.5 * mom @ metric.inv_mult(mom)

    def h2_flow(self, q, mom, dt, metric):
        return q + dt * metric.inv_mult(mom), mom

    def sample_momentum(self, key, q, metric):
        return metric.sqrt_mult(jax.random.normal(key, q.shape, q.dtype))


class GaussianEuclideanSystem(EuclideanSystem):
    """System with the Gaussian prior handled exactly in the ``h2`` flow.

    ``h1 = nld(q)`` (Gaussian part excluded), ``h2 = (1/2) q.q +
    (1/2) p.M^-1 p`` with exact rotation flow -- the "Gaussian splitting" of
    the reference (``mici_extensions.py:147-151``).
    """

    def h2(self, q, mom, metric):
        return 0.5 * (q @ q) + 0.5 * mom @ metric.inv_mult(mom)

    def h2_flow(self, q, mom, dt, metric):
        return metric.gaussian_flow(q, mom, dt)
