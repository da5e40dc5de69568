"""Tests for the Ito-lemma change-of-variables transform."""

import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.ops.transforms import transform_sde


def test_log_transform_of_gbm():
    # Geometric Brownian motion dX = mu X dt + sigma X dW under y = log x
    # becomes dY = (mu - sigma^2/2) dt + sigma dW (classic Ito's lemma check).
    def drift(x, z):
        return z[0] * x

    def diff(x, z):
        return (z[1] * x)[:, None]

    t_drift, t_diff = transform_sde(
        lambda x: jnp.log(x),
        lambda y: jnp.exp(y),
    )(drift, diff)

    z = jnp.array([0.3, 0.8])
    y = jnp.array([0.25])
    np.testing.assert_allclose(
        t_drift(y, z), np.array([0.3 - 0.8**2 / 2]), rtol=1e-10
    )
    np.testing.assert_allclose(t_diff(y, z), np.array([[0.8]]), rtol=1e-10)


def test_linear_transform_preserves_moments(rng):
    # Under an invertible linear map y = T x the transformed SDE must have
    # drift T a(T^-1 y) and diffusion T B(T^-1 y) (no Ito correction).
    T = jnp.array([[2.0, 1.0], [0.0, 3.0]])
    T_inv = jnp.linalg.inv(T)

    def drift(x, z):
        return jnp.array([x[1], -x[0]])

    def diff(x, z):
        return jnp.array([[1.0, 0.0], [0.5, 2.0]])

    t_drift, t_diff = transform_sde(lambda x: T @ x, lambda y: T_inv @ y)(
        drift, diff
    )
    y = jnp.asarray(rng.standard_normal(2))
    x = T_inv @ y
    np.testing.assert_allclose(t_drift(y, jnp.zeros(1)), T @ drift(x, None), rtol=1e-9)
    np.testing.assert_allclose(t_diff(y, jnp.zeros(1)), T @ diff(x, None), rtol=1e-9)
