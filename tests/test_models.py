"""Tests for the FHN and SIR example models."""

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.models import fhn, sir


def test_fhn_dims_and_contract():
    assert fhn.dim_x == 2 and fhn.dim_w == 1 and fhn.dim_z == 4
    assert fhn.dim_v == 2 and fhn.dim_v_0 == 2
    u = jnp.array([-1.2, -2.3, 0.4, 0.8])
    z = fhn.generate_z(u)
    np.testing.assert_allclose(z[:3], np.exp(np.asarray(u[:3])), rtol=1e-12)
    assert z[3] == u[3]
    x_0 = fhn.generate_x_0(z, jnp.array([0.1, 0.2]))
    np.testing.assert_allclose(x_0, [0.1, 0.2 - float(z[3])], rtol=1e-12)
    assert float(fhn.generate_sigma_y(jnp.arange(5.0))) == np.exp(4.0)


def test_fhn_forward_step_deterministic_part():
    # With sigma -> 0 the step should reduce to the deterministic order-2
    # Taylor update x + dt f + dt^2/2 (df/dx) f.
    z = jnp.array([1e-12, 0.1, 1.5, 0.8])
    x = jnp.array([-0.5, 0.2])
    v = jnp.zeros(2)
    dt = 0.01
    x_next = fhn.forward_func(z, x, v, dt)

    def f(x_):
        return fhn.drift_func(x_, z)

    expected = x + dt * f(x) + dt**2 / 2 * (jax.jacfwd(f)(x) @ f(x))
    np.testing.assert_allclose(x_next, expected, rtol=1e-8, atol=1e-10)


def test_fhn_noise_enters_both_components():
    # Hypoelliptic: the strong-1.5 scheme propagates noise into the first
    # (unobserved-noise) component through the drift coupling within a step.
    z = jnp.array([0.3, 0.1, 1.5, 0.8])
    x = jnp.array([-0.5, 0.2])
    dt = 0.008
    a = fhn.forward_func(z, x, jnp.array([1.0, 0.5]), dt)
    b = fhn.forward_func(z, x, jnp.array([-1.0, -0.5]), dt)
    assert abs(float(a[0] - b[0])) > 0  # noise reaches x_0
    assert abs(float(a[1] - b[1])) > 0


def test_fhn_generate_y_seq_shapes(rng):
    z = jnp.array([0.3, 0.1, 1.5, 0.8])
    x_0 = jnp.array([-0.5, 0.2])
    S, T = 20, 7
    v_seq = jnp.asarray(rng.standard_normal((S * T, fhn.dim_v)))
    y_seq = fhn.generate_y_seq(z, x_0, v_seq, 0.01, S)
    assert y_seq.shape == (T, 1)
    x_seq = fhn.generate_x_seq(z, x_0, v_seq, 0.01)
    np.testing.assert_allclose(y_seq, np.asarray(x_seq)[S - 1 :: S, 0:1])


def test_sir_dims_and_priors():
    assert sir.dim_x == 3 and sir.dim_w == 3 and sir.dim_z == 4
    assert sir.dim_v == 3 and sir.dim_v_0 == 1
    u = jnp.array([0.1, -0.2, 0.3, 0.4])
    z = sir.generate_z(u)
    np.testing.assert_allclose(z[0], np.exp(0.1), rtol=1e-12)
    np.testing.assert_allclose(z[1], np.exp(-0.2), rtol=1e-12)
    assert float(z[2]) == 0.3
    np.testing.assert_allclose(
        z[3], np.exp(np.sqrt(0.75) * 0.4 + 0.5 * (-0.2) - 3), rtol=1e-12
    )
    x_0 = sir.generate_x_0(z, jnp.array([0.7]))
    np.testing.assert_allclose(x_0, [np.log(762.0), 0.0, 0.7], rtol=1e-12)


def test_sir_forward_step_finite_and_grad_safe(rng):
    z = sir.generate_z(jnp.asarray(rng.standard_normal(4)))
    x = jnp.array([np.log(700.0), np.log(5.0), 0.5])
    v = jnp.asarray(rng.standard_normal(3))
    x_next = sir.forward_func(z, x, v, 0.1)
    assert np.all(np.isfinite(np.asarray(x_next)))

    # Extinct state (I -> -inf clipped): step and its gradient must be finite.
    x_extinct = jnp.array([np.log(700.0), -600.0, 0.5])
    x_next = sir.forward_func(z, x_extinct, v, 0.1)
    assert np.all(np.isfinite(np.asarray(x_next)))
    assert float(x_next[1]) == -500.0  # clipped to and frozen at the floor

    grad = jax.grad(lambda x_: sir.forward_func(z, x_, v, 0.1).sum())(x_extinct)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_sir_obs_func():
    x_seq = jnp.array([[0.0, np.log(3.0), 0.1], [0.0, np.log(9.0), 0.2]])
    np.testing.assert_allclose(sir.obs_func(x_seq), [[3.0], [9.0]], rtol=1e-12)


def test_sir_closed_form_matches_generic_ito_transform(rng):
    # The hand-derived log-domain coefficients must agree with the generic
    # AD-based Ito transform of the original-domain coefficients at benign
    # (non-extinct) states.
    from manifold_mcmc_tpu.ops.transforms import transform_sde

    g_drift, g_diff = transform_sde(
        lambda x: jnp.array([jnp.log(x[0]), jnp.log(x[1]), x[2]]),
        lambda y: jnp.array([jnp.exp(y[0]), jnp.exp(y[1]), y[2]]),
    )(sir.drift_func, sir.diff_coeff)

    for _ in range(3):
        z = sir.generate_z(jnp.asarray(rng.standard_normal(4)))
        y = jnp.array(
            [
                np.log(rng.uniform(100, 760)),
                np.log(rng.uniform(0.5, 100)),
                rng.standard_normal() * 0.5,
            ]
        )
        np.testing.assert_allclose(
            sir.log_domain_drift_func(y, z), g_drift(y, z), rtol=1e-9
        )
        np.testing.assert_allclose(
            sir.log_domain_diff_coeff(y, z), g_diff(y, z), rtol=1e-9, atol=1e-12
        )


def test_sir_log_transform_drift_matches_ito():
    # In log-space the infection-rate drift picks up the -0.5*B_row_sq/x^2
    # Ito correction; verify against a hand-derived expression for component 0:
    # d logS = (a_0/S) - (1/2)(B B^T)_{00}/S^2.
    z = sir.generate_z(jnp.array([0.2, -0.1, 0.0, 0.3]))
    x_log = jnp.array([np.log(600.0), np.log(20.0), 0.4])
    x = jnp.array([600.0, 20.0, 0.4])
    a = sir.drift_func(x, z)
    B = sir.diff_coeff(x, z)
    BBt = B @ B.T
    expected_0 = a[0] / 600.0 - 0.5 * BBt[0, 0] / 600.0**2
    # Recover the transformed drift via a tiny deterministic step.
    dt = 1e-7
    x_next = sir.forward_func(z, x_log, jnp.zeros(3), dt)
    drift_est = (x_next - x_log) / dt
    np.testing.assert_allclose(drift_est[0], expected_0, rtol=1e-4)
