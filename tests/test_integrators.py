"""Unit tests for the AD-based SDE integrator step factories.

Strategy (SURVEY.md section 4): validate each scheme against independent
oracles -- closed-form expansions for linear SDEs, finite differences for the
differential operators, and strong-convergence order estimates on a nonlinear
SDE with known fine-grid limit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.ops.integrators import (
    Lj_operator,
    diffusion_operator,
    euler_maruyama_step,
    milstein_step,
    strong_order_1p5_step,
)


def _ou_coeffs():
    # dX = -theta (X - mu) dt + sigma dW, z = [theta, mu, sigma]
    def drift(x, z):
        return -z[0] * (x - z[1])

    def diff(x, z):
        return jnp.eye(x.shape[0]) * z[2]

    return drift, diff


def test_euler_maruyama_matches_formula(rng):
    drift, diff = _ou_coeffs()
    step = euler_maruyama_step(drift, diff)
    x = jnp.asarray(rng.standard_normal(3))
    v = jnp.asarray(rng.standard_normal(3))
    z = jnp.array([0.7, -0.2, 1.3])
    dt = 0.05
    expected = x + dt * drift(x, z) + np.sqrt(dt) * diff(x, z) @ v
    np.testing.assert_allclose(step(z, x, v, dt), expected, rtol=1e-12)


def test_diffusion_operator_closed_form(rng):
    # L0 f = (df/dx) a + 0.5 sum_kl (BB^T)_kl d2f/dxk dxl, checked against a
    # hand-derived closed form for f = [exp(0.3 x0) x1, x0^3 - x1^2].
    def drift(x, z):
        return jnp.array([x[1] ** 2, -jnp.sin(x[0])])

    def diff(x, z):
        return jnp.array([[x[1], 0.1], [0.2, jnp.cos(x[0])]])

    def f(x, z):
        return jnp.array([jnp.exp(0.3 * x[0]) * x[1], x[0] ** 3 - x[1] ** 2])

    x = jnp.asarray(rng.standard_normal(2))
    z = jnp.zeros(1)
    result = diffusion_operator(drift, diff)(f)(x, z)

    x0, x1 = float(x[0]), float(x[1])
    a = np.array([x1**2, -np.sin(x0)])
    B = np.asarray(diff(x, z))
    M = B @ B.T
    e = np.exp(0.3 * x0)
    grad0 = np.array([0.3 * e * x1, e])
    hess0 = np.array([[0.09 * e * x1, 0.3 * e], [0.3 * e, 0.0]])
    grad1 = np.array([3 * x0**2, -2 * x1])
    hess1 = np.array([[6 * x0, 0.0], [0.0, -2.0]])
    expected = np.array(
        [
            grad0 @ a + 0.5 * np.sum(M * hess0),
            grad1 @ a + 0.5 * np.sum(M * hess1),
        ]
    )
    np.testing.assert_allclose(result, expected, rtol=1e-9)


def test_Lj_operator_matches_jvp(rng):
    def diff(x, z):
        return jnp.array([[x[0], x[1]], [0.3, x[0] * x[1]]])

    def f(x, z):
        return jnp.array([x[0] ** 2, x[0] * x[1]])

    x = jnp.asarray(rng.standard_normal(2))
    z = jnp.zeros(1)
    for j in range(2):
        result = Lj_operator(diff, j)(f)(x, z)
        B = np.asarray(diff(x, z))
        jac = np.asarray(jax.jacfwd(lambda x_: f(x_, z))(x))
        np.testing.assert_allclose(result, jac @ B[:, j], rtol=1e-10)


def test_milstein_diagonal_correction(rng):
    # Geometric Brownian motion per-component: B = diag(sigma_i x_i), so the
    # Milstein correction is sigma_i^2 x_i (dw_i^2 - dt) / 2.
    def drift(x, z):
        return z[0] * x

    def diff(x, z):
        return jnp.diag(z[1:] * x)

    step = milstein_step(drift, diff, noise_type="diagonal")
    x = jnp.abs(jnp.asarray(rng.standard_normal(2))) + 0.5
    v = jnp.asarray(rng.standard_normal(2))
    z = jnp.array([0.1, 0.4, 0.9])
    dt = 0.02
    dw = np.sqrt(dt) * np.asarray(v)
    sig = np.asarray(z[1:])
    expected = (
        np.asarray(x)
        + dt * 0.1 * np.asarray(x)
        + sig * np.asarray(x) * dw
        + sig**2 * np.asarray(x) * (dw**2 - dt) / 2
    )
    np.testing.assert_allclose(step(z, x, v, dt), expected, rtol=1e-10)


def test_milstein_scalar_correction(rng):
    # Scalar-noise SDE with B(x) = [x0*s, s]^T: correction_i = (sum_k B_k dB_i/dx_k)
    # * (dw^2 - dt)/2 = [x0 s^2, 0] * (dw^2 - dt)/2.
    def drift(x, z):
        return jnp.zeros_like(x)

    def diff(x, z):
        return jnp.array([[x[0] * z[0]], [z[0]]])

    step = milstein_step(drift, diff, noise_type="scalar")
    x = jnp.array([1.4, -0.3])
    v = jnp.array([0.6])
    z = jnp.array([0.8])
    dt = 0.05
    dw = np.sqrt(dt) * 0.6
    expected = np.array(
        [
            1.4 + 1.4 * 0.8 * dw + 1.4 * 0.8**2 * (dw**2 - dt) / 2,
            -0.3 + 0.8 * dw,
        ]
    )
    np.testing.assert_allclose(step(z, x, v, dt), expected, rtol=1e-10)


def test_strong_order_1p5_additive_linear_exact_terms():
    # For a linear additive-noise SDE dX = A X dt + b dW the 1.5 scheme gives
    # x + dt A x + b dw + dt^2/2 A^2 x + (A b) dzeta  -- check term by term.
    A = jnp.array([[0.0, 1.0], [-2.0, -0.5]])
    b = jnp.array([[0.0], [0.7]])

    def drift(x, z):
        return A @ x

    def diff(x, z):
        return b

    step = strong_order_1p5_step(drift, diff, noise_type="additive")
    x = jnp.array([0.3, -1.1])
    v = jnp.array([0.4, -0.9])
    dt = 0.1
    dw = np.sqrt(dt) * 0.4
    dzeta = dt * np.sqrt(dt) * (0.4 + (-0.9) / np.sqrt(3)) / 2
    expected = (
        np.asarray(x)
        + dt * np.asarray(A @ x)
        + np.asarray(b[:, 0]) * dw
        + dt**2 / 2 * np.asarray(A @ A @ x)
        + np.asarray(A @ b[:, 0]) * dzeta
    )
    np.testing.assert_allclose(step(jnp.zeros(1), x, v, dt), expected, rtol=1e-10)


@pytest.mark.parametrize(
    "make_step, order",
    [
        (lambda d, b: euler_maruyama_step(d, b), 0.5),
        (lambda d, b: milstein_step(d, b, "scalar"), 1.0),
        (lambda d, b: strong_order_1p5_step(d, b, "scalar"), 1.5),
    ],
)
def test_strong_convergence_order(rng, make_step, order):
    # Nonlinear scalar-noise SDE; strong error vs a very fine reference path
    # driven by the same Brownian increments should scale ~ dt^order.
    def drift(x, z):
        return jnp.array([jnp.sin(x[0]) - 0.5 * x[0]])

    def diff(x, z):
        return jnp.array([[0.4 + 0.2 * jnp.cos(x[0])]])

    num_v = 2 if order == 1.5 else 1
    step = make_step(drift, diff)
    fine_step = strong_order_1p5_step(drift, diff, "scalar")

    T, n_fine = 1.0, 2**10
    n_paths = 64
    dt_fine = T / n_fine
    # Draw the fine-grid (v1, v2) pair; the scheme maps these to the coupled
    # increments dw = sqrt(dt) v1 and dzeta = int (W(s)-W(t)) ds
    #           = dt^{3/2} (v1 + v2/sqrt(3)) / 2.
    v1_f = rng.standard_normal((n_paths, n_fine))
    v2_f = rng.standard_normal((n_paths, n_fine))
    dW = np.sqrt(dt_fine) * v1_f
    dZeta = dt_fine**1.5 * (v1_f + v2_f / np.sqrt(3)) / 2

    def make_sim(step_fn):
        @jax.jit
        def sim(v_seq, dt):
            # v_seq: (n_paths, n_steps, num_v_components)
            def one_path(vs):
                def body(x, v):
                    return step_fn(jnp.zeros(1), x, v, dt), None

                x_final, _ = jax.lax.scan(body, jnp.array([0.5]), vs)
                return x_final[0]

            return jax.vmap(one_path)(v_seq)

        return sim

    sim_fine = make_sim(fine_step)
    sim_coarse = make_sim(step)

    v_fine = np.stack([v1_f, v2_f], axis=-1)
    x_ref = np.asarray(sim_fine(jnp.asarray(v_fine), dt_fine))

    errors = []
    dts = []
    for k in (4, 5):  # coarse grids with 2^k steps
        n = 2**k
        m = n_fine // n
        dt = T / n
        dW_b = dW.reshape(n_paths, n, m)
        dZ_b = dZeta.reshape(n_paths, n, m)
        dW_c = dW_b.sum(-1)
        # Exact aggregation of the time-integral increment: over substep i,
        # int (W - W(t0)) = dzeta_i + h * (W(t_i) - W(t_0)).
        w_before = np.concatenate(
            [np.zeros_like(dW_b[..., :1]), np.cumsum(dW_b, -1)[..., :-1]], -1
        )
        dZ_c = dZ_b.sum(-1) + dt_fine * w_before.sum(-1)
        v1_c = dW_c / np.sqrt(dt)
        parts = [v1_c[..., None]]
        if num_v == 2:
            v2_c = np.sqrt(3.0) * (2 * dZ_c / dt**1.5 - v1_c)
            parts.append(v2_c[..., None])
        v_c = np.concatenate(parts, axis=-1)
        x_c = np.asarray(sim_coarse(jnp.asarray(v_c), dt))
        errors.append(np.sqrt(np.mean((x_c - x_ref) ** 2)))
        dts.append(dt)

    est_order = np.log(errors[0] / errors[1]) / np.log(dts[0] / dts[1])
    min_order = {0.5: 0.4, 1.0: 0.8, 1.5: 1.2}[order]
    assert est_order > min_order, f"estimated order {est_order:.2f} too low"
