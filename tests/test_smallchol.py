"""Unit tests for the unrolled tiny-matrix linear algebra (ops/smallchol.py).

These functions are the TPU fast path inside ``ops.gram`` (CPU dispatches to
the library kernels instead), so they are tested directly here against
``jnp.linalg`` / ``jax.scipy`` on random SPD batches -- including under
``jax.grad``, since the Gram log-determinant differentiates through them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.ops.smallchol import (
    cho_solve_small,
    cholesky_small,
    log_diag_prod_small,
    solve_lower_small,
    solve_upper_small,
)


def random_spd(rng, batch, n):
    A = rng.standard_normal(batch + (n, n))
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))


@pytest.mark.parametrize("n", [1, 2, 5, 7])
@pytest.mark.parametrize("batch", [(), (4,), (3, 5)])
def test_cholesky_matches_library(rng, n, batch):
    D = random_spd(rng, batch, n)
    np.testing.assert_allclose(
        np.asarray(cholesky_small(D)),
        np.asarray(jnp.linalg.cholesky(D)),
        rtol=1e-12,
        atol=1e-12,
    )


@pytest.mark.parametrize("rhs", ["vector", "matrix"])
def test_cho_solve_matches_direct(rng, rhs):
    D = random_spd(rng, (6,), 5)
    L = cholesky_small(D)
    b = jnp.asarray(
        rng.standard_normal((6, 5) if rhs == "vector" else (6, 5, 3))
    )
    x = cho_solve_small(L, b)
    lhs = jnp.einsum("bij,bj->bi", D, x) if rhs == "vector" else D @ x
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(b), rtol=1e-9, atol=1e-9)


def test_triangular_solves(rng):
    D = random_spd(rng, (4,), 6)
    L = cholesky_small(D)
    b = jnp.asarray(rng.standard_normal((4, 6)))
    y = solve_lower_small(L, b)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", L, y)), np.asarray(b), rtol=1e-10
    )
    x = solve_upper_small(jnp.swapaxes(L, -1, -2), b)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bji,bj->bi", L, x)), np.asarray(b), rtol=1e-10
    )


def test_log_diag_prod(rng):
    D = random_spd(rng, (8,), 7)
    L = cholesky_small(D)
    np.testing.assert_allclose(
        np.asarray(log_diag_prod_small(L)),
        np.asarray(jnp.log(jnp.abs(L.diagonal(0, -2, -1))).sum(-1)),
        rtol=1e-12,
    )


def test_gradients_match_library(rng):
    """d/dA of log det(A A^T + c I) through the unrolled factorisation.

    The raw d/dD gradients differ in *form* (the unrolled algorithm reads
    only the lower triangle, the library rule symmetrises), but both are
    valid gradients on the symmetric subspace -- so through any symmetric
    construction of D (here A A^T + c I, exactly the Gram use case) the
    chain-ruled gradients must agree.
    """
    A = jnp.asarray(rng.standard_normal((5, 5)))

    def f_small(A_):
        D = A_ @ A_.T + 5.0 * jnp.eye(5)
        return log_diag_prod_small(cholesky_small(D))

    def f_lib(A_):
        D = A_ @ A_.T + 5.0 * jnp.eye(5)
        return jnp.log(jnp.abs(jnp.linalg.cholesky(D).diagonal(0, -2, -1))).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_small)(A)),
        np.asarray(jax.grad(f_lib)(A)),
        rtol=1e-9,
        atol=1e-11,
    )


@pytest.mark.parametrize("n", [1, 2, 3])
def test_solve_small_matches_library(rng, n):
    from manifold_mcmc_tpu.ops.smallchol import solve_small

    A = jnp.asarray(rng.standard_normal((7, n, n))) + 2.0 * jnp.eye(n)
    b = jnp.asarray(rng.standard_normal((7, n)))
    np.testing.assert_allclose(
        np.asarray(solve_small(A, b)),
        np.asarray(jnp.linalg.solve(A, b[..., None])[..., 0]),
        rtol=1e-9,
        atol=1e-11,
    )
