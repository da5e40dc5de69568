"""Tests for the fused Pallas Gram kernel (interpret mode on CPU).

The fused kernel (``ops/pallas_gram.py``) must be bit-for-bit interchangeable
with the pure-jnp middle-block pipeline it replaces (``ops/gram.py``
``chol_gram_blocks``), including under ``vmap`` over chains and under
differentiation (its ``custom_vjp`` replays the jnp reference).  On CPU the
kernel runs through the Pallas interpreter (``MMT_GRAM_BACKEND=
pallas-interpret``), the same dispatch production uses on TPU with
``MMT_GRAM_BACKEND=pallas``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.ops import gram as gram_ops
from manifold_mcmc_tpu.ops import pallas_gram


@pytest.fixture
def rng():
    return np.random.default_rng(20260818)


def _random_blocks(rng, count=3, rows=5, m=17, dim_u=4, obs_rows=2, noisy=True,
                   dtype=np.float64):
    dv = jnp.asarray(rng.standard_normal((count, rows, m)), dtype)
    du = jnp.asarray(rng.standard_normal((count, rows, dim_u)), dtype)
    dn = (
        jnp.asarray(rng.standard_normal((count, obs_rows)), dtype)
        if noisy
        else None
    )
    return dv, du, dn


@pytest.mark.parametrize("noisy", [False, True])
@pytest.mark.parametrize("dtype", [np.float64, np.float32],
                         ids=["f64", "f32"])
def test_fused_matches_reference(rng, noisy, dtype):
    dv, du, dn = _random_blocks(rng, noisy=noisy, dtype=dtype)
    num_state_rows = 3  # rows=5, obs_rows=2
    ref = pallas_gram.middle_reference(dv, du, dn, num_state_rows)
    out = pallas_gram.fused_chol_gram_middle(
        dv, du, dn, num_state_rows, interpret=True
    )
    tol = dict(rtol=1e-10, atol=1e-12) if dtype == np.float64 else dict(
        rtol=2e-5, atol=1e-6
    )
    for r, o in zip(ref, out):
        assert np.asarray(o).dtype == dtype
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), **tol)


def test_fused_vmap_over_chains(rng):
    chains = 3
    dvs, dus, dns = [], [], []
    for _ in range(chains):
        dv, du, dn = _random_blocks(rng)
        dvs.append(dv), dus.append(du), dns.append(dn)
    dv, du, dn = jnp.stack(dvs), jnp.stack(dus), jnp.stack(dns)

    fused = jax.vmap(
        lambda a, b, c: pallas_gram.fused_chol_gram_middle(
            a, b, c, 3, interpret=True
        )
    )(dv, du, dn)
    ref = jax.vmap(lambda a, b, c: pallas_gram.middle_reference(a, b, c, 3))(
        dv, du, dn
    )
    for r, o in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-10,
                                   atol=1e-12)


def test_fused_gradient_matches_reference(rng):
    dv, du, dn = _random_blocks(rng)

    def loss_fused(dv, du, dn):
        chol_D, D_inv_du, sum_duT, hld = pallas_gram.fused_chol_gram_middle(
            dv, du, dn, 3, interpret=True
        )
        return hld + jnp.sum(sum_duT) + jnp.sum(D_inv_du) + jnp.sum(chol_D)

    def loss_ref(dv, du, dn):
        chol_D, D_inv_du, sum_duT, hld = pallas_gram.middle_reference(
            dv, du, dn, 3
        )
        return hld + jnp.sum(sum_duT) + jnp.sum(D_inv_du) + jnp.sum(chol_D)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(dv, du, dn)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(dv, du, dn)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-9,
                                   atol=1e-11)


def test_gram_backend_env_through_system_pipeline(rng, monkeypatch):
    """MMT_GRAM_BACKEND=pallas-interpret must reproduce the default path
    through the full constrained-system Gram / log-det / projection pipeline
    (mirrors the MMT_SMALLCHOL integration test)."""
    from tests.test_constrained_system import make_system, random_point

    system = make_system(noisy=True)
    q, x_obs_seq = random_point(system, rng)

    def pipeline():
        jac = system.jacob_constr_blocks(q, x_obs_seq, 0)
        chol = system.chol_gram_blocks(jac)
        (val, _), grad = system.grad_log_det_sqrt_gram(q, x_obs_seq, partition=0)
        res = system.quasi_newton_projection(
            q, x_obs_seq, jac, chol, 1.0, constraint_tol=1e-9
        )
        return val, grad, res.pos, res.converged

    monkeypatch.delenv("MMT_GRAM_BACKEND", raising=False)
    jax.clear_caches()
    val_jnp, grad_jnp, pos_jnp, ok_jnp = pipeline()
    monkeypatch.setenv("MMT_GRAM_BACKEND", "pallas-interpret")
    jax.clear_caches()
    val_pal, grad_pal, pos_pal, ok_pal = pipeline()
    jax.clear_caches()

    np.testing.assert_allclose(float(val_pal), float(val_jnp), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(grad_pal), np.asarray(grad_jnp), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(pos_pal), np.asarray(pos_jnp), rtol=1e-7, atol=1e-9
    )
    assert bool(ok_pal) == bool(ok_jnp)


def test_middle_reference_matches_gram_ops(rng):
    """The kernel's jnp oracle must itself agree with ops.gram's middle-block
    pipeline (same D assembly, Cholesky, solves and accumulation)."""
    dv, du, dn = _random_blocks(rng)
    num_state_rows = 3
    D = gram_ops.compute_D_blocks((dv,), (dn,), (dv,), (dn,), (num_state_rows,))[0]
    chol_D = jnp.linalg.cholesky(D)
    D_inv_du = jax.scipy.linalg.cho_solve((chol_D, True), du)
    sum_duT = jnp.einsum("bij,bik->jk", du, D_inv_du)
    hld = jnp.log(jnp.abs(chol_D.diagonal(0, -2, -1))).sum()

    ref = pallas_gram.middle_reference(dv, du, dn, num_state_rows)
    for expected, got in zip((chol_D, D_inv_du, sum_duT, hld), ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-12, atol=1e-14)
