"""Oracle tests for the conditioned-diffusion constrained system.

Strategy (SURVEY.md section 4): on tiny configurations, every structured /
blocked quantity is checked against a dense reference computed directly with
``jax.jacrev`` and dense linear algebra on the explicit Gram matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.systems.metrics import BlockDiagonalMetric, IdentityMetric


def make_system(noisy=False, num_obs_per_subseq=2, num_obs=6, S=3):
    rng = np.random.default_rng(42)
    y_seq = jnp.asarray(rng.standard_normal((num_obs, 1)) * 0.5)
    return ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=num_obs_per_subseq,
        y_seq=y_seq,
        dim_u=fhn.dim_z + (1 if noisy else 0),
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        generate_sigma=fhn.generate_sigma_y if noisy else None,
        dim_v_0=fhn.dim_v_0,
    )


def random_point(system, rng):
    q = jnp.asarray(rng.standard_normal(system.layout.dim_q) * 0.3)
    x_obs_seq = system.generate_x_obs_seq(q) + jnp.asarray(
        rng.standard_normal((system.layout.num_obs, system.layout.dim_x)) * 0.1
    )
    return q, x_obs_seq


def dense_jacobian(system, q, x_obs_seq, partition):
    return jax.jacrev(lambda q_: system.constr(q_, x_obs_seq, partition))(q)


def assemble_dense_from_blocks(system, jac, partition):
    """Rebuild the full constraint Jacobian from its structured blocks."""
    layout = system.layout
    scheme = system.schemes[partition]
    du, dv, dn = jac
    total_rows = scheme.total_rows(layout)
    J = np.zeros((total_rows, layout.dim_q))
    row = 0
    vcol = layout.dim_u  # v coords start after u (block 0's dv covers v_0 too)
    ncol = layout.dim_q_core
    for b, spec in enumerate(scheme.blocks):
        du_b = np.asarray(du[b]).reshape((-1,) + du[b].shape[-1:])
        dv_b = np.asarray(dv[b])
        rows_per = spec.rows(layout)
        noise_dim = dv_b.shape[-1]
        dv_b = dv_b.reshape((-1, rows_per, noise_dim))
        for k in range(spec.count):
            r0 = row + k * rows_per
            J[r0 : r0 + rows_per, : layout.dim_u] = du_b[
                k * rows_per : (k + 1) * rows_per
            ]
            c0 = vcol + k * noise_dim
            J[r0 : r0 + rows_per, c0 : c0 + noise_dim] = dv_b[k]
        if dn is not None:
            dn_b = np.asarray(dn[b]).reshape((spec.count, -1))
            obs_rows = spec.obs_rows(layout)
            for k in range(spec.count):
                r0 = row + k * rows_per
                c0 = ncol + k * obs_rows
                J[np.arange(r0, r0 + obs_rows), np.arange(c0, c0 + obs_rows)] = dn_b[k]
            ncol += spec.count * obs_rows
        row += spec.count * rows_per
        vcol += spec.count * noise_dim
    return J


@pytest.mark.parametrize("noisy", [False, True])
@pytest.mark.parametrize("partition", [0, 1])
def test_jacobian_blocks_match_dense(rng, noisy, partition):
    system = make_system(noisy=noisy)
    q, x_obs_seq = random_point(system, rng)
    J_dense = np.asarray(dense_jacobian(system, q, x_obs_seq, partition))
    jac = system.jacob_constr_blocks(q, x_obs_seq, partition)
    J_blocks = assemble_dense_from_blocks(system, jac, partition)
    np.testing.assert_allclose(J_blocks, J_dense, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("noisy", [False, True])
def test_unblocked_scheme_jacobian(rng, noisy):
    system = make_system(noisy=noisy, num_obs_per_subseq=None)
    assert system.num_partition == 1
    q, x_obs_seq = random_point(system, rng)
    J_dense = np.asarray(dense_jacobian(system, q, x_obs_seq, 0))
    jac = system.jacob_constr_blocks(q, x_obs_seq, 0)
    J_blocks = assemble_dense_from_blocks(system, jac, 0)
    np.testing.assert_allclose(J_blocks, J_dense, rtol=1e-8, atol=1e-10)


def test_constr_consistent_x_obs_gives_zero_state_rows(rng):
    # With x_obs_seq generated from q itself, the state-matching rows must be
    # exactly zero and the observation rows must equal full-path residuals.
    system = make_system()
    layout = system.layout
    q = jnp.asarray(rng.standard_normal(layout.dim_q) * 0.3)
    x_obs_seq = system.generate_x_obs_seq(q)
    # Full-path observation residuals.
    u, v_0, v_seq, _ = layout.split_q(q)
    z = fhn.generate_z(u)
    x_0 = fhn.generate_x_0(z, v_0)
    x_path = fhn.generate_x_seq(z, x_0, v_seq, system.delta)
    resid = np.asarray(
        fhn.obs_func(x_path[layout.num_steps_per_obs - 1 :: layout.num_steps_per_obs])
        - system.y_seq
    ).ravel()

    c = np.asarray(system.constr(q, x_obs_seq, 0))
    # partition 0 blocks for T=6, R=2: init(2 obs), middle(1x2 obs), final(2)
    expected = np.concatenate(
        [
            resid[0:1],  # init block: first obs residual
            np.zeros(2),  # init block: state-match rows
            resid[2:3],  # middle block interior obs
            np.zeros(2),
            resid[4:6],  # final block: both obs
        ]
    )
    np.testing.assert_allclose(c, expected, atol=1e-10)


@pytest.mark.parametrize("noisy", [False, True])
@pytest.mark.parametrize("metric_type", ["identity", "block"])
@pytest.mark.parametrize("partition", [0, 1])
def test_gram_solves_match_dense(rng, noisy, metric_type, partition):
    system = make_system(noisy=noisy)
    layout = system.layout
    q, x_obs_seq = random_point(system, rng)
    if metric_type == "identity":
        metric = IdentityMetric()
        M_inv = np.eye(layout.dim_q)
    else:
        A = rng.standard_normal((layout.dim_u, layout.dim_u))
        M0 = A @ A.T + layout.dim_u * np.eye(layout.dim_u)
        metric = BlockDiagonalMetric(jnp.asarray(M0))
        M_inv = np.eye(layout.dim_q)
        M_inv[: layout.dim_u, : layout.dim_u] = np.linalg.inv(M0)

    jac = system.jacob_constr_blocks(q, x_obs_seq, partition)
    J = assemble_dense_from_blocks(system, jac, partition)
    G = J @ M_inv @ J.T

    from manifold_mcmc_tpu.ops import gram as gram_ops

    # Jacobian-vector products.
    vq = rng.standard_normal(layout.dim_q)
    np.testing.assert_allclose(
        gram_ops.lmult_by_jacob_constr(jac, layout, jnp.asarray(vq)),
        J @ vq,
        rtol=1e-8,
        atol=1e-10,
    )
    vc = rng.standard_normal(G.shape[0])
    np.testing.assert_allclose(
        gram_ops.rmult_by_jacob_constr(jac, jnp.asarray(vc)),
        vc @ J,
        rtol=1e-8,
        atol=1e-10,
    )

    # Woodbury Gram solve and log-determinant.
    chol = system.chol_gram_blocks(jac, metric, partition)
    np.testing.assert_allclose(
        gram_ops.lmult_by_inv_gram(jac, chol, jnp.asarray(vc)),
        np.linalg.solve(G, vc),
        rtol=1e-7,
        atol=1e-9,
    )
    val, _ = system.log_det_sqrt_gram(q, x_obs_seq, metric, partition)
    np.testing.assert_allclose(
        val, 0.5 * np.linalg.slogdet(G)[1], rtol=1e-9
    )

    # Cotangent projector: P v = v - M^-1-weighted normal component.
    ns = system.normal_space_component(jnp.asarray(vq), jac, chol, metric)
    expected_ns = J.T @ np.linalg.solve(G, J @ (M_inv @ vq))
    np.testing.assert_allclose(ns, expected_ns, rtol=1e-7, atol=1e-9)
    projected = system.project_onto_cotangent_space(jnp.asarray(vq), jac, chol, metric)
    np.testing.assert_allclose(
        J @ (M_inv @ np.asarray(projected)), 0, atol=1e-8
    )


@pytest.mark.parametrize("noisy", [False, True])
def test_lu_jacob_product_matches_dense(rng, noisy):
    system = make_system(noisy=noisy)
    layout = system.layout
    q1, x_obs_seq = random_point(system, rng)
    q2 = q1 + 0.05 * jnp.asarray(rng.standard_normal(layout.dim_q))
    jac_l = system.jacob_constr_blocks(q1, x_obs_seq, 0)
    jac_r = system.jacob_constr_blocks(q2, x_obs_seq, 0)
    J_l = assemble_dense_from_blocks(system, jac_l, 0)
    J_r = assemble_dense_from_blocks(system, jac_r, 0)
    P = J_l @ J_r.T

    from manifold_mcmc_tpu.ops import gram as gram_ops

    scheme = system.schemes[0]
    lu = gram_ops.lu_jacob_product_blocks(
        jnp.eye(layout.dim_u),
        jac_l,
        jac_r,
        scheme.num_state_rows_per_block(layout),
    )
    vc = rng.standard_normal(P.shape[0])
    np.testing.assert_allclose(
        gram_ops.lmult_by_inv_jacob_product(jac_l, jac_r, *lu, jnp.asarray(vc)),
        np.linalg.solve(P, vc),
        rtol=1e-6,
        atol=1e-8,
    )


@pytest.mark.parametrize(
    "noisy, partition, metric_type, impl",
    [
        # pairwise coverage of every axis; two heaviest combos marked slow
        (False, 0, "identity", "scan"),
        (True, 1, "block", "rollout"),
        pytest.param(True, 0, "block", "scan", marks=pytest.mark.slow),
        pytest.param(False, 1, "identity", "rollout", marks=pytest.mark.slow),
    ],
)
def test_manual_logdet_grad_matches_ad(rng, noisy, partition, metric_type, impl):
    """The analytic-cotangent gradient mode (``logdet_grad="manual"``,
    ``ops.gram.logdet_gram_jac_cotangent``) must reproduce reverse-mode AD
    through the blocked Cholesky exactly (both are the same mathematical
    gradient; f64 CPU agreement to tight tolerance)."""
    system_ad = ConditionedDiffusionConstrainedSystem(
        **{**_system_kwargs(noisy), "impl": impl, "logdet_grad": "ad"}
    )
    system_manual = ConditionedDiffusionConstrainedSystem(
        **{**_system_kwargs(noisy), "impl": impl, "logdet_grad": "manual"}
    )
    q, x_obs_seq = random_point(system_ad, rng)
    if metric_type == "identity":
        metric = IdentityMetric()
    else:
        layout = system_ad.layout
        A = rng.standard_normal((layout.dim_u, layout.dim_u))
        metric = BlockDiagonalMetric(
            jnp.asarray(A @ A.T + layout.dim_u * np.eye(layout.dim_u))
        )
    (val_ad, (jac_ad, chol_ad)), grad_ad = system_ad.grad_log_det_sqrt_gram(
        q, x_obs_seq, metric, partition
    )
    (val_m, (jac_m, chol_m)), grad_m = system_manual.grad_log_det_sqrt_gram(
        q, x_obs_seq, metric, partition
    )
    np.testing.assert_allclose(val_m, val_ad, rtol=1e-12)
    np.testing.assert_allclose(grad_m, grad_ad, rtol=1e-7, atol=1e-10)
    # aux factors (reused by the projection solvers) must match too
    for a, b in zip(jax.tree.leaves((jac_ad, chol_ad)),
                    jax.tree.leaves((jac_m, chol_m))):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def _system_kwargs(noisy, num_obs_per_subseq=2, num_obs=6, S=3):
    rng = np.random.default_rng(42)
    y_seq = jnp.asarray(rng.standard_normal((num_obs, 1)) * 0.5)
    return dict(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=num_obs_per_subseq,
        y_seq=y_seq,
        dim_u=fhn.dim_z + (1 if noisy else 0),
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        generate_sigma=fhn.generate_sigma_y if noisy else None,
        dim_v_0=fhn.dim_v_0,
    )


@pytest.mark.slow
def test_grad_log_det_sqrt_gram_matches_dense_ad(rng):
    system = make_system()
    q, x_obs_seq = random_point(system, rng)

    def dense_log_det(q_):
        J = jax.jacrev(lambda qq: system.constr(qq, x_obs_seq, 0))(q_)
        return 0.5 * jnp.linalg.slogdet(J @ J.T)[1]

    (val, _), grad = system.grad_log_det_sqrt_gram(q, x_obs_seq)
    np.testing.assert_allclose(val, dense_log_det(q), rtol=1e-9)
    np.testing.assert_allclose(
        grad, jax.grad(dense_log_det)(q), rtol=1e-6, atol=1e-9
    )


def on_manifold_point(system, rng):
    """Construct an exactly on-manifold state by simulating the data from q."""
    layout = system.layout
    q = jnp.asarray(rng.standard_normal(layout.dim_q) * 0.3)
    x_obs_seq = system.generate_x_obs_seq(q)
    y_sim = fhn.obs_func(x_obs_seq)
    system_on = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=layout.num_steps_per_obs,
        num_obs_per_subseq=2,
        y_seq=y_sim,
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        dim_v_0=fhn.dim_v_0,
    )
    return system_on, q, x_obs_seq


@pytest.mark.parametrize("solver", ["newton", "quasi-newton", "hybrid"])
def test_projection_solvers_converge(rng, solver):
    base = make_system()
    system, q0, x_obs_seq = on_manifold_point(base, rng)
    np.testing.assert_allclose(system.constr(q0, x_obs_seq, 0), 0, atol=1e-12)
    jac = system.jacob_constr_blocks(q0, x_obs_seq, 0)
    chol = system.chol_gram_blocks(jac)
    # Perturb off the manifold and project back using the previous point's
    # Jacobian (the RATTLE setting).
    q_off = q0 + 1e-3 * jnp.asarray(rng.standard_normal(q0.shape[0]))
    if solver == "newton":
        res = system.newton_projection(
            q_off, x_obs_seq, jac, dt=0.1, constraint_tol=1e-10, position_tol=1e-9
        )
    elif solver == "hybrid":
        res = system.hybrid_projection(
            q_off, x_obs_seq, jac, dt=0.1,
            constraint_tol=1e-10, position_tol=1e-9,
        )
    else:
        res = system.quasi_newton_projection(
            q_off, x_obs_seq, jac, chol, dt=0.1,
            constraint_tol=1e-10, position_tol=1e-9,
        )
    assert bool(res.converged)
    assert int(res.iters) >= 1
    c_new = system.constr(res.pos, x_obs_seq, 0)
    assert float(jnp.max(jnp.abs(c_new))) < 1e-9
    # The applied correction must lie in the row space of J(q0) scaled by dt:
    # q_new = q_off - J^T lam, mu = J^T lam / dt.
    np.testing.assert_allclose(
        np.asarray(q_off - res.pos), np.asarray(res.mu) * 0.1, rtol=1e-6, atol=1e-12
    )


def test_projection_solver_reports_divergence(rng):
    base = make_system()
    system, q0, x_obs_seq = on_manifold_point(base, rng)
    jac = system.jacob_constr_blocks(q0, x_obs_seq, 0)
    chol = system.chol_gram_blocks(jac)
    # A far-away point with a tiny iteration budget must report failure, not
    # raise: failure is data for masked rejection under vmap.
    q_far = q0 + 50.0 * jnp.asarray(rng.standard_normal(q0.shape[0]))
    res = system.quasi_newton_projection(
        q_far, x_obs_seq, jac, chol, dt=0.1, max_iters=3
    )
    assert not bool(res.converged)


def test_hybrid_projection_matches_newton_point(rng):
    """All solvers find the same (locally unique) point on the manifold.

    The RATTLE solution of ``c(q + M^-1 dc(q0)^T lam) = 0`` is locally
    unique, so a converged hybrid solve must land where the full Newton
    solve lands, to solver tolerance."""
    base = make_system()
    system, q0, x_obs_seq = on_manifold_point(base, rng)
    jac = system.jacob_constr_blocks(q0, x_obs_seq, 0)
    q_off = q0 + 5e-3 * jnp.asarray(rng.standard_normal(q0.shape[0]))
    kw = dict(dt=0.1, constraint_tol=1e-11, position_tol=1e-10)
    res_n = system.newton_projection(q_off, x_obs_seq, jac, **kw)
    res_h = system.hybrid_projection(q_off, x_obs_seq, jac, **kw)
    assert bool(res_n.converged) and bool(res_h.converged)
    np.testing.assert_allclose(res_h.pos, res_n.pos, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_h.mu, res_n.mu, rtol=1e-6, atol=1e-8)
    # The hybrid's frozen-Jacobian rounds must not inflate the iteration
    # count past the quasi-Newton solve it is meant to beat.
    assert int(res_h.iters) <= 50


def test_hybrid_projection_vmapped_masked_failure(rng):
    """Far-away chains report failure as data; near chains still converge."""
    base = make_system()
    system, q0, x_obs_seq = on_manifold_point(base, rng)
    jac = system.jacob_constr_blocks(q0, x_obs_seq, 0)
    q_near = q0 + 1e-3 * jnp.asarray(rng.standard_normal(q0.shape[0]))
    q_far = q0 + 50.0 * jnp.asarray(rng.standard_normal(q0.shape[0]))
    qs = jnp.stack([q_near, q_far])

    def solve(qq):
        return system.hybrid_projection(
            qq, x_obs_seq, jac, dt=0.1, max_iters=8,
            constraint_tol=1e-10, position_tol=1e-9,
        )

    res = jax.vmap(solve)(qs)
    assert bool(res.converged[0])
    assert not bool(res.converged[1])
    # Iteration accounting stays within the cap for both chains.
    assert int(res.iters.max()) <= 8 + 3  # cap + at most one trailing round


def test_h2_flow_and_splittings(rng):
    system = make_system()
    q = jnp.asarray(rng.standard_normal(system.layout.dim_q))
    p = jnp.asarray(rng.standard_normal(system.layout.dim_q))
    metric = IdentityMetric()
    q1, p1 = system.h2_flow(q, p, 0.3, metric)
    np.testing.assert_allclose(q1, q + 0.3 * p, rtol=1e-12)
    np.testing.assert_allclose(p1, p, rtol=1e-12)

    gsys = make_system()
    gsys.use_gaussian_splitting = True
    q2, p2 = gsys.h2_flow(q, p, 0.3, metric)
    # Rotation preserves the h2 = (|q|^2 + |p|^2)/2 energy exactly.
    np.testing.assert_allclose(
        q2 @ q2 + p2 @ p2, q @ q + p @ p, rtol=1e-12
    )


def test_unrolled_smallchol_gram_path_on_cpu(rng, monkeypatch):
    """MMT_SMALLCHOL=on forces the production accelerator dispatch (unrolled
    tiny-matrix Cholesky/solves) so CPU CI integration-tests it through the
    full Gram / log-det / projection pipeline, not just the smallchol
    micro-oracles (advisor finding: backend-keyed dispatch was otherwise
    never exercised off-TPU)."""
    system = make_system()
    q, x_obs_seq = random_point(system, rng)

    def pipeline():
        jac = system.jacob_constr_blocks(q, x_obs_seq, 0)
        chol = system.chol_gram_blocks(jac)
        (val, _), grad = system.grad_log_det_sqrt_gram(q, x_obs_seq, partition=0)
        res = system.quasi_newton_projection(
            q, x_obs_seq, jac, chol, 1.0, constraint_tol=1e-9
        )
        return val, grad, res.pos, res.converged

    monkeypatch.setenv("MMT_SMALLCHOL", "off")
    jax.clear_caches()
    val_lib, grad_lib, pos_lib, ok_lib = pipeline()
    monkeypatch.setenv("MMT_SMALLCHOL", "on")
    jax.clear_caches()
    val_unr, grad_unr, pos_unr, ok_unr = pipeline()
    jax.clear_caches()

    np.testing.assert_allclose(float(val_unr), float(val_lib), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(grad_unr), np.asarray(grad_lib), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(pos_unr), np.asarray(pos_lib), rtol=1e-7, atol=1e-9
    )
    assert bool(ok_unr) == bool(ok_lib)
