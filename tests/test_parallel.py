"""Sharded multi-device sampling tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.parallel.mesh import (
    chain_sharding,
    make_chain_mesh,
    shard_chain_inputs,
)


def test_mesh_and_sharding_helpers():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_chain_mesh()
    assert mesh.devices.size == 8
    x = jnp.zeros((16, 4))
    x_sharded = shard_chain_inputs(mesh, x)
    assert x_sharded.sharding.is_equivalent_to(chain_sharding(mesh, 2), 2)
    with pytest.raises(ValueError):
        shard_chain_inputs(mesh, jnp.zeros((5, 3)))


def test_sharded_chmc_transition_matches_single_device(rng):
    """Fast-tier GSPMD equality gate (round-3 verdict item 10): one jitted
    CHMC sub-iteration -- the exact transition both drivers wrap
    (``_chmc_sweep_fns``: momentum resample, dynamic-multinomial tree with
    projection solves + reversibility checks, x_obs refresh) -- must agree
    between an unsharded chain batch and the same batch sharded across the
    8-device mesh.  Compiles one small program twice (seconds), unlike the
    full-driver test below (minutes, slow tier).

    Equality is to 1e-12 on positions and continuous stats and EXACT on
    integer/boolean stats: per-shard XLA compilation (batch 1 per device vs
    batch 8 on one) rounds batched linear algebra 1-2 ulp differently
    (measured), so bitwise equality across shard sizes is unattainable; a
    single transition bounds the chaotic amplification so 1e-12 is a real
    gate (any sharding bug -- permuted chains, wrong collective, dropped
    shard -- fails it by many orders of magnitude).
    """
    from manifold_mcmc_tpu.samplers.chains import _chmc_sweep_fns, _split_keys
    from manifold_mcmc_tpu.systems.metrics import IdentityMetric
    from test_samplers import analytic_conditional, build_linear_system

    y_seq = jnp.asarray(rng.standard_normal((4, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    num_chains = 8
    _, _, q_star = analytic_conditional(y_seq)
    q_init = jnp.tile(jnp.asarray(q_star)[None], (num_chains, 1))
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)

    fns = _chmc_sweep_fns(
        system,
        IdentityMetric(),
        dict(
            projection_solver="newton",
            n_inner_step=1,
            reverse_check_tol=2e-8,
            constraint_tol=1e-9,
            position_tol=1e-8,
            divergence_tol=1e10,
            max_iters=50,
        ),
        max_tree_depth=2,
        max_delta_h=1000.0,
        adapt_stat_target=0.8,
        step_size_reg_coefficient=0.05,
        trace_func=lambda q: {},
    )

    @jax.jit
    def one_transition(q, x_obs):
        keys = _split_keys(jax.random.PRNGKey(3), num_chains)
        step = jnp.asarray(0.1, q.dtype)
        return jax.vmap(
            lambda q1, x1, k1: fns["sub_iteration"](q1, x1, 0, k1, step)
        )(q, x_obs, keys)

    plain = one_transition(q_init, x_obs_init)

    mesh = make_chain_mesh()
    q_sh, x_sh = shard_chain_inputs(mesh, q_init, x_obs_init)
    sharded = one_transition(q_sh, x_sh)

    for a, b in zip(
        jax.tree_util.tree_leaves(plain), jax.tree_util.tree_leaves(sharded)
    ):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.inexact):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)
    # The sharded outputs really were distributed across the mesh.
    assert len(sharded[0].sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_chmc_matches_single_device(rng):
    # The jitted sampler must partition over the chain mesh under GSPMD and
    # produce bitwise-identical results to the unsharded run (pure data
    # parallelism; the only cross-chain op is the step-size mean).
    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains
    from test_samplers import build_linear_system

    y_seq = jnp.asarray(rng.standard_normal((4, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    num_chains = 8
    # On-manifold init via the full (unblocked) constraint least squares.
    from test_samplers import analytic_conditional

    _, _, q_star = analytic_conditional(y_seq)
    q_init = jnp.tile(jnp.asarray(q_star)[None], (num_chains, 1))
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)

    def run(q0, x0):
        return sample_chmc_chains(
            system,
            q0,
            x0,
            jax.random.PRNGKey(0),
            num_warm_up_iter=4,
            num_main_iter=6,
            max_tree_depth=3,
            trace_func=lambda q: {"pos0": q[0]},
        )

    plain = run(q_init, x_obs_init)

    mesh = make_chain_mesh()
    q_sh, x_sh = shard_chain_inputs(mesh, q_init, x_obs_init)
    sharded = run(q_sh, x_sh)

    np.testing.assert_allclose(
        np.asarray(plain["final_pos"]), np.asarray(sharded["final_pos"]), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(plain["final_step_size"]), float(sharded["final_step_size"]), rtol=1e-10
    )
    # The sharded result actually lives across devices.
    assert len(sharded["final_pos"].sharding.device_set) == 8


def test_sharded_welford_merge_matches_single_device(rng):
    """The cross-chain Welford merge (``welford_merge_chains``, the adapter
    path's only collective -- it lowers to an all-reduce over the mesh) must
    produce the same pooled statistics and finalized metric whether the
    per-chain states live on one device or sharded across 8.

    (End-state comparison of a full adaptive HMC run is NOT a valid test
    here: the sharded reduction may sum in a different order, and a 1-ulp
    difference amplifies exponentially through the chaotic dynamics.)
    """
    from manifold_mcmc_tpu.samplers import adapters as ad

    num_chains, n_draws, dim = 8, 50, 6
    draws = jnp.asarray(rng.standard_normal((num_chains, n_draws, dim)))

    @jax.jit
    def pooled_metric(draws):
        def per_chain(xs):
            def upd(wf, x):
                return ad.welford_update(wf, x), None

            wf0 = ad.welford_init(dim, draws.dtype, diagonal=True)
            return jax.lax.scan(upd, wf0, xs)[0]

        wf = jax.vmap(per_chain)(draws)
        merged = ad.welford_merge_chains(wf)
        return merged, ad.finalize_variance_metric(merged).diag

    plain_merged, plain_diag = pooled_metric(draws)
    mesh = make_chain_mesh()
    sh_merged, sh_diag = pooled_metric(shard_chain_inputs(mesh, draws))

    for a, b in zip(
        jax.tree_util.tree_leaves(plain_merged),
        jax.tree_util.tree_leaves(sh_merged),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(plain_diag), np.asarray(sh_diag), rtol=1e-12
    )
    # The merge's inputs really were distributed.
    assert len(shard_chain_inputs(mesh, draws).sharding.device_set) == 8
