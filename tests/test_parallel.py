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
