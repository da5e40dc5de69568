"""Statistical correctness tests for the samplers.

The key gate is the linear-Gaussian manifold fixture (SURVEY.md section 4):
for a linear SDE with noiseless linear observations the constraint is affine,
so the posterior is a standard normal conditioned on an affine subspace whose
moments are known in closed form -- CHMC must reproduce them.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.samplers.chains import (
    sample_chmc_chains,
    sample_hmc_chains,
    stan_windows,
)
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.systems.euclidean import EuclideanSystem


# --------------------------------------------------------------------- #
# linear-Gaussian diffusion fixture with analytic posterior              #
# --------------------------------------------------------------------- #

ALPHA, BETA = -0.5, 0.8  # dx = alpha x dt + beta dW


def lin_forward(z, x, v, dt):
    return x + dt * ALPHA * x + jnp.sqrt(dt) * BETA * v


def lin_generate_z(u):
    return u


def lin_generate_x_0(z, v_0):
    return 2.0 * v_0


def lin_obs(x_seq):
    return x_seq[..., 0:1]


def build_linear_system(y_seq, num_obs_per_subseq, use_gaussian_splitting=False):
    return ConditionedDiffusionConstrainedSystem(
        obs_interval=0.5,
        num_steps_per_obs=2,
        num_obs_per_subseq=num_obs_per_subseq,
        y_seq=y_seq,
        dim_u=1,
        dim_x=1,
        dim_v=1,
        forward_func=lin_forward,
        generate_x_0=lin_generate_x_0,
        generate_z=lin_generate_z,
        obs_func=lin_obs,
        dim_v_0=1,
        use_gaussian_splitting=use_gaussian_splitting,
    )


def analytic_conditional(y_seq):
    """Mean/cov of N(0, I) conditioned on the *full* observation constraint.

    The invariant distribution of the blocked sampler is the posterior on the
    full manifold {obs(path(q)) = y at every observation time} -- the blocked
    constraints at chain-consistent ``x_obs`` reproduce it through the
    maintained invariant ``obs(x_obs) = y``.  For the linear model the full
    constraint is affine, extracted from the unblocked system.
    """
    full = build_linear_system(y_seq, None)
    dim_q = full.layout.dim_q
    q0 = jnp.zeros(dim_q)
    x_obs0 = full.generate_x_obs_seq(q0)
    # c(q) = C q - d is affine: extract C by jacrev and d from c(0).
    C = np.asarray(jax.jacrev(lambda q: full.constr(q, x_obs0, 0))(q0))
    c0 = np.asarray(full.constr(q0, x_obs0, 0))
    q_star = np.linalg.lstsq(C, -c0, rcond=None)[0]
    cov = np.eye(dim_q) - C.T @ np.linalg.solve(C @ C.T, C)
    mean = C.T @ np.linalg.solve(C @ C.T, C @ q_star)
    return mean, cov, q_star


@pytest.mark.parametrize(
    "blocking,gaussian",
    [(None, False), (2, False), (2, True)],
    ids=["unblocked", "blocked", "blocked-gaussian-splitting"],
)
@pytest.mark.slow
def test_chmc_matches_analytic_gaussian_manifold(rng, blocking, gaussian):
    """The Gaussian-splitting case exercises the rotation h2-flow + the
    sin(dt)-rescaled projection end-to-end (reference
    ``sde/mici_extensions.py:1060-1063``): both splittings must leave the
    same manifold-conditioned standard normal invariant."""
    num_obs = 4
    y_seq = jnp.asarray(rng.standard_normal((num_obs, 1)) * 0.7)
    system = build_linear_system(y_seq, blocking, use_gaussian_splitting=gaussian)
    mean, cov, q_star = analytic_conditional(y_seq)

    # NOTE: for the affine constraint the blocked constraint at consistent
    # x_obs differs from the unblocked one but defines the same manifold.
    num_chains = 8
    q_init = jnp.broadcast_to(jnp.asarray(q_star), (num_chains, len(q_star)))
    q_init = q_init + 0.0  # copy
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)
    # Confirm the starting point is on the manifold.
    c0 = jax.vmap(lambda q, x: system.constr(q, x, 0))(q_init, x_obs_init)
    assert float(jnp.abs(c0).max()) < 1e-8

    result = sample_chmc_chains(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(0),
        num_warm_up_iter=100,
        num_main_iter=400,
        max_tree_depth=6,
        constraint_tol=1e-10,
        position_tol=1e-9,
        trace_func=lambda q: {"pos": q},
    )
    samples = np.asarray(result["traces"]["pos"]).reshape(-1, len(q_star))
    n_eff_guess = samples.shape[0] / 4  # conservative autocorrelation factor

    # Marginal means and variances against the analytic conditional.
    se_mean = float(np.sqrt(np.diag(cov) / n_eff_guess).max())
    np.testing.assert_allclose(
        samples.mean(0), mean, atol=5 * se_mean + 1e-3
    )
    np.testing.assert_allclose(
        samples.var(0), np.diag(cov), rtol=0.35, atol=0.02
    )
    # Acceptance adapted near target.  Under Gaussian splitting the rotation
    # flow is exact on this purely Gaussian fixture, so the energy error is
    # ~0 and accept == 1 at any step size; only standard splitting has a
    # step-size/accept trade-off for dual averaging to balance.
    acc = np.asarray(result["stats"]["accept_stat"])
    if gaussian:
        assert acc.mean() > 0.99
    else:
        assert 0.55 < acc.mean() < 0.99
    # Every sample stays on the manifold (spot check the last iterate).
    c_final = jax.vmap(lambda q, x: system.constr(q, x, 0))(
        result["final_pos"], jax.vmap(system.generate_x_obs_seq)(result["final_pos"])
    )
    assert float(jnp.abs(c_final).max()) < 1e-7


def banana_free_nld(q):
    # Anisotropic Gaussian with known covariance for HMC moment checks.
    scales = jnp.asarray([1.0, 2.0, 0.5, 1.5])
    return 0.5 * jnp.sum((q / scales) ** 2)


@pytest.mark.parametrize("metric_type", ["identity", "diagonal"])
@pytest.mark.slow
def test_hmc_gaussian_moments(metric_type):
    system = EuclideanSystem(banana_free_nld)
    num_chains, dim = 8, 4
    init = jax.random.normal(jax.random.PRNGKey(1), (num_chains, dim))
    result = sample_hmc_chains(
        system,
        init,
        jax.random.PRNGKey(2),
        num_warm_up_iter=150,
        num_main_iter=500,
        metric_type=metric_type,
        trace_func=lambda q: {"pos": q},
        max_tree_depth=8,
    )
    samples = np.asarray(result["traces"]["pos"]).reshape(-1, dim)
    target_var = np.array([1.0, 4.0, 0.25, 2.25])
    np.testing.assert_allclose(samples.mean(0), 0.0, atol=0.25)
    np.testing.assert_allclose(samples.var(0), target_var, rtol=0.3)
    acc = np.asarray(result["stats"]["accept_stat"])
    assert 0.55 < acc.mean() < 0.99
    assert float(result["final_step_size"]) > 0


@pytest.mark.parametrize("metric_type", ["identity", "diagonal"])
def test_hmc_host_loop_matches_ingraph_driver(metric_type):
    """The HMC host-loop and in-graph drivers share the per-chain iteration
    and (since the host loop gained the same search stage) the step-size
    search's RNG stream, so identical inputs must give identical chains --
    both with and without a metric adapter (Welford windows + merges)."""
    from manifold_mcmc_tpu.samplers.chains import sample_hmc_chains_host_loop

    system = EuclideanSystem(banana_free_nld)
    num_chains, dim = 3, 4
    init = jax.random.normal(jax.random.PRNGKey(5), (num_chains, dim))
    kwargs = dict(
        num_warm_up_iter=40,
        num_main_iter=12,
        max_tree_depth=4,
        metric_type=metric_type,
        init_step_size=0.7,
        trace_func=lambda q: {"pos": q},
    )
    r_graph = sample_hmc_chains(
        system, init, jax.random.PRNGKey(9), **kwargs
    )
    r_host = sample_hmc_chains_host_loop(
        system, init, jax.random.PRNGKey(9), **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(r_graph["final_pos"]),
        np.asarray(r_host["final_pos"]),
        rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(r_graph["traces"]["pos"]),
        np.asarray(r_host["traces"]["pos"]),
        rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        float(r_graph["final_step_size"]),
        float(r_host["final_step_size"]),
        rtol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(r_graph["stats"]["n_step"]),
        np.asarray(r_host["stats"]["n_step"]),
    )


@pytest.mark.parametrize("budget", [1, 3, 1000])
def test_nuts_chunked_matches_single_shot(budget):
    """The resumable chunked tree expansion consumes the identical RNG
    stream and executes identical per-leaf floating-point operations, so
    chunk_init + repeated chunk_expand + chunk_finalize must reproduce
    ``dynamic_multinomial_hmc`` bitwise for any step budget."""
    from manifold_mcmc_tpu.samplers.hmc import (
        dynamic_multinomial_hmc,
        nuts_chunk_expand,
        nuts_chunk_finalize,
        nuts_chunk_init,
    )
    from manifold_mcmc_tpu.samplers.integrators import make_leapfrog_integrator
    from manifold_mcmc_tpu.systems.metrics import IdentityMetric

    system = EuclideanSystem(banana_free_nld)
    integ = make_leapfrog_integrator(system)
    metric = IdentityMetric()
    max_tree_depth, max_delta_h = 6, 1000.0

    @jax.jit
    def single(q, key, eps):
        k_mom, k_tree = jax.random.split(key)
        point = integ.init(q, jnp.zeros_like(q), metric)
        point = point._replace(mom=integ.sample_momentum(k_mom, point, metric))
        return dynamic_multinomial_hmc(
            integ, metric, point, k_tree, eps, max_tree_depth, max_delta_h
        )

    @jax.jit
    def chunk_start(q, key):
        k_mom, k_tree = jax.random.split(key)
        point = integ.init(q, jnp.zeros_like(q), metric)
        point = point._replace(mom=integ.sample_momentum(k_mom, point, metric))
        return nuts_chunk_init(integ, metric, point, k_tree, max_tree_depth)

    @jax.jit
    def chunk_step(carry, eps):
        return nuts_chunk_expand(
            integ, metric, carry, eps, budget, max_tree_depth, max_delta_h
        )

    for seed, eps in [(0, 0.3), (1, 0.9), (2, 2.5), (3, 0.05)]:
        key = jax.random.PRNGKey(seed)
        q = jax.random.normal(jax.random.fold_in(key, 99), (4,))
        pos_s, mom_s, stats_s = single(q, key, eps)
        carry = chunk_start(q, key)
        for _ in range(10000):
            if bool(carry.done):
                break
            carry = chunk_step(carry, eps)
        assert bool(carry.done)
        pos_c, mom_c, stats_c = nuts_chunk_finalize(carry)
        # Equality up to cross-program compilation differences: the two
        # drivers execute the same op sequence but XLA may reassociate tiny
        # reductions (e.g. the energy dot product) differently per program,
        # so float stats can differ in the last ulp.
        np.testing.assert_allclose(
            np.asarray(pos_s), np.asarray(pos_c), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(mom_s), np.asarray(mom_c), rtol=1e-12, atol=1e-12
        )
        for k in stats_s:
            a, c = np.asarray(stats_s[k]), np.asarray(stats_c[k])
            if a.dtype.kind == "f":
                np.testing.assert_allclose(a, c, rtol=1e-12, err_msg=k)
            else:
                np.testing.assert_array_equal(a, c, err_msg=k)


def test_hmc_host_loop_chunked_matches_unchunked():
    """``max_steps_per_dispatch`` changes only the dispatch granularity:
    traces, final state and statistics must be identical."""
    from manifold_mcmc_tpu.samplers.chains import sample_hmc_chains_host_loop

    system = EuclideanSystem(banana_free_nld)
    num_chains, dim = 3, 4
    init = jax.random.normal(jax.random.PRNGKey(5), (num_chains, dim))
    kwargs = dict(
        num_warm_up_iter=25,
        num_main_iter=10,
        max_tree_depth=4,
        metric_type="diagonal",
        init_step_size=0.7,
        trace_func=lambda q: {"pos": q},
    )
    r_ref = sample_hmc_chains_host_loop(
        system, init, jax.random.PRNGKey(9), **kwargs
    )
    r_chunk = sample_hmc_chains_host_loop(
        system, init, jax.random.PRNGKey(9), max_steps_per_dispatch=5, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(r_ref["final_pos"]),
        np.asarray(r_chunk["final_pos"]),
        rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(r_ref["traces"]["pos"]),
        np.asarray(r_chunk["traces"]["pos"]),
        rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(r_ref["stats"]["n_step"]),
        np.asarray(r_chunk["stats"]["n_step"]),
    )
    np.testing.assert_allclose(
        float(r_ref["final_step_size"]),
        float(r_chunk["final_step_size"]),
        rtol=1e-12,
    )


@pytest.mark.parametrize("cut", ["main", "warm"])
def test_hmc_host_loop_checkpoint_resume(cut, tmp_path):
    """An HMC host-loop run interrupted mid-phase and resumed from its
    checkpoint must produce bitwise-identical chains to an uninterrupted
    run.  ``cut='main'``: the first process completes warm-up plus part of
    the main phase; ``cut='warm'``: it completes exactly the warm-up
    (exercising metric/Welford/dual-averaging serialisation with the
    diagonal adapter)."""
    from manifold_mcmc_tpu.samplers.chains import sample_hmc_chains_host_loop

    system = EuclideanSystem(banana_free_nld)
    num_chains, dim = 3, 4
    init = jax.random.normal(jax.random.PRNGKey(5), (num_chains, dim))
    kwargs = dict(
        num_warm_up_iter=40,
        max_tree_depth=4,
        metric_type="diagonal",
        init_step_size=0.7,
        trace_func=lambda q: {"pos": q},
    )
    full = sample_hmc_chains_host_loop(
        system, init, jax.random.PRNGKey(9), num_main_iter=12, **kwargs
    )
    ck = str(tmp_path / "hmc_ck.npz")
    # First process: same warm-up schedule, interrupted after ``n_first``
    # main iterations (0 = interrupted right at the end of warm-up).
    n_first = 6 if cut == "main" else 0
    sample_hmc_chains_host_loop(
        system,
        init,
        jax.random.PRNGKey(9),
        num_main_iter=n_first,
        checkpoint_path=ck,
        checkpoint_every=3,
        **kwargs,
    )
    assert os.path.exists(ck)
    resumed = sample_hmc_chains_host_loop(
        system,
        init,
        jax.random.PRNGKey(9),
        num_main_iter=12,
        checkpoint_path=ck,
        checkpoint_every=3,
        **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(full["traces"]["pos"]), np.asarray(resumed["traces"]["pos"])
    )
    np.testing.assert_array_equal(
        np.asarray(full["final_pos"]), np.asarray(resumed["final_pos"])
    )
    assert float(full["final_step_size"]) == float(resumed["final_step_size"])
    np.testing.assert_array_equal(
        np.asarray(full["stats"]["n_step"]),
        np.asarray(resumed["stats"]["n_step"]),
    )


def test_dual_averaging_finalize_unupdated():
    """With zero updates, finalize must return the initial step size (the
    host-loop resume path relies on this)."""
    from manifold_mcmc_tpu.samplers import adapters as ad

    da = jax.vmap(ad.dual_averaging_init)(jnp.full((3,), 0.37))
    assert np.isclose(float(ad.dual_averaging_finalize(da)), 0.37)


@pytest.mark.slow
def test_host_loop_matches_ingraph_driver(rng):
    """The host-loop and in-graph CHMC drivers wrap the same sweep bodies
    with the same key-splitting, so given identical inputs (and no in-graph
    step-size search) they must produce identical chains."""
    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains_host_loop

    num_obs = 4
    y_seq = jnp.asarray(rng.standard_normal((num_obs, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    _, _, q_star = analytic_conditional(y_seq)
    num_chains = 3
    q_init = jnp.broadcast_to(jnp.asarray(q_star), (num_chains, len(q_star))) + 0.0
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)

    kwargs = dict(
        num_warm_up_iter=6,
        num_main_iter=8,
        max_tree_depth=3,
        init_step_size=0.4,
        trace_func=lambda q: {"pos_head": q[:2]},
    )
    r_graph = sample_chmc_chains(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(7),
        find_init_step_size=False,
        **kwargs,
    )
    r_host = sample_chmc_chains_host_loop(
        system, q_init, x_obs_init, jax.random.PRNGKey(7), **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(r_graph["final_pos"]), np.asarray(r_host["final_pos"]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(r_graph["traces"]["pos_head"]),
        np.asarray(r_host["traces"]["pos_head"]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(r_graph["final_step_size"]), float(r_host["final_step_size"]),
        rtol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(r_graph["stats"]["n_step"]), np.asarray(r_host["stats"]["n_step"])
    )
    # Host loop reports per-sweep timings.
    assert len(r_host["timings"]["main_sweep_s"]) == 4


def test_chmc_host_loop_chunked_matches_unchunked(rng):
    """``max_steps_per_dispatch`` on the CHMC host loop changes only the
    dispatch granularity: the resumable chunked tree consumes the identical
    RNG stream with the constrained (RATTLE) integrator, so traces, final
    state, adapted step size and tree statistics must be identical."""
    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains_host_loop

    num_obs = 4
    y_seq = jnp.asarray(rng.standard_normal((num_obs, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    _, _, q_star = analytic_conditional(y_seq)
    num_chains = 3
    q_init = jnp.broadcast_to(jnp.asarray(q_star), (num_chains, len(q_star))) + 0.0
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)

    kwargs = dict(
        num_warm_up_iter=6,
        num_main_iter=8,
        max_tree_depth=3,
        init_step_size=0.4,
        trace_func=lambda q: {"pos_head": q[:2]},
    )
    r_ref = sample_chmc_chains_host_loop(
        system, q_init, x_obs_init, jax.random.PRNGKey(7), **kwargs
    )
    r_chunk = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(7),
        max_steps_per_dispatch=3,
        **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(r_ref["final_pos"]), np.asarray(r_chunk["final_pos"]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(r_ref["traces"]["pos_head"]),
        np.asarray(r_chunk["traces"]["pos_head"]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(r_ref["final_step_size"]), float(r_chunk["final_step_size"]),
        rtol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(r_ref["stats"]["n_step"]),
        np.asarray(r_chunk["stats"]["n_step"]),
    )


def test_chmc_host_loop_pooled_step_adaptation(rng):
    """``pooled_step_adaptation=True`` dual-averages one shared step from the
    fleet-pooled accept statistic.  Invariants: (a) chunked and unchunked
    dispatch produce identical results in pooled mode too (same RNG stream);
    (b) the pooled run adapts to a finite positive step; (c) pooled and
    per-chain adaptation genuinely differ (different update statistic) while
    consuming the same trajectory RNG."""
    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains_host_loop

    num_obs = 4
    y_seq = jnp.asarray(rng.standard_normal((num_obs, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    _, _, q_star = analytic_conditional(y_seq)
    num_chains = 4
    q_init = jnp.broadcast_to(jnp.asarray(q_star), (num_chains, len(q_star))) + 0.0
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)

    kwargs = dict(
        num_warm_up_iter=6,
        num_main_iter=4,
        max_tree_depth=3,
        init_step_size=0.4,
        step_size_cliff_safety=None,
    )
    r_pooled = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(7),
        pooled_step_adaptation=True,
        **kwargs,
    )
    r_pooled_chunked = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(7),
        pooled_step_adaptation=True,
        max_steps_per_dispatch=3,
        **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(r_pooled["final_pos"]),
        np.asarray(r_pooled_chunked["final_pos"]),
        rtol=1e-12,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        float(r_pooled["final_step_size"]),
        float(r_pooled_chunked["final_step_size"]),
        rtol=1e-12,
    )
    eps = float(r_pooled["final_step_size"])
    assert np.isfinite(eps) and eps > 0
    r_perchain = sample_chmc_chains_host_loop(
        system, q_init, x_obs_init, jax.random.PRNGKey(7), **kwargs
    )
    # Same warm-up trajectories start identically but per-chain DA steps
    # diverge from the shared pooled step after the first update; the final
    # smoothed averages must therefore differ (different statistic).
    assert float(r_perchain["final_step_size"]) != pytest.approx(eps, rel=1e-9)


@pytest.mark.slow
def test_host_loop_checkpoint_resume(rng, tmp_path):
    """Killing the host loop mid-run and resuming from its .npz checkpoint
    must reproduce the uninterrupted run exactly (including accumulated
    traces, which are stored as plain arrays, not pickled objects)."""
    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains_host_loop

    y_seq = jnp.asarray(rng.standard_normal((4, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    _, _, q_star = analytic_conditional(y_seq)
    q_init = jnp.broadcast_to(jnp.asarray(q_star), (2, len(q_star))) + 0.0
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)
    kwargs = dict(
        num_warm_up_iter=4,
        num_main_iter=8,
        max_tree_depth=3,
        init_step_size=0.4,
        trace_func=lambda q: {"pos_head": q[:2]},
    )

    full = sample_chmc_chains_host_loop(
        system, q_init, x_obs_init, jax.random.PRNGKey(9), **kwargs
    )

    # Interrupted run: checkpoint every sweep, stop after 2 main sweeps
    # (2 warm + 4 main sweeps total; cut at sweep 4).
    ckpt = str(tmp_path / "hl.npz")
    sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(9),
        checkpoint_path=ckpt,
        checkpoint_every=1,
        **{**kwargs, "num_main_iter": 4},
    )
    import numpy as onp

    with onp.load(ckpt) as ck:
        assert int(ck["sweep"]) == 4
        # No object arrays in the checkpoint.
        assert all(ck[k].dtype != object for k in ck.files)
        # Self-describing timing for checkpoint-only salvage (bench.py
        # watchdog): per-sweep wall times minus each process's first sweep
        # (2 main sweeps ran here, the first pays compile and is excluded).
        assert ck["clean_main_times"].shape == (1,)
        assert float(ck["clean_main_times"][0]) > 0
        assert ck["clean_warm_times"].shape == (1,)

    resumed = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(9),
        checkpoint_path=ckpt,
        checkpoint_every=1,
        **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(full["final_pos"]), np.asarray(resumed["final_pos"])
    )
    np.testing.assert_allclose(
        np.asarray(full["traces"]["pos_head"]),
        np.asarray(resumed["traces"]["pos_head"]),
        rtol=0,
        atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(full["stats"]["n_step"]), np.asarray(resumed["stats"]["n_step"])
    )


def test_stan_windows_partition():
    init, slow, term = stan_windows(1000)
    assert init == 75 and term == 50
    assert sum(slow) == 1000 - 75 - 50
    assert all(b > 0 for b in slow)
    # Short warm-up degrades gracefully.
    init, slow, term = stan_windows(60)
    assert init + sum(slow) + term == 60


@pytest.mark.slow
def test_chmc_traces_and_counters(rng):
    from manifold_mcmc_tpu.models import fhn

    num_obs, S = 6, 3
    q0 = jnp.asarray(rng.standard_normal((2, 4 + 2 + num_obs * S * 2)) * 0.4)
    probe = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=2,
        y_seq=jnp.zeros((num_obs, 1)),
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        dim_v_0=fhn.dim_v_0,
    )
    x_obs = jax.vmap(probe.generate_x_obs_seq)(q0)
    system = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=2,
        y_seq=fhn.obs_func(x_obs[0]),
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        dim_v_0=fhn.dim_v_0,
    )
    # Start chain 0 exactly on the manifold; chain 1 nearby via projection
    # during warm-up (it starts on its own path's manifold = off-manifold for
    # y_seq, so instead reuse chain 0's position for both).
    q_init = jnp.stack([q0[0], q0[0]])
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)

    def trace_func(q):
        z = fhn.generate_z(q[: fhn.dim_z])
        return {"sigma": z[0], "pos_head": q[:2]}

    result = sample_chmc_chains(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(3),
        num_warm_up_iter=10,
        num_main_iter=20,
        max_tree_depth=4,
        trace_func=trace_func,
    )
    tr = result["traces"]
    assert tr["sigma"].shape == (2, 20)
    assert tr["pos_head"].shape == (2, 20, 2)
    # Counters are cumulative and increasing.
    calls = np.asarray(tr["grad_log_det_sqrt_gram_calls"])
    assert np.all(np.diff(calls, axis=1) >= 0)
    assert calls[:, -1].min() > 0
    assert np.asarray(tr["constr_calls"])[:, -1].min() > 0
    st = result["stats"]
    assert st["n_step"].shape == (2, 20)
    assert np.asarray(st["hamiltonian"]).dtype.kind == "f"
    assert np.all(np.isfinite(np.asarray(st["hamiltonian"])))
    # The two integrator failure modes are reported under separate keys
    # (Mici's convergence_error / non_reversible_step statistic split) and
    # are mutually exclusive by construction.
    conv = np.asarray(st["convergence_error"])
    nonrev = np.asarray(st["non_reversible_step"])
    assert conv.shape == nonrev.shape == (2, 20)
    assert conv.dtype == nonrev.dtype == np.bool_
    assert not np.any(conv & nonrev)


def test_concat_sweep_chunks_unions_keys_across_schema_change():
    """A checkpoint written before a statistic existed must resume cleanly:
    the old chunk's missing key is zero-filled at its own sweep length."""
    from manifold_mcmc_tpu.samplers.chains import _concat_sweep_chunks

    old = {"accept_stat": np.full((3, 4), 0.5, np.float32)}
    new = {
        "accept_stat": np.full((3, 2), 0.25, np.float32),
        "non_reversible_step": np.ones((3, 2), np.bool_),
    }
    merged = _concat_sweep_chunks([old, new])
    assert merged["accept_stat"].shape == (3, 6)
    assert merged["non_reversible_step"].shape == (3, 6)
    assert merged["non_reversible_step"].dtype == np.bool_
    assert not merged["non_reversible_step"][:, :4].any()
    assert merged["non_reversible_step"][:, 4:].all()
    # Order-independence of the template: new-first also works.
    merged2 = _concat_sweep_chunks([new, old])
    assert merged2["non_reversible_step"].shape == (3, 6)
    assert merged2["non_reversible_step"][:, :2].all()
    assert not merged2["non_reversible_step"][:, 2:].any()


def test_host_loop_deadline_partial_and_resume(rng, tmp_path):
    """With an already-expired deadline the host loop must stop BEFORE
    dispatching work, checkpoint its (empty) progress, and flag
    ``deadline_hit``; a later call with the same checkpoint and no deadline
    must complete and reproduce the uninterrupted run exactly (the bench's
    partial-result / cross-invocation resume contract)."""
    import time

    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains_host_loop

    y_seq = jnp.asarray(rng.standard_normal((4, 1)) * 0.7)
    system = build_linear_system(y_seq, 2)
    _, _, q_star = analytic_conditional(y_seq)
    q_init = jnp.broadcast_to(jnp.asarray(q_star), (2, len(q_star))) + 0.0
    x_obs_init = jax.vmap(system.generate_x_obs_seq)(q_init)
    kwargs = dict(
        num_warm_up_iter=4,
        num_main_iter=6,
        max_tree_depth=3,
        init_step_size=0.4,
        trace_func=lambda q: {"pos_head": q[:2]},
    )

    full = sample_chmc_chains_host_loop(
        system, q_init, x_obs_init, jax.random.PRNGKey(9), **kwargs
    )

    ckpt = str(tmp_path / "deadline.npz")
    cut = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(9),
        checkpoint_path=ckpt,
        deadline_ts=time.time() - 1.0,
        **kwargs,
    )
    assert cut["deadline_hit"]
    assert cut["n_main_sweeps_done"] == 0
    assert os.path.exists(ckpt)

    resumed = sample_chmc_chains_host_loop(
        system,
        q_init,
        x_obs_init,
        jax.random.PRNGKey(9),
        checkpoint_path=ckpt,
        **kwargs,
    )
    assert not resumed["deadline_hit"]
    assert resumed["n_main_sweeps_done"] == resumed["n_main_sweeps"]
    np.testing.assert_allclose(
        np.asarray(full["final_pos"]), np.asarray(resumed["final_pos"]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(full["traces"]["pos_head"]),
        np.asarray(resumed["traces"]["pos_head"]),
        rtol=1e-12, atol=1e-12,
    )


def test_dual_averaging_max_step_clamp():
    """With a max_step_size the proposed step never exceeds it, even under a
    run of full acceptances pushing upward; without one behaviour is
    unchanged (the reference's unbounded dual averaging)."""
    from manifold_mcmc_tpu.samplers import adapters as ad

    da_free = ad.dual_averaging_init(jnp.asarray(0.2))
    da_cap = ad.dual_averaging_init(jnp.asarray(0.2), jnp.asarray(0.5))
    assert float(da_cap.mu) == pytest.approx(np.log(0.5))
    for _ in range(50):
        da_free = ad.dual_averaging_update(da_free, jnp.asarray(1.0))
        da_cap = ad.dual_averaging_update(da_cap, jnp.asarray(1.0))
    assert float(jnp.exp(da_free.log_step)) > 0.5  # explores above unclamped
    assert float(jnp.exp(da_cap.log_step)) <= 0.5 + 1e-6
    assert float(ad.dual_averaging_finalize(da_cap)) <= 0.5 + 1e-6
    # window-reset style re-init keeps the ceiling
    da_reset = ad.dual_averaging_init(
        jnp.exp(da_cap.log_step_bar), jnp.exp(da_cap.log_step_max)
    )
    assert float(da_reset.log_step_max) == pytest.approx(np.log(0.5))


def test_find_step_size_cliff_bidirectional():
    """The cliff probe returns a succeeding step size within one doubling of
    the true cliff, from starts on either side of it."""
    from manifold_mcmc_tpu.samplers.chains import find_step_size_cliff
    from manifold_mcmc_tpu.samplers.integrators import (
        EuclideanPoint,
        Integrator,
    )

    CLIFF = 0.7

    def step(point, eps, metric):
        ok = eps <= CLIFF
        return point, jnp.asarray(ok), jnp.array(False), jnp.array(0, jnp.int32)

    integ = Integrator(
        init=None, step=step, energy=lambda p, m: 0.0, sample_momentum=None
    )
    point = EuclideanPoint(
        pos=jnp.zeros(2), mom=jnp.zeros(2), nld=0.0, grad_nld=jnp.zeros(2)
    )
    lo = float(find_step_size_cliff(integ, None, point, 0.1))
    assert CLIFF / 2 <= lo <= CLIFF
    hi = float(find_step_size_cliff(integ, None, point, 3.0))
    assert CLIFF / 2 <= hi <= CLIFF
    on = float(find_step_size_cliff(integ, None, point, 0.6))
    assert CLIFF / 2 <= on <= CLIFF


def test_retry_transient_recovers_and_reraises(monkeypatch):
    """Transient backend faults are retried from the unit's (pure) inputs;
    non-transient errors and exhausted retries propagate."""
    from manifold_mcmc_tpu.samplers.chains import retry_transient

    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return jnp.arange(3.0)

    out = retry_transient(flaky, what="test unit", base_delay=0.0)
    assert calls["n"] == 3
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 2.0])

    def always_fails():
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        retry_transient(always_fails, max_tries=2, base_delay=0.0)

    def real_bug():
        raise ValueError("shape mismatch")

    calls["n"] = 0

    def count_real_bug():
        calls["n"] += 1
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        retry_transient(count_real_bug, base_delay=0.0)
    assert calls["n"] == 1  # non-transient: no retry


def test_neg_log_dens_unroll_invariance():
    """The capped-unroll (chunked inner scan) likelihood equals the fully
    unrolled one -- the cap only bounds executable size (chosen so remote
    workers with bounded program memory can load all sampler programs).

    Shapes are tiny (compiling a fully unrolled strong-1.5 graph is
    expensive even on CPU); the chunked path is forced with an explicit
    ``unroll`` below ``num_steps_per_obs``, the same code the auto cap
    selects at the canonical noisy-obs S=40 (divisor 8)."""
    from manifold_mcmc_tpu.models import fhn
    from manifold_mcmc_tpu.systems.euclidean import (
        make_conditioned_diffusion_neg_log_dens,
    )

    rng = np.random.default_rng(3)
    T, S = 5, 6
    y = jnp.asarray(rng.standard_normal((T, 1)))
    kwargs = dict(
        obs_interval=0.2,
        num_steps_per_obs=S,
        y_seq=y,
        dim_u=fhn.dim_z,
        dim_v_0=fhn.dim_v_0,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        generate_sigma=0.1,
        obs_func=fhn.obs_func,
    )
    nld_chunked = make_conditioned_diffusion_neg_log_dens(unroll=2, **kwargs)
    nld_full = make_conditioned_diffusion_neg_log_dens(unroll=S, **kwargs)
    dim_q = fhn.dim_z + fhn.dim_v_0 + T * S * fhn.dim_v
    q = jnp.asarray(rng.standard_normal(dim_q)) * 0.3
    va, ga = jax.value_and_grad(nld_chunked)(q)
    vf, gf = jax.value_and_grad(nld_full)(q)
    np.testing.assert_allclose(float(va), float(vf), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gf), rtol=1e-9)


def test_identity_metric_welford_is_placeholder():
    """With metric_type='identity' neither driver may materialize the (dead)
    Welford covariance: eagerly created per chain it is O(chains * dim_q^2)
    -- 65 GB at the canonical noisy-obs HMC config (256 chains, dim_q 8006).
    Regression test: the threaded state must be the dim-1 placeholder, and
    identity-metric results must be unchanged by it (cross-driver equality
    is covered by test_hmc_host_loop_matches_ingraph_driver)."""
    from manifold_mcmc_tpu.samplers import adapters as ad
    from manifold_mcmc_tpu.samplers.chains import sample_hmc_chains_host_loop

    captured = {}
    orig = ad.welford_init

    def spy(dim, dtype, diagonal=False):
        captured.setdefault("dims", []).append((dim, diagonal))
        return orig(dim, dtype, diagonal=diagonal)

    system = EuclideanSystem(banana_free_nld)
    init = jax.random.normal(jax.random.PRNGKey(3), (2, 4))
    ad_welford_init = ad.welford_init
    try:
        ad.welford_init = spy
        sample_hmc_chains_host_loop(
            system,
            init,
            jax.random.PRNGKey(4),
            num_warm_up_iter=4,
            num_main_iter=2,
            max_tree_depth=3,
            metric_type="identity",
        )
    finally:
        ad.welford_init = ad_welford_init
    assert captured["dims"], "welford_init never called"
    assert all(dim == 1 and diag for dim, diag in captured["dims"]), captured


def test_hmc_host_loop_deadline_partial_and_resume(tmp_path):
    """A deadline in the past stops the HMC host loop at the first live
    iteration with a checkpoint + partial flags; resuming without a deadline
    must reproduce the uninterrupted run bitwise (the CHMC host loop has the
    same contract)."""
    from manifold_mcmc_tpu.samplers.chains import sample_hmc_chains_host_loop

    system = EuclideanSystem(banana_free_nld)
    num_chains, dim = 3, 4
    init = jax.random.normal(jax.random.PRNGKey(7), (num_chains, dim))
    kwargs = dict(
        num_warm_up_iter=10,
        num_main_iter=6,
        max_tree_depth=3,
        metric_type="diagonal",
        init_step_size=0.7,
        trace_func=lambda q: {"pos": q},
    )
    ck = str(tmp_path / "ck.npz")
    r_full = sample_hmc_chains_host_loop(
        system, init, jax.random.PRNGKey(8), **kwargs
    )
    assert not r_full["partial"]
    r_cut = sample_hmc_chains_host_loop(
        system,
        init,
        jax.random.PRNGKey(8),
        checkpoint_path=ck,
        checkpoint_every=1,
        deadline_ts=0.0,
        **kwargs,
    )
    assert r_cut["partial"]
    assert r_cut["num_warm_up_done"] == 0 and r_cut["num_main_done"] == 0
    r_res = sample_hmc_chains_host_loop(
        system,
        init,
        jax.random.PRNGKey(8),
        checkpoint_path=ck,
        checkpoint_every=1,
        **kwargs,
    )
    assert not r_res["partial"]
    np.testing.assert_array_equal(
        np.asarray(r_full["final_pos"]), np.asarray(r_res["final_pos"])
    )
    np.testing.assert_array_equal(
        np.asarray(r_full["traces"]["pos"]), np.asarray(r_res["traces"]["pos"])
    )
    np.testing.assert_allclose(
        float(r_full["final_step_size"]),
        float(r_res["final_step_size"]),
        rtol=0,
    )


def test_finite_pooled_mean_masks_nan_as_rejection():
    """One NaN accept must not poison the pooled statistic (round-4 advisor).

    The masked mean treats non-finite accepts as 0 (a diverged trajectory is
    a rejection) while keeping the full-fleet denominator, so a NaN lowers
    the pooled accept instead of propagating NaN into the shared step size.
    """
    from manifold_mcmc_tpu.samplers.chains import _finite_pooled_mean

    a = jnp.array([0.8, 0.6, jnp.nan, 1.0])
    got = float(_finite_pooled_mean(a))
    assert np.isfinite(got)
    assert got == pytest.approx((0.8 + 0.6 + 0.0 + 1.0) / 4)
    # All-finite input reduces to the plain mean.
    b = jnp.array([0.2, 0.4])
    assert float(_finite_pooled_mean(b)) == pytest.approx(0.3)
