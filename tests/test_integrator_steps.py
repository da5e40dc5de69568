"""Property tests for the leapfrog and constrained-leapfrog integrators.

Checks the defining identities of the integrators (SURVEY.md section 4):
energy conservation order, exact reversibility, manifold preservation and
cotangent-space momentum maintenance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.samplers.integrators import (
    make_constrained_integrator,
    make_leapfrog_integrator,
)
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.systems.euclidean import (
    EuclideanSystem,
    GaussianEuclideanSystem,
)
from manifold_mcmc_tpu.systems.metrics import DiagonalMetric, IdentityMetric


def correlated_gaussian_nld(q):
    # Anisotropic Gaussian: nld = q^T A q / 2 with banded A.
    dim = q.shape[0]
    A = jnp.eye(dim) + 0.4 * jnp.eye(dim, k=1) + 0.4 * jnp.eye(dim, k=-1)
    return 0.5 * q @ A @ q


@pytest.mark.parametrize("metric_type", ["identity", "diagonal"])
def test_leapfrog_energy_and_reversibility(rng, metric_type):
    dim = 8
    system = EuclideanSystem(correlated_gaussian_nld)
    metric = (
        IdentityMetric()
        if metric_type == "identity"
        else DiagonalMetric(jnp.asarray(rng.uniform(0.5, 2.0, dim)))
    )
    integ = make_leapfrog_integrator(system)
    q = jnp.asarray(rng.standard_normal(dim))
    p = integ.sample_momentum(jax.random.PRNGKey(0), integ.init(q, None, metric), metric)
    point = integ.init(q, p, metric)
    h0 = integ.energy(point, metric)

    dt = 0.05
    fwd = point
    for _ in range(20):
        fwd, ok, _, _ = integ.step(fwd, dt, metric)
        assert bool(ok)
    # Energy error O(dt^2) over a fixed horizon.
    assert abs(float(integ.energy(fwd, metric) - h0)) < 5e-3
    # Exact reversibility: negate momentum, integrate back, recover start.
    back = fwd._replace(mom=-fwd.mom)
    for _ in range(20):
        back, ok, _, _ = integ.step(back, dt, metric)
    np.testing.assert_allclose(back.pos, q, atol=1e-10)
    np.testing.assert_allclose(back.mom, -p, atol=1e-10)


def test_gaussian_leapfrog_exact_on_standard_normal(rng):
    # With the Gaussian splitting and zero residual density, the flow is the
    # exact rotation: energy conserved to machine precision.
    dim = 6
    system = GaussianEuclideanSystem(lambda q: jnp.asarray(0.0) * jnp.sum(q))
    metric = IdentityMetric()
    integ = make_leapfrog_integrator(system)
    q = jnp.asarray(rng.standard_normal(dim))
    p = jnp.asarray(rng.standard_normal(dim))
    point = integ.init(q, p, metric)
    h0 = integ.energy(point, metric)
    for _ in range(50):
        point, ok, _, _ = integ.step(point, 0.3, metric)
    np.testing.assert_allclose(integ.energy(point, metric), h0, rtol=1e-10)


def make_chmc_setup(rng, use_gaussian_splitting=False, num_obs_per_subseq=2):
    num_obs, S = 6, 3
    q0 = jnp.asarray(rng.standard_normal(4 + 2 + num_obs * S * 2) * 0.4)
    probe = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=num_obs_per_subseq,
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
    x_obs_seq = probe.generate_x_obs_seq(q0)
    system = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=num_obs_per_subseq,
        y_seq=fhn.obs_func(x_obs_seq),
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        use_gaussian_splitting=use_gaussian_splitting,
        dim_v_0=fhn.dim_v_0,
    )
    return system, q0, x_obs_seq


@pytest.mark.parametrize("solver", ["newton", "quasi-newton", "hybrid"])
@pytest.mark.parametrize("gaussian", [False, True])
@pytest.mark.slow
def test_constrained_step_preserves_manifold_and_reverses(rng, solver, gaussian):
    system, q0, x_obs_seq = make_chmc_setup(rng, use_gaussian_splitting=gaussian)
    metric = IdentityMetric()
    integ = make_constrained_integrator(
        system,
        x_obs_seq,
        partition=0,
        projection_solver=solver,
        constraint_tol=1e-11,
        position_tol=1e-10,
        reverse_check_tol=1e-8,
    )
    point = integ.init(q0, jnp.zeros_like(q0), metric)
    mom = integ.sample_momentum(jax.random.PRNGKey(3), point, metric)
    point = point._replace(mom=mom)
    h0 = integ.energy(point, metric)

    dt = 0.1
    fwd = point
    n_steps = 5
    for _ in range(n_steps):
        fwd, ok, _, iters = integ.step(fwd, dt, metric)
        assert bool(ok)
        assert int(iters) > 0
        # Stays on the manifold...
        c = system.constr(fwd.pos, x_obs_seq, 0)
        assert float(jnp.max(jnp.abs(c))) < 1e-9
        # ... with momentum in the cotangent space.
        normal = system.normal_space_component(fwd.mom, fwd.jac, fwd.chol, metric)
        assert float(jnp.max(jnp.abs(normal))) < 1e-8

    # Energy approximately conserved over the trajectory.
    assert abs(float(integ.energy(fwd, metric) - h0)) < 2e-2

    # Reversibility through the projections: negate momentum and integrate
    # back the same number of steps.
    back = fwd._replace(mom=-fwd.mom)
    for _ in range(n_steps):
        back, ok, _, _ = integ.step(back, dt, metric)
        assert bool(ok)
    np.testing.assert_allclose(back.pos, q0, atol=1e-7)
    np.testing.assert_allclose(back.mom, -mom, atol=1e-7)


@pytest.mark.slow
def test_constrained_step_flags_failures(rng):
    system, q0, x_obs_seq = make_chmc_setup(rng)
    metric = IdentityMetric()
    # Impossibly tight reversibility tolerance must flag the step as not ok
    # (failure is data, not an exception), and specifically as a
    # *non-reversible* step (the reference's NonReversibleStepError), not a
    # solver convergence error.
    integ = make_constrained_integrator(
        system, x_obs_seq, partition=0, reverse_check_tol=1e-300
    )
    point = integ.init(q0, jnp.zeros_like(q0), metric)
    point = point._replace(
        mom=integ.sample_momentum(jax.random.PRNGKey(0), point, metric)
    )
    _, ok, nonrev, _ = integ.step(point, 0.1, metric)
    assert not bool(ok)
    assert bool(nonrev)

    # A huge step must fail projection (non-convergence), again as data;
    # solver non-convergence takes precedence over the (meaningless)
    # reversibility distance, so ``non_reversible`` stays False.
    integ2 = make_constrained_integrator(
        system, x_obs_seq, partition=0, max_iters=5
    )
    _, ok2, nonrev2, _ = integ2.step(point, 1e4, metric)
    assert not bool(ok2)
    assert not bool(nonrev2)

    # A healthy step raises neither flag.
    integ3 = make_constrained_integrator(system, x_obs_seq, partition=0)
    _, ok3, nonrev3, _ = integ3.step(point, 0.1, metric)
    assert bool(ok3)
    assert not bool(nonrev3)


@pytest.mark.slow
def test_constrained_step_partition_1(rng):
    system, q0, x_obs_seq = make_chmc_setup(rng)
    metric = IdentityMetric()
    integ = make_constrained_integrator(system, x_obs_seq, partition=1)
    point = integ.init(q0, jnp.zeros_like(q0), metric)
    point = point._replace(
        mom=integ.sample_momentum(jax.random.PRNGKey(1), point, metric)
    )
    new_point, ok, _, _ = integ.step(point, 0.1, metric)
    assert bool(ok)
    assert float(jnp.max(jnp.abs(system.constr(new_point.pos, x_obs_seq, 1)))) < 1e-7
