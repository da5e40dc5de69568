"""Symplectic integrators with explicit point caches and in-graph checks.

Two integrators, both returning
(new_point, ok_flag, non_reversible_flag, solver_iterations):

* ``make_leapfrog_integrator``: standard / Gaussian-splitting leapfrog for
  Euclidean systems (reference uses ``mici.integrators.LeapfrogIntegrator``,
  ``scripts/utils.py:230``).
* ``make_constrained_integrator``: RATTLE-style constrained leapfrog for the
  conditioned-diffusion manifold (reference
  ``mici.integrators.ConstrainedLeapfrogIntegrator``, configured at
  ``scripts/utils.py:284-290``): h1 half-kick with cotangent projection, then
  ``n_inner_step`` exact-``h2``-flow + Newton/quasi-Newton position
  retractions each followed by an explicit *reversibility check* (flow
  backwards, re-project, compare against the starting position within
  ``reverse_check_tol``), then the closing half-kick.

Every numerical failure -- projection non-convergence, divergence, or a
failed reversibility check -- lands in the returned ``ok`` flag instead of an
exception, so the dynamic HMC tree builder can mask the step into a rejection
under ``vmap`` (the reference's host-side ``NonReversibleStepError`` /
``ConvergenceError`` semantics as data).  The separate ``non_reversible``
flag singles out the reversibility-check failure mode (the reference's
``NonReversibleStepError``, raised by
``mici.integrators.ConstrainedLeapfrogIntegrator`` and surfaced as the
``non_reversible_step`` chain statistic) from solver non-convergence: it is
True only when every projection solve converged but the backwards-flow
position missed the starting point by more than ``reverse_check_tol``.

A "point" bundles the position/momentum with every derivative the sampler
needs at that position, making the reference's ``cache_in_state`` memoisation
(``mici.states``) an explicit dataflow: within one constrained step the
``(jacobian, Gram Cholesky, grad log det)`` of a position are computed once
and reused by the half-kicks, the cotangent projections, the projection
solver and the reversibility check.
"""

from typing import NamedTuple, Any

import jax.numpy as jnp

__all__ = [
    "EuclideanPoint",
    "ConstrainedPoint",
    "make_leapfrog_integrator",
    "make_constrained_integrator",
]


class EuclideanPoint(NamedTuple):
    pos: Any
    mom: Any
    nld: Any  # negative log density at pos
    grad_nld: Any


class ConstrainedPoint(NamedTuple):
    pos: Any
    mom: Any
    logdet: Any  # (1/2) log det Gram at pos
    grad_logdet: Any
    jac: Any  # structured Jacobian blocks at pos
    chol: Any  # Woodbury Gram Cholesky factors at pos


class Integrator(NamedTuple):
    """Pure-function bundle consumed by the HMC transitions."""

    init: Any  # (q, mom, metric) -> point
    step: Any  # (point, dt, metric) -> (point, ok, non_reversible, n_solver_iters)
    energy: Any  # (point, metric) -> h(point)
    sample_momentum: Any  # (key, point, metric) -> mom


def make_leapfrog_integrator(system):
    """Leapfrog for Euclidean systems (exact ``h2`` flow + gradient kicks)."""

    def init(q, mom, metric):
        nld, grad = system.val_and_grad_neg_log_dens(q)
        return EuclideanPoint(q, mom, nld, grad)

    def energy(point, metric):
        return system.h1(point.pos, point.nld) + system.h2(
            point.pos, point.mom, metric
        )

    def step(point, dt, metric):
        mom = point.mom - 0.5 * dt * system.dh1_dpos(point.pos, point.grad_nld)
        pos, mom = system.h2_flow(point.pos, mom, dt, metric)
        nld, grad = system.val_and_grad_neg_log_dens(pos)
        mom = mom - 0.5 * dt * system.dh1_dpos(pos, grad)
        ok = jnp.isfinite(nld) & jnp.all(jnp.isfinite(mom))
        # Unconstrained leapfrog has no reversibility check to fail.
        return (
            EuclideanPoint(pos, mom, nld, grad),
            ok,
            jnp.array(False),
            jnp.array(0, jnp.int32),
        )

    def sample_momentum(key, point, metric):
        return system.sample_momentum(key, point.pos, metric)

    return Integrator(init, step, energy, sample_momentum)


def make_constrained_integrator(
    system,
    x_obs_seq,
    partition=0,
    projection_solver="newton",
    n_inner_step=1,
    reverse_check_tol=2e-8,
    constraint_tol=1e-9,
    position_tol=1e-8,
    divergence_tol=1e10,
    max_iters=50,
):
    """Constrained leapfrog bound to one (x_obs_seq, partition) conditioning.

    ``x_obs_seq`` is fixed for the duration of an integration transition (it
    only changes in the partition-switch transition between iterations), so
    the integrator closes over it; the sampler rebuilds the closure each
    half-iteration with the refreshed conditioning -- all shapes are static.
    """
    if projection_solver not in ("newton", "quasi-newton", "hybrid"):
        raise ValueError(f"unknown projection solver {projection_solver}")

    def solve_projection(pos, prev_point, dt, metric):
        if projection_solver == "newton":
            return system.newton_projection(
                pos,
                x_obs_seq,
                prev_point.jac,
                dt,
                metric,
                partition,
                constraint_tol,
                position_tol,
                divergence_tol,
                max_iters,
            )
        if projection_solver == "hybrid":
            return system.hybrid_projection(
                pos,
                x_obs_seq,
                prev_point.jac,
                dt,
                metric,
                partition,
                constraint_tol,
                position_tol,
                divergence_tol,
                max_iters,
            )
        return system.quasi_newton_projection(
            pos,
            x_obs_seq,
            prev_point.jac,
            prev_point.chol,
            dt,
            metric,
            partition,
            constraint_tol,
            position_tol,
            divergence_tol,
            max_iters,
        )

    def eval_point(q, mom, metric):
        (logdet, (jac, chol)), grad = system.grad_log_det_sqrt_gram(
            q, x_obs_seq, metric, partition
        )
        return ConstrainedPoint(q, mom, logdet, grad, jac, chol)

    def init(q, mom, metric):
        return eval_point(q, mom, metric)

    def energy(point, metric):
        return system.h1(point.pos, point.logdet) + system.h2(
            point.pos, point.mom, metric
        )

    def project_mom(point, metric):
        return point._replace(
            mom=system.project_onto_cotangent_space(
                point.mom, point.jac, point.chol, metric
            )
        )

    def half_kick(point, dt, metric):
        mom = point.mom - dt * system.dh1_dpos(point.pos, point.grad_logdet)
        return project_mom(point._replace(mom=mom), metric)

    def step(point, dt, metric):
        converged = jnp.array(True)
        non_reversible = jnp.array(False)
        iters = jnp.array(0, jnp.int32)
        point = half_kick(point, 0.5 * dt, metric)
        dt_i = dt / n_inner_step
        _, mom_factor = system.dh2_flow_dmom_factors(dt_i)
        for i in range(n_inner_step):
            prev = point
            pos_f, mom_f = system.h2_flow(prev.pos, prev.mom, dt_i, metric)
            res = solve_projection(pos_f, prev, dt_i, metric)
            converged &= res.converged
            iters += res.iters
            new_point = eval_point(res.pos, mom_f - mom_factor * res.mu, metric)
            if i == n_inner_step - 1:
                new_point = project_mom(new_point, metric)
            # Reversibility check: flow backwards from the new point, project
            # with the new point's Jacobian, and require the result to land
            # back on the starting position within tolerance.
            pos_b, _ = system.h2_flow(new_point.pos, new_point.mom, -dt_i, metric)
            res_b = solve_projection(pos_b, new_point, -dt_i, metric)
            iters += res_b.iters
            rev_diff = jnp.max(jnp.abs(res_b.pos - prev.pos))
            converged &= res_b.converged
            non_reversible |= res_b.converged & ~(rev_diff < reverse_check_tol)
            point = new_point
        point = half_kick(point, 0.5 * dt, metric)
        finite = jnp.all(jnp.isfinite(point.mom)) & jnp.isfinite(point.logdet)
        # Solver non-convergence takes precedence: a distance check against a
        # non-converged projection result is meaningless (the reference's
        # solver raises ConvergenceError before its reversibility comparison
        # can run).
        non_reversible &= converged
        ok = converged & ~non_reversible & finite
        return point, ok, non_reversible, iters

    def sample_momentum(key, point, metric):
        return system.sample_momentum(key, point.jac, point.chol, metric)

    return Integrator(init, step, energy, sample_momentum)
