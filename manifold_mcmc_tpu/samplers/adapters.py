"""Warm-up adapters: dual-averaging step size and online metric estimation.

Functional, in-graph replacements for the adapter surface the reference uses
from Mici (``DualAveragingStepSizeAdapter``, ``OnlineVarianceMetricAdapter``,
``OnlineCovarianceMetricAdapter`` at ``scripts/utils.py:236-250``) and the
reference's own ``OnlineBlockDiagonalMetricAdapter``
(``sde/mici_extensions.py:1804-1932``).  Each adapter is a triple of pure
functions ``(init, update, finalize)`` over an explicit state pytree carried
through the warm-up ``lax.scan``:

* ``init(pos)`` builds the per-chain adapter state;
* ``update(state, pos, accept_stat)`` is called once per chain iteration;
* ``finalize(state)`` runs *across* the chain axis (states carry a leading
  chain dimension): dual averaging averages the smoothed log step size over
  chains, and the metric adapters merge per-chain Welford statistics with the
  Schubert-Gertz parallel covariance combination before regularising towards
  a scaled identity (Stan-style) and inverting into the metric.

Under multi-device sharding the finalize reductions are the only cross-chain
communication in the whole sampler (a handful of ``psum``-sized arrays).
"""

from typing import Any, NamedTuple

import jax.numpy as jnp

from manifold_mcmc_tpu.systems.metrics import (
    BlockDiagonalMetric,
    DenseMetric,
    DiagonalMetric,
)

__all__ = [
    "DualAveragingState",
    "dual_averaging_init",
    "dual_averaging_update",
    "dual_averaging_finalize",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_merge_chains",
    "finalize_variance_metric",
    "finalize_covariance_metric",
    "finalize_block_diagonal_metric",
]


# --------------------------------------------------------------------- #
# Dual averaging step-size adaptation (Hoffman & Gelman 2014, Nesterov)  #
# --------------------------------------------------------------------- #


class DualAveragingState(NamedTuple):
    iter: Any
    log_step: Any
    log_step_bar: Any
    accept_err_sum: Any
    mu: Any
    log_step_max: Any


def dual_averaging_init(init_step_size, max_step_size=None):
    """Initialise dual averaging, optionally bounded above.

    ``max_step_size`` caps both the proposed step and the ``mu`` anchor.
    The f32 constrained integrator has a hard *failure cliff* in step size
    (projection / reversibility failures reject every trajectory above it);
    the standard anchor ``mu = log(10 * eps_0)`` (Hoffman & Gelman 2014)
    deliberately explores upward and, across the cliff, collects a run of
    zero acceptances that collapses the step by orders of magnitude with
    only O(1/sqrt(t)) recovery (measured:
    ``benchmarks/results/tuned_d10_warmup_2026-08-17.json``).  Callers pass
    a cliff estimate from :func:`~..samplers.chains.find_step_size_cliff`.
    """
    log_eps = jnp.log(init_step_size)
    log_max = (
        jnp.full_like(log_eps, jnp.inf)
        if max_step_size is None
        else jnp.log(max_step_size)
    )
    return DualAveragingState(
        iter=jnp.zeros_like(init_step_size, dtype=jnp.int32),
        log_step=jnp.minimum(log_eps, log_max),
        # Start the smoothed estimate at the initial step size so finalizing
        # an un-updated state returns ``init_step_size`` (the first update
        # has weight 1 and overwrites it, so adaptation is unaffected).
        log_step_bar=jnp.minimum(log_eps, log_max),
        accept_err_sum=jnp.zeros_like(log_eps),
        mu=jnp.minimum(jnp.log(10.0) + log_eps, log_max),
        log_step_max=log_max,
    )


def dual_averaging_update(
    state,
    accept_stat,
    adapt_stat_target=0.8,
    reg_coefficient=0.05,
    iter_offset=10,
    iter_decay_coeff=0.75,
):
    """One dual-averaging update towards the target acceptance statistic.

    ``reg_coefficient`` is the shrinkage-towards-``mu`` coefficient (the
    reference exposes it as ``--step-size-reg-coefficient``,
    ``scripts/utils.py:69-74``).
    """
    it = state.iter + 1
    err_sum = state.accept_err_sum + (adapt_stat_target - accept_stat)
    # log_eps_t = mu - sqrt(t) / gamma * (1 / (t + t0)) * sum_s err_s
    log_step = state.mu - jnp.sqrt(it * 1.0) / reg_coefficient * err_sum / (
        it + iter_offset
    )
    # Never step above the integrator-failure cliff (see dual_averaging_init).
    log_step = jnp.minimum(log_step, state.log_step_max)
    weight = it ** (-iter_decay_coeff)
    log_step_bar = weight * log_step + (1 - weight) * state.log_step_bar
    return DualAveragingState(
        iter=it,
        log_step=log_step,
        log_step_bar=log_step_bar,
        accept_err_sum=err_sum,
        mu=state.mu,
        log_step_max=state.log_step_max,
    )


def dual_averaging_finalize(state):
    """Final step size: smoothed estimate averaged over the chain axis."""
    return jnp.exp(jnp.mean(state.log_step_bar))


# --------------------------------------------------------------------- #
# Welford online (co)variance estimation with parallel merge             #
# --------------------------------------------------------------------- #


class WelfordState(NamedTuple):
    count: Any
    mean: Any
    sum_sq: Any  # sum of squared deviations: vector (variance) or matrix (cov)


def welford_init(dim, dtype, diagonal=False):
    shape = (dim,) if diagonal else (dim, dim)
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        sum_sq=jnp.zeros(shape, dtype),
    )


def welford_update(state, x):
    count = state.count + 1
    diff_pre = x - state.mean
    mean = state.mean + diff_pre / count
    diff_post = x - mean
    if state.sum_sq.ndim == 1:
        sum_sq = state.sum_sq + diff_pre * diff_post
    else:
        sum_sq = state.sum_sq + jnp.outer(diff_pre, diff_post)
    return WelfordState(count=count, mean=mean, sum_sq=sum_sq)


def welford_merge_chains(state):
    """Merge per-chain Welford states (leading chain axis) into one.

    Schubert & Gertz (2018) pairwise combination, applied as a one-shot
    reduction: with per-chain counts ``n_i``, means ``m_i`` and deviation sums
    ``S_i``, the pooled statistics are

        n = sum n_i,  m = sum n_i m_i / n,
        S = sum S_i + sum n_i (m_i - m) (m_i - m)^T.

    Matches the reference's cross-chain covariance merge
    (``mici_extensions.py:1897-1918``) but vectorised over the chain axis.
    """
    n_i = state.count
    n = jnp.sum(n_i)
    mean = jnp.sum(n_i[:, None] * state.mean, axis=0) / jnp.maximum(n, 1)
    dev = state.mean - mean
    if state.sum_sq.ndim == 2:  # (chains, dim) diagonal variant
        sum_sq = jnp.sum(state.sum_sq, axis=0) + jnp.sum(
            n_i[:, None] * dev**2, axis=0
        )
    else:
        sum_sq = jnp.sum(state.sum_sq, axis=0) + jnp.einsum(
            "c,ci,cj->ij", n_i, dev, dev
        )
    return WelfordState(count=n, mean=mean, sum_sq=sum_sq)


def _regularized_estimate(sum_sq, count, reg_iter_offset=5, reg_scale=1e-3):
    """Stan-style shrinkage of the (co)variance estimate towards ``reg_scale I``."""
    est = sum_sq / jnp.maximum(count - 1, 1)
    weight = count / (reg_iter_offset + count)
    est = est * weight
    reg = reg_scale * (reg_iter_offset / (reg_iter_offset + count))
    if est.ndim == 1:
        return est + reg
    dim = est.shape[0]
    return est + reg * jnp.eye(dim, dtype=est.dtype)


def finalize_variance_metric(merged_state, **reg_kwargs):
    """Diagonal metric = inverse of the regularised variance estimate."""
    var = _regularized_estimate(merged_state.sum_sq, merged_state.count, **reg_kwargs)
    return DiagonalMetric(1.0 / var)


def finalize_covariance_metric(merged_state, **reg_kwargs):
    """Dense metric = inverse of the regularised covariance estimate."""
    cov = _regularized_estimate(merged_state.sum_sq, merged_state.count, **reg_kwargs)
    return DenseMetric(jnp.linalg.inv(cov))


def finalize_block_diagonal_metric(merged_state, **reg_kwargs):
    """Block-diagonal metric: inverse parameter covariance block + identity.

    The Welford state must track only the first ``dim_param`` position
    coordinates (the global parameters); remaining coordinates keep the
    identity metric (reference ``mici_extensions.py:1804-1932``).
    """
    cov = _regularized_estimate(merged_state.sum_sq, merged_state.count, **reg_kwargs)
    return BlockDiagonalMetric(jnp.linalg.inv(cov))
