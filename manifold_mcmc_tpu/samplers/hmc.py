"""In-graph dynamic multinomial HMC (NUTS-style) transition.

The reference delegates this to Mici's host-side
``MultinomialDynamicIntegrationTransition`` / ``DynamicMultinomialHMC``
(``scripts/utils.py:232-234, 292-301``): recursive tree doubling in Python
with one host<->device bounce per leapfrog step.  Here the whole transition is
a pure JAX function built from two nested ``lax.while_loop``s -- an outer
doubling loop and an inner *iterative* leaf loop -- so thousands of chains run
it lock-step under ``vmap`` on-chip.

Algorithm: multinomial progressive sampling within each subtree, biased
progressive sampling across doublings, and the generalised no-U-turn
termination criterion ``rho . v(left) < 0 or rho . v(right) < 0`` (``rho`` the
momentum sum over the span, ``v = M^-1 p``).  Sub-U-turns inside a subtree are
detected with the O(log n)-memory checkpoint scheme of Phan & Pradhan's
iterative NUTS (as used by NumPyro): a leaf at even in-subtree index ``n``
stores ``(v, running momentum sum)`` at checkpoint slot ``popcount(n)``; a
leaf at odd ``n`` checks the spans of every complete binary subtree ending at
``n`` -- slots ``popcount(n)-trailing_ones(n) .. popcount(n)-1``.

Integrator failures (projection non-convergence, non-reversible steps,
non-finite Hamiltonians) terminate trajectory expansion and surface in the
returned statistics (``convergence_error``, ``non_reversible_step``,
``diverging``), mirroring the reference's exception->rejection contract
(SURVEY.md section 2.4): Mici records ``ConvergenceError`` and
``NonReversibleStepError`` under separate chain-statistic keys, so the two
failure modes are kept distinguishable here too.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from manifold_mcmc_tpu.utils.pytree import tree_where

__all__ = [
    "dynamic_multinomial_hmc",
    "static_hmc",
    "nuts_chunk_init",
    "nuts_chunk_expand",
    "nuts_chunk_finalize",
]


class _TreeState(NamedTuple):
    key: Any
    depth: Any
    left: Any  # point at the backwards-in-time end
    right: Any  # point at the forwards-in-time end
    prop_pos: Any
    prop_mom: Any
    prop_h: Any
    log_sum_w: Any
    sum_mom: Any
    sum_acc: Any
    n_step: Any
    n_solver_iters: Any
    turning: Any
    diverging: Any
    error: Any
    nonrev: Any  # a reversibility check specifically failed


class _SubtreeState(NamedTuple):
    key: Any
    point: Any  # current end of the subtree in the build direction
    leaf_idx: Any
    prop_pos: Any
    prop_mom: Any
    prop_h: Any
    log_sum_w: Any
    msum_running: Any  # momentum sum over leaves 0..leaf_idx-1
    ckpt_vel: Any  # (max_depth+1, dim) checkpoint velocities
    ckpt_msum: Any  # (max_depth+1, dim) momentum sums *before* checkpoints
    sum_acc: Any
    n_step: Any
    n_solver_iters: Any
    turning: Any
    diverging: Any
    error: Any
    nonrev: Any  # a reversibility check specifically failed


def _velocity(mom, metric):
    return metric.inv_mult(mom)


def _span_turning(sum_mom, vel_left, vel_right):
    return (jnp.vdot(sum_mom, vel_left) < 0) | (jnp.vdot(sum_mom, vel_right) < 0)


def _trailing_ones(n):
    return lax.population_count((n ^ (n + 1)) >> 1)


def _subtree_leaf(
    integrator, metric, s, direction, step_size, h0, max_tree_depth, max_delta_h
):
    """Advance a subtree build by ONE leaf (one leapfrog step).

    Shared by the single-shot :func:`_build_subtree` loop and the
    budget-bounded :func:`nuts_chunk_expand` so the two transition
    implementations cannot drift (they consume identical RNG streams and
    execute identical floating-point operations per leaf).
    """
    dtype = s.point.pos.dtype
    key, take_key = jax.random.split(s.key)
    point, ok, nonrev, iters = integrator.step(
        s.point, direction * step_size, metric
    )
    h = integrator.energy(point, metric)
    delta_h = h - h0
    delta_h = jnp.where(jnp.isnan(delta_h), jnp.inf, delta_h)
    diverging = delta_h > max_delta_h
    error = ~ok
    log_w = -delta_h

    # Progressive multinomial proposal within the subtree.
    log_sum_w_new = jnp.logaddexp(s.log_sum_w, log_w)
    take = jax.random.uniform(take_key, dtype=dtype) < jnp.exp(
        log_w - log_sum_w_new
    )
    prop_pos, prop_mom, prop_h = tree_where(
        take,
        (point.pos, point.mom, h),
        (s.prop_pos, s.prop_mom, s.prop_h),
    )

    # Checkpoint U-turn bookkeeping.
    n = s.leaf_idx
    vel = _velocity(point.mom, metric)
    is_even = (n & 1) == 0
    slot = lax.population_count(n)
    ckpt_vel = tree_where(is_even, s.ckpt_vel.at[slot].set(vel), s.ckpt_vel)
    ckpt_msum = tree_where(
        is_even, s.ckpt_msum.at[slot].set(s.msum_running), s.ckpt_msum
    )
    msum_after = s.msum_running + point.mom
    idx_max = lax.population_count(n) - 1
    idx_min = idx_max - _trailing_ones(n) + 1

    def check_slot(k, turning):
        active = (~is_even) & (k >= idx_min) & (k <= idx_max)
        span = msum_after - s.ckpt_msum[k]
        t = _span_turning(span, s.ckpt_vel[k], vel)
        return turning | (active & t)

    turning = lax.fori_loop(0, max_tree_depth + 1, check_slot, jnp.array(False))

    acc = jnp.minimum(1.0, jnp.exp(-delta_h)).astype(dtype)
    return _SubtreeState(
        key=key,
        point=point,
        leaf_idx=n + 1,
        prop_pos=prop_pos,
        prop_mom=prop_mom,
        prop_h=prop_h,
        log_sum_w=log_sum_w_new,
        msum_running=msum_after,
        ckpt_vel=ckpt_vel,
        ckpt_msum=ckpt_msum,
        sum_acc=s.sum_acc + acc,
        n_step=s.n_step + 1,
        n_solver_iters=s.n_solver_iters + iters,
        turning=s.turning | turning,
        diverging=s.diverging | diverging,
        error=s.error | error,
        nonrev=s.nonrev | nonrev,
    )


def _init_subtree_state(start_point, key, max_tree_depth):
    dim = start_point.pos.shape[-1]
    dtype = start_point.pos.dtype
    return _SubtreeState(
        key=key,
        point=start_point,
        leaf_idx=jnp.array(0, jnp.int32),
        prop_pos=start_point.pos,
        prop_mom=start_point.mom,
        prop_h=jnp.asarray(jnp.inf, dtype),
        log_sum_w=jnp.asarray(-jnp.inf, dtype),
        msum_running=jnp.zeros((dim,), dtype),
        ckpt_vel=jnp.zeros((max_tree_depth + 1, dim), dtype),
        ckpt_msum=jnp.zeros((max_tree_depth + 1, dim), dtype),
        sum_acc=jnp.asarray(0.0, dtype),
        n_step=jnp.array(0, jnp.int32),
        n_solver_iters=jnp.array(0, jnp.int32),
        turning=jnp.array(False),
        diverging=jnp.array(False),
        error=jnp.array(False),
        nonrev=jnp.array(False),
    )


def _build_subtree(
    integrator,
    metric,
    start_point,
    direction,
    depth,
    h0,
    step_size,
    key,
    max_tree_depth,
    max_delta_h,
):
    """Build a subtree of ``2**depth`` leaves stepping away from ``start_point``."""
    num_leaves = jnp.left_shift(jnp.array(1, jnp.int32), depth)

    def body(s):
        return _subtree_leaf(
            integrator,
            metric,
            s,
            direction,
            step_size,
            h0,
            max_tree_depth,
            max_delta_h,
        )

    def cond(s):
        return (
            (s.leaf_idx < num_leaves) & ~s.turning & ~s.diverging & ~s.error
        )

    init = _init_subtree_state(start_point, key, max_tree_depth)
    # Run the first leaf unconditionally (num_leaves >= 1), then loop.
    s = body(init)
    return lax.while_loop(cond, body, s)


def _merge_subtree(t, sub, go_right, accept_key, metric, new_key):
    """Merge a completed subtree ``sub`` into tree state ``t`` (one doubling).

    Shared tail of the doubling step for the single-shot and chunked
    transition implementations.
    """
    dtype = t.prop_h.dtype
    invalid = sub.turning | sub.diverging | sub.error

    # Biased progressive sampling across the doubling: only a fully valid
    # new subtree may contribute the proposal.
    accept_prob = jnp.exp(jnp.minimum(0.0, sub.log_sum_w - t.log_sum_w))
    take = (jax.random.uniform(accept_key, dtype=dtype) < accept_prob) & ~invalid
    prop_pos, prop_mom, prop_h = tree_where(
        take,
        (sub.prop_pos, sub.prop_mom, sub.prop_h),
        (t.prop_pos, t.prop_mom, t.prop_h),
    )

    merged_log_sum_w = jnp.logaddexp(t.log_sum_w, sub.log_sum_w)
    merged_sum_mom = t.sum_mom + sub.msum_running
    new_left = tree_where(go_right, t.left, sub.point)
    new_right = tree_where(go_right, sub.point, t.right)
    merged_turning = _span_turning(
        merged_sum_mom,
        _velocity(new_left.mom, metric),
        _velocity(new_right.mom, metric),
    )

    # On an invalid subtree the trajectory stops with the old tree intact.
    keep = ~invalid
    return _TreeState(
        key=new_key,
        depth=t.depth + 1,
        left=tree_where(keep, new_left, t.left),
        right=tree_where(keep, new_right, t.right),
        prop_pos=prop_pos,
        prop_mom=prop_mom,
        prop_h=prop_h,
        log_sum_w=jnp.where(keep, merged_log_sum_w, t.log_sum_w),
        sum_mom=tree_where(keep, merged_sum_mom, t.sum_mom),
        sum_acc=t.sum_acc + sub.sum_acc,
        n_step=t.n_step + sub.n_step,
        n_solver_iters=t.n_solver_iters + sub.n_solver_iters,
        turning=t.turning | (keep & merged_turning) | sub.turning,
        diverging=t.diverging | sub.diverging,
        error=t.error | sub.error,
        nonrev=t.nonrev | sub.nonrev,
    )


def _init_tree_state(init_point, key, h0):
    dtype = init_point.pos.dtype
    return _TreeState(
        key=key,
        depth=jnp.array(0, jnp.int32),
        left=init_point,
        right=init_point,
        prop_pos=init_point.pos,
        prop_mom=init_point.mom,
        prop_h=h0,
        log_sum_w=jnp.asarray(0.0, dtype),
        sum_mom=init_point.mom,
        sum_acc=jnp.asarray(0.0, dtype),
        n_step=jnp.array(0, jnp.int32),
        n_solver_iters=jnp.array(0, jnp.int32),
        turning=jnp.array(False),
        diverging=jnp.array(False),
        error=jnp.array(False),
        nonrev=jnp.array(False),
    )


def _tree_stats(t):
    # ``error`` is the union of every integrator failure; report the
    # reversibility-specific failures under their own key (Mici's
    # ``non_reversible_step``) and the remainder (projection solver
    # non-convergence / non-finite results) as ``convergence_error``.
    return {
        "accept_stat": jnp.where(
            t.n_step > 0, t.sum_acc / jnp.maximum(t.n_step, 1), 0.0
        ),
        "n_step": t.n_step,
        "n_solver_iters": t.n_solver_iters,
        "tree_depth": t.depth,
        "diverging": t.diverging,
        "convergence_error": t.error & ~t.nonrev,
        "non_reversible_step": t.nonrev,
        "hamiltonian": t.prop_h,
    }


def dynamic_multinomial_hmc(
    integrator,
    metric,
    init_point,
    key,
    step_size,
    max_tree_depth=10,
    max_delta_h=1000.0,
):
    """One dynamic multinomial HMC transition from ``init_point``.

    ``init_point`` must carry a freshly sampled momentum.  Returns
    ``(prop_pos, prop_mom, stats)`` where ``stats`` includes ``accept_stat``,
    ``n_step``, ``tree_depth``, ``diverging``, ``convergence_error``,
    ``non_reversible_step``, ``hamiltonian`` (all per-chain scalars suitable
    for tracing).
    """
    dtype = init_point.pos.dtype
    h0 = integrator.energy(init_point, metric)

    def doubling_body(t):
        key, dir_key, sub_key, accept_key = jax.random.split(t.key, 4)
        go_right = jax.random.bernoulli(dir_key)
        direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
        start = tree_where(go_right, t.right, t.left)
        sub = _build_subtree(
            integrator,
            metric,
            start,
            direction,
            t.depth,
            h0,
            step_size,
            sub_key,
            max_tree_depth,
            max_delta_h,
        )
        return _merge_subtree(t, sub, go_right, accept_key, metric, key)

    def doubling_cond(t):
        return (t.depth < max_tree_depth) & ~t.turning & ~t.diverging & ~t.error

    init = _init_tree_state(init_point, key, h0)
    t = lax.while_loop(doubling_cond, doubling_body, init)
    return t.prop_pos, t.prop_mom, _tree_stats(t)


class NutsChunkCarry(NamedTuple):
    """Resumable state of a dynamic multinomial HMC transition.

    A fixed-shape pytree (vmappable, host-persistable) capturing the
    transition mid-tree, so tree expansion can be split across multiple
    bounded device dispatches -- required on accelerator runtimes that kill
    long single executions (the reference instead pays one host<->device
    bounce per leapfrog step inside Mici's recursive tree,
    ``mici/transitions.py`` via ``scripts/utils.py:232-234``).
    """

    tree: Any  # _TreeState of the completed doublings
    sub: Any  # _SubtreeState of the in-flight subtree build
    accept_key: Any  # doubling-acceptance key, held until the merge
    direction: Any  # +step / -step sign of the in-flight subtree
    go_right: Any  # build direction of the in-flight subtree
    num_leaves: Any  # leaf count (2**depth) of the in-flight subtree
    in_subtree: Any  # a subtree build is in flight
    done: Any  # the whole transition has terminated
    h0: Any  # initial Hamiltonian


def nuts_chunk_init(integrator, metric, init_point, key, max_tree_depth):
    """Start a resumable dynamic multinomial HMC transition.

    Consumes the RNG stream identically to :func:`dynamic_multinomial_hmc`
    given the same ``key``, so the chunked and single-shot transitions
    produce bitwise-identical trajectories.
    """
    dtype = init_point.pos.dtype
    h0 = integrator.energy(init_point, metric)
    tree = _init_tree_state(init_point, key, h0)
    sub = _init_subtree_state(init_point, key, max_tree_depth)
    return NutsChunkCarry(
        tree=tree,
        sub=sub,
        accept_key=key,
        direction=jnp.asarray(1.0, dtype),
        go_right=jnp.array(False),
        num_leaves=jnp.array(1, jnp.int32),
        in_subtree=jnp.array(False),
        done=jnp.array(max_tree_depth <= 0),
        h0=h0,
    )


def nuts_chunk_expand(
    integrator,
    metric,
    carry,
    step_size,
    budget,
    max_tree_depth=10,
    max_delta_h=1000.0,
):
    """Advance a resumable transition by at most ``budget`` leapfrog steps.

    Each loop unit performs exactly one leapfrog step (one tree leaf),
    starting a new doubling and/or merging a completed subtree around it with
    masked (cheap, vectorised) bookkeeping.  ``budget`` is a traced scalar so
    one compiled program serves every dispatch.  Returns the updated carry;
    ``carry.done`` reports termination.
    """
    dtype = carry.h0.dtype

    def unit(state):
        c, used = state
        t, s = c.tree, c.sub
        start = ~c.in_subtree

        # --- doubling start (masked; advances t.key only when starting) --- #
        new_key, dir_key, sub_key, accept_key = jax.random.split(t.key, 4)
        go_right_new = jax.random.bernoulli(dir_key)
        start_point = tree_where(go_right_new, t.right, t.left)
        fresh = _init_subtree_state(start_point, sub_key, max_tree_depth)
        s = tree_where(start, fresh, s)
        go_right = jnp.where(start, go_right_new, c.go_right)
        direction = jnp.where(
            start,
            jnp.where(go_right_new, 1.0, -1.0).astype(dtype),
            c.direction,
        )
        accept_key = tree_where(start, accept_key, c.accept_key)
        num_leaves = jnp.where(
            start,
            jnp.left_shift(jnp.array(1, jnp.int32), t.depth),
            c.num_leaves,
        )
        t = t._replace(key=tree_where(start, new_key, t.key))

        # --- one leaf (always exactly one leapfrog step) ------------------ #
        s = _subtree_leaf(
            integrator,
            metric,
            s,
            direction,
            step_size,
            c.h0,
            max_tree_depth,
            max_delta_h,
        )

        # --- subtree completion (masked merge + termination check) -------- #
        complete = (
            (s.leaf_idx >= num_leaves) | s.turning | s.diverging | s.error
        )
        merged = _merge_subtree(t, s, go_right, accept_key, metric, t.key)
        done_after = ~(
            (merged.depth < max_tree_depth)
            & ~merged.turning
            & ~merged.diverging
            & ~merged.error
        )
        t = tree_where(complete, merged, t)
        done = complete & done_after
        c = NutsChunkCarry(
            tree=t,
            sub=s,
            accept_key=accept_key,
            direction=direction,
            go_right=go_right,
            num_leaves=num_leaves,
            in_subtree=~complete,
            done=done,
            h0=c.h0,
        )
        return c, used + 1

    def cond(state):
        c, used = state
        return ~c.done & (used < budget)

    carry, _ = lax.while_loop(cond, unit, (carry, jnp.array(0, jnp.int32)))
    return carry


def nuts_chunk_finalize(carry):
    """Proposal and statistics of a finished (``done``) resumable transition.

    Identical output contract to :func:`dynamic_multinomial_hmc`.
    """
    t = carry.tree
    return t.prop_pos, t.prop_mom, _tree_stats(t)


def static_hmc(integrator, metric, init_point, key, step_size, num_steps):
    """Fixed-length HMC transition with a Metropolis accept step.

    Simpler (and fully uniform-cost under ``vmap``) alternative to the dynamic
    transition; used for debugging and throughput-oriented sampling.
    """
    dtype = init_point.pos.dtype
    h0 = integrator.energy(init_point, metric)

    def body(carry, _):
        point, ok_all, nonrev_any, iters = carry
        point, ok, nonrev, it = integrator.step(point, step_size, metric)
        return (point, ok_all & ok, nonrev_any | nonrev, iters + it), None

    (end, ok, nonrev, iters), _ = lax.scan(
        body,
        (init_point, jnp.array(True), jnp.array(False), jnp.array(0, jnp.int32)),
        None,
        length=num_steps,
    )
    h1 = integrator.energy(end, metric)
    delta_h = jnp.where(jnp.isnan(h1 - h0), jnp.inf, h1 - h0)
    accept_prob = jnp.where(ok, jnp.minimum(1.0, jnp.exp(-delta_h)), 0.0)
    accept = jax.random.uniform(key, dtype=dtype) < accept_prob
    pos, mom, h = tree_where(
        accept, (end.pos, end.mom, h1), (init_point.pos, init_point.mom, h0)
    )
    stats = {
        "accept_stat": accept_prob.astype(dtype),
        "n_step": jnp.array(num_steps, jnp.int32),
        "n_solver_iters": iters,
        "tree_depth": jnp.array(0, jnp.int32),
        "diverging": jnp.isinf(delta_h),
        "convergence_error": ~ok & ~nonrev,
        "non_reversible_step": nonrev,
        "hamiltonian": h,
    }
    return pos, mom, stats
