"""Vmapped multi-chain sampling drivers with on-device warm-up adaptation.

This is the TPU replacement for the reference's host-side Mici chain loop
(``sampler.sample_chains_with_adaptive_warm_up`` at
``scripts/utils.py:311-365``): the *entire* run -- momentum refresh, dynamic
tree transitions, partition switching, dual-averaging and metric adaptation,
and trace recording -- is one jitted program.  Chains batch along a leading
``vmap`` axis (1024+ per chip); iterations advance in ``lax.scan``.

Structure per CHMC iteration (matching the reference's ordered transitions
{momentum, integration, switch_partition}, ``scripts/utils.py:292-301``):

1. evaluate the point cache at the current position (Gram factors, gradient),
2. sample a fresh momentum in the cotangent space,
3. run one dynamic multinomial HMC transition on the current partition,
4. refresh ``x_obs_seq`` from the new position and advance the partition
   (deterministic alternation -- the scan body unrolls the ``num_partition``
   static variants, so no dynamic shapes ever reach XLA).

Warm-up follows Stan-style staging: with only step-size adaptation a single
dual-averaging stage; with a metric adapter, an initial fast buffer, doubling
slow windows (metric re-estimated and dual averaging re-centred at each
window boundary), and a terminal fast buffer.  Cross-chain reductions (final
step size, Welford merges) are the only inter-chain communication.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from manifold_mcmc_tpu.samplers import adapters as ad
from manifold_mcmc_tpu.samplers.hmc import (
    dynamic_multinomial_hmc,
    nuts_chunk_expand,
    nuts_chunk_finalize,
    nuts_chunk_init,
)
from manifold_mcmc_tpu.samplers.integrators import (
    make_constrained_integrator,
    make_leapfrog_integrator,
)
from manifold_mcmc_tpu.systems.metrics import IdentityMetric

__all__ = [
    "find_reasonable_step_size",
    "sample_chmc_chains",
    "sample_chmc_chains_host_loop",
    "sample_hmc_chains",
    "sample_hmc_chains_host_loop",
    "stan_windows",
]


def find_reasonable_step_size(integ, metric, point, init_step_size=1.0, max_tries=30):
    """Heuristic initial step size: double/halve until the one-step accept
    probability crosses 1/2 (Hoffman & Gelman 2014, Algorithm 4).

    Integrator failures count as acceptance probability 0 (halve).  Pure
    function of the starting point -- runs per chain under ``vmap``.
    """
    h0 = integ.energy(point, metric)
    dtype = point.pos.dtype

    def neg_delta_h(eps):
        pt, ok, _, _ = integ.step(point, eps, metric)
        h1 = integ.energy(pt, metric)
        ndh = h0 - h1
        return jnp.where(ok & jnp.isfinite(ndh), ndh, -jnp.inf)

    eps0 = jnp.asarray(init_step_size, dtype)
    nd0 = neg_delta_h(eps0)
    # direction: +1 (double) while accept prob > 1/2, else -1 (halve).
    direction = jnp.where(nd0 > jnp.log(0.5), 1.0, -1.0).astype(dtype)

    # The expensive step evaluation lives in the loop *body* (the cond only
    # inspects carried scalars -- a large cond graph miscompiles on some TPU
    # runtimes and would be evaluated twice per iteration anyway).
    def cond(carry):
        _, nd, i = carry
        return (direction * nd > direction * jnp.log(0.5)) & (i < max_tries)

    def body(carry):
        eps, _, i = carry
        eps_next = eps * jnp.exp2(direction)
        return eps_next, neg_delta_h(eps_next), i + 1

    eps, _, _ = lax.while_loop(cond, body, (eps0, nd0, jnp.array(0, jnp.int32)))
    # One step back for the doubling direction so the final accept prob is
    # on the >1/2 side.
    return jnp.where(direction > 0, eps * 0.5, eps)


def find_step_size_cliff(integ, metric, point, init_step_size=1.0, max_tries=30):
    """Largest step size at which a single integrator step still *succeeds*.

    The f32 constrained integrator fails hard above a step-size cliff
    (projection non-convergence / failed reversibility check -> ``ok`` False
    -> certain rejection), unlike the smooth acceptance decay dual
    averaging's model assumes.  Doubles from ``init_step_size`` while the
    step succeeds (or halves until it first succeeds) and returns the last
    succeeding step size; callers clamp dual averaging below a safety
    fraction of it (see ``dual_averaging_init(max_step_size=...)``).  Pure
    function of the starting point -- runs per chain under ``vmap``.
    """
    dtype = point.pos.dtype

    def ok_at(eps):
        _, ok, _, _ = integ.step(point, eps, metric)
        return ok

    eps0 = jnp.asarray(init_step_size, dtype)
    ok0 = ok_at(eps0)
    direction = jnp.where(ok0, 1.0, -1.0).astype(dtype)

    def cond(carry):
        _, ok, i = carry
        keep_doubling = (direction > 0) & ok
        keep_halving = (direction < 0) & ~ok
        return (keep_doubling | keep_halving) & (i < max_tries)

    def body(carry):
        eps, _, i = carry
        eps_next = eps * jnp.exp2(direction)
        return eps_next, ok_at(eps_next), i + 1

    eps, ok, _ = lax.while_loop(cond, body, (eps0, ok0, jnp.array(0, jnp.int32)))
    # Doubling stopped at the first *failing* step: back up one doubling.
    # Halving stopped at the first succeeding step: return it as-is.
    return jnp.where(direction > 0, jnp.where(ok, eps, eps * 0.5), eps)


def stan_windows(num_warm_up_iter, init_buffer=75, term_buffer=50, base_window=25):
    """Stan-style warm-up schedule: (fast, [slow windows...], fast).

    Returns ``(init_fast, slow_window_lengths, term_fast)``; windows double in
    length and the final one absorbs the remainder.  Degenerates gracefully
    for short warm-ups.
    """
    W = num_warm_up_iter
    if W < init_buffer + term_buffer + base_window:
        init_buffer = int(0.15 * W)
        term_buffer = int(0.1 * W)
    slow_total = W - init_buffer - term_buffer
    windows = []
    w = base_window
    remaining = slow_total
    while remaining > 0:
        if remaining < 2 * w or remaining < w + base_window:
            windows.append(remaining)
            remaining = 0
        else:
            windows.append(w)
            remaining -= w
            w *= 2
    return init_buffer, windows, term_buffer


def _finite_pooled_mean(accept):
    """Mean accept statistic over chains, ignoring non-finite entries.

    In pooled step adaptation one shared step size is updated from the
    fleet-mean accept statistic; a single chain whose tree produced a NaN
    accept (a non-finite Hamiltonian that escaped the divergence
    comparison) would otherwise poison the shared step for the entire
    fleet permanently, where per-chain adaptation confines the damage to
    that chain.  Non-finite entries count as 0 accept (the conservative
    reading: a diverged trajectory is a rejection), and the mean is taken
    over ALL chains so a NaN still pushes the step down rather than
    disappearing.
    """
    finite = jnp.isfinite(accept)
    return jnp.mean(jnp.where(finite, accept, 0.0))


def _split_keys(key, num):
    return jax.random.split(key, num)


# --------------------------------------------------------------------- #
# CHMC sweep bodies (shared by both drivers)                             #
# --------------------------------------------------------------------- #


def _chmc_sweep_fns(
    system,
    metric,
    solver_cfg,
    max_tree_depth,
    max_delta_h,
    adapt_stat_target,
    step_size_reg_coefficient,
    trace_func,
):
    """Build the per-chain warm-up / main sweep bodies.

    One sweep = the ordered transitions {momentum, dynamic integration,
    switch-partition} applied once per partition (reference
    ``scripts/utils.py:292-301``).  Both the fully in-graph driver
    (:func:`sample_chmc_chains`) and the host-loop driver
    (:func:`sample_chmc_chains_host_loop`) wrap these same bodies, so their
    sampling semantics cannot drift.
    """
    num_partition = system.num_partition

    def sub_iteration(q, x_obs, partition, key, step_size):
        integ = make_constrained_integrator(
            system, x_obs, partition=partition, **solver_cfg
        )
        k_mom, k_tree = _split_keys(key, 2)
        point = integ.init(q, jnp.zeros_like(q), metric)
        point = point._replace(mom=integ.sample_momentum(k_mom, point, metric))
        pos, mom, stats = dynamic_multinomial_hmc(
            integ, metric, point, k_tree, step_size, max_tree_depth, max_delta_h
        )
        return pos, system.generate_x_obs_seq(pos), stats

    def warm_sub_iteration(q, x_obs, da, sub_key, p):
        """One warm-up sub-iteration at partition ``p`` + dual-averaging update."""
        q, x_obs, stats = sub_iteration(q, x_obs, p, sub_key, jnp.exp(da.log_step))
        da = ad.dual_averaging_update(
            da,
            stats["accept_stat"],
            adapt_stat_target=adapt_stat_target,
            reg_coefficient=step_size_reg_coefficient,
        )
        return q, x_obs, da

    def main_sub_iteration(q, x_obs, counters, sub_key, step_size, p):
        """One main sub-iteration at partition ``p`` + counter/trace update."""
        q, x_obs, stats = sub_iteration(q, x_obs, p, sub_key, step_size)
        counters = _update_counters(counters, stats)
        return q, x_obs, counters, {**trace_func(q), **counters}, stats

    def warm_sweep_chain(q, x_obs, da, key):
        key, *sub_keys = _split_keys(key, num_partition + 1)
        for p in range(num_partition):
            q, x_obs, da = warm_sub_iteration(q, x_obs, da, sub_keys[p], p)
        return q, x_obs, da, key

    def main_sweep_chain(q, x_obs, key, step_size, counters):
        key, *sub_keys = _split_keys(key, num_partition + 1)
        traces, stats_out = [], []
        for p in range(num_partition):
            q, x_obs, counters, tr, stats = main_sub_iteration(
                q, x_obs, counters, sub_keys[p], step_size, p
            )
            traces.append(tr)
            stats_out.append(stats)
        stack = lambda ds: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ds)
        return q, x_obs, key, counters, stack(traces), stack(stats_out)

    fns = {
        "sub_iteration": sub_iteration,
        "warm_sub_iteration": warm_sub_iteration,
        "main_sub_iteration": main_sub_iteration,
        "warm_sweep_chain": warm_sweep_chain,
        "main_sweep_chain": main_sweep_chain,
    }
    return fns


# --------------------------------------------------------------------- #
# CHMC driver                                                            #
# --------------------------------------------------------------------- #


def sample_chmc_chains(
    system,
    init_pos,
    init_x_obs_seq,
    key,
    num_warm_up_iter,
    num_main_iter,
    projection_solver="newton",
    n_inner_step=1,
    reverse_check_tol=2e-8,
    constraint_tol=1e-9,
    position_tol=1e-8,
    divergence_tol=1e10,
    max_solver_iters=50,
    max_tree_depth=10,
    max_delta_h=1000.0,
    adapt_stat_target=0.8,
    step_size_reg_coefficient=0.05,
    trace_func=None,
    metric=IdentityMetric(),
    init_step_size=None,
    clear_caches_between_stages=False,
    find_init_step_size=True,
    step_size_cliff_safety=0.5,
    return_timings=False,
):
    """Sample vmapped CHMC chains for a conditioned diffusion system.

    ``step_size_cliff_safety``: probe each chain's integrator-failure cliff
    (:func:`find_step_size_cliff`) before warm-up and clamp dual averaging at
    this fraction of it, preventing the f32 step-size collapse documented in
    ``benchmarks/results/tuned_d10_warmup_2026-08-17.json``.  ``None``
    disables the probe (the reference's unbounded dual averaging).

    ``clear_caches_between_stages`` drops each stage's loaded executable
    before compiling the next: the step-size-search / warm-up / main programs
    are individually large, and some TPU runtimes fault when several stay
    resident; with a persistent compilation cache the reload cost is small.

    ``return_timings`` compiles each stage ahead-of-time and reports pure
    device-execution seconds per stage (``timings`` in the result), so
    benchmarks can separate compile/trace cost from sampling throughput.

    Args:
        init_pos: (num_chains, dim_q) initial constraint-satisfying positions.
        init_x_obs_seq: (num_chains, num_obs, dim_x) conditioning states.
        trace_func: optional ``f(pos) -> dict`` of per-iteration traced values.

    Returns a dict with final state, per-iteration traces (leading axes
    ``(num_chains, num_iters)``), transition statistics, cumulative call
    counters and the adapted step size.
    """
    import time as _time

    num_chains = init_pos.shape[0]
    num_partition = system.num_partition
    dtype = init_pos.dtype
    trace_func = trace_func if trace_func is not None else lambda q: {}

    solver_cfg = dict(
        projection_solver=projection_solver,
        n_inner_step=n_inner_step,
        reverse_check_tol=reverse_check_tol,
        constraint_tol=constraint_tol,
        position_tol=position_tol,
        divergence_tol=divergence_tol,
        max_iters=max_solver_iters,
    )
    fns = _chmc_sweep_fns(
        system,
        metric,
        solver_cfg,
        max_tree_depth,
        max_delta_h,
        adapt_stat_target,
        step_size_reg_coefficient,
        trace_func,
    )
    warm_sweep_chain = fns["warm_sweep_chain"]
    main_sweep_chain = fns["main_sweep_chain"]

    def warm_up_sweep(carry, _):
        return _chmc_warm_carry(warm_sweep_chain, carry), None

    def main_sweep(carry, _):
        q, x_obs, step_size, key, counters = carry
        q, x_obs, key, counters, traces, stats = main_sweep_chain(
            q, x_obs, key, step_size, counters
        )
        return (q, x_obs, step_size, key, counters), (traces, stats)

    # The run is staged into three separately jitted programs (step-size
    # search, warm-up, main) -- smaller XLA programs compile faster, cache
    # independently, and bound the size any single remote compile must handle.
    def _cliff_max_step(q0, x_obs0, chain_key, eps0):
        """Per-chain dual-averaging ceiling from the failure-cliff probe.

        Uses a key *folded off* the chain key (not split from the run
        stream) so enabling/disabling the probe does not shift the RNG
        schedule of the run itself, and the host-loop driver can derive the
        identical key from the same chain keys.
        """
        integ0 = make_constrained_integrator(
            system, x_obs0, partition=0, **solver_cfg
        )
        k_mom = jax.random.fold_in(chain_key, 13)
        point = integ0.init(q0, jnp.zeros_like(q0), metric)
        point = point._replace(mom=integ0.sample_momentum(k_mom, point, metric))
        cliff = find_step_size_cliff(integ0, metric, point, eps0)
        return step_size_cliff_safety * cliff

    def stage_init(init_pos, init_x_obs, keys, init_eps):
        def per_chain(q0, x_obs0, chain_key, eps0):
            integ0 = make_constrained_integrator(
                system, x_obs0, partition=0, **solver_cfg
            )
            k_mom, k_run = _split_keys(chain_key, 2)
            point = integ0.init(q0, jnp.zeros_like(q0), metric)
            point = point._replace(
                mom=integ0.sample_momentum(k_mom, point, metric)
            )
            eps = find_reasonable_step_size(integ0, metric, point, eps0)
            max_eps = (
                None
                if step_size_cliff_safety is None
                else _cliff_max_step(q0, x_obs0, chain_key, eps)
            )
            return ad.dual_averaging_init(eps, max_eps), k_run

        return jax.vmap(per_chain)(init_pos, init_x_obs, keys, init_eps)

    def stage_warm_up(init_pos, init_x_obs, da, run_keys):
        def per_chain(q0, x_obs0, da0, k0):
            n_wu = max(1, math.ceil(num_warm_up_iter / num_partition))
            (q, x_obs, da_f, k), _ = lax.scan(
                warm_up_sweep, (q0, x_obs0, da0, k0), None, length=n_wu
            )
            return q, x_obs, da_f, k

        q, x_obs, da, run_keys = jax.vmap(per_chain)(
            init_pos, init_x_obs, da, run_keys
        )
        # Cross-chain collective: final adapted step size.
        return q, x_obs, run_keys, ad.dual_averaging_finalize(da)

    def stage_main(q, x_obs, run_keys, step_size):
        def per_chain(q0, x_obs0, chain_key):
            n_main = max(1, math.ceil(num_main_iter / num_partition))
            return lax.scan(
                main_sweep,
                (q0, x_obs0, step_size, chain_key, _init_counters()),
                None,
                length=n_main,
            )

        return jax.vmap(per_chain)(q, x_obs, run_keys)

    timings = {}

    def run_stage(fn, label, *args):
        """Jit-run a stage; with ``return_timings``, AOT-compile first so the
        recorded execution time contains no tracing/compilation."""
        if not return_timings:
            return jax.jit(fn)(*args)
        t0 = _time.perf_counter()
        compiled = jax.jit(fn).lower(*args).compile()
        timings[f"{label}_compile_s"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        out = compiled(*args)
        jax.block_until_ready(out)
        timings[f"{label}_exec_s"] = _time.perf_counter() - t0
        return out

    keys = _split_keys(key, num_chains)
    init_eps = jnp.full(
        (num_chains,), 1.0 if init_step_size is None else init_step_size, dtype
    )
    if num_warm_up_iter > 0:
        if find_init_step_size:
            da, run_keys = run_stage(
                stage_init, "init", init_pos, init_x_obs_seq, keys, init_eps
            )
        else:
            # Skip the search program entirely; dual averaging adapts from
            # the provided initial step size (still cliff-clamped unless the
            # probe is disabled).
            if step_size_cliff_safety is None:
                da = jax.vmap(ad.dual_averaging_init)(init_eps)
            else:
                max_eps = run_stage(
                    lambda *a: jax.vmap(_cliff_max_step)(*a),
                    "cliff_probe",
                    init_pos,
                    init_x_obs_seq,
                    keys,
                    init_eps,
                )
                da = jax.vmap(ad.dual_averaging_init)(init_eps, max_eps)
            run_keys = keys
        if clear_caches_between_stages:
            jax.block_until_ready((da, run_keys))
            jax.clear_caches()
        q, x_obs, run_keys, step_size = run_stage(
            stage_warm_up, "warm_up", init_pos, init_x_obs_seq, da, run_keys
        )
        if clear_caches_between_stages:
            jax.block_until_ready((q, x_obs, step_size))
            jax.clear_caches()
    else:
        # Resume path: skip adaptation entirely and sample at the provided
        # step size (e.g. restored from a checkpoint).
        if init_step_size is None:
            raise ValueError("num_warm_up_iter=0 requires init_step_size")
        q, x_obs, run_keys = init_pos, init_x_obs_seq, keys
        step_size = jnp.asarray(init_step_size, dtype)
    (q, x_obs, _, _, counters), (traces, stats) = run_stage(
        stage_main, "main", q, x_obs, run_keys, step_size
    )
    # (chains, scan_steps, num_partition, ...) -> (chains, iters, ...)
    flatten = lambda t: jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0], -1) + x.shape[3:]), t
    )
    return {
        "final_pos": q,
        "final_x_obs_seq": x_obs,
        "final_step_size": step_size,
        "call_counters": counters,
        "traces": flatten(traces),
        "stats": flatten(stats),
        "timings": timings,
    }


def _chmc_warm_carry(warm_sweep_chain, carry):
    q, x_obs, da, key = carry
    return warm_sweep_chain(q, x_obs, da, key)


def _concat_sweep_chunks(chunks):
    """Merge per-key chunks of shape (chains, k_i, partitions, ...) along the
    sweep axis into one plain array per key (no object arrays anywhere).

    Keys are the union over chunks: a checkpoint written before a statistic
    existed (e.g. ``non_reversible_step`` added mid-run) resumes cleanly,
    with the missing prefix zero-filled at the old chunk's sweep length.
    """
    import numpy as onp

    if not chunks:
        return {}
    keys = []
    for c in chunks:
        keys.extend(k for k in c.keys() if k not in keys)

    def sweep_len(c):
        return next(iter(c.values())).shape[1]

    def get(c, k, template):
        if k in c:
            return c[k]
        shape = (template.shape[0], sweep_len(c)) + template.shape[2:]
        return onp.zeros(shape, template.dtype)

    out = {}
    for k in keys:
        template = next(c[k] for c in chunks if k in c)
        out[k] = onp.concatenate([get(c, k, template) for c in chunks], axis=1)
    return out


# Backend fault texts observed to be TRANSIENT on tunnelled accelerator
# runtimes: the identical execution/transfer succeeds minutes later (free
# device memory is plentiful throughout -- measured 12 GB allocatable while
# a 2 MB readback failed).  Congestion on the host<->device link surfaces
# as RESOURCE_EXHAUSTED on whatever call happens to synchronise next.
_TRANSIENT_FAULT_MARKERS = ("RESOURCE_EXHAUSTED",)


def retry_transient(fn, what="dispatch", max_tries=6, base_delay=15.0, deadline_ts=None):
    """Run one host-loop dispatch unit, retrying transient backend faults.

    ``fn`` must be a PURE unit: a closure over live host references whose
    device inputs it does not donate, returning its outputs (device arrays
    and/or host conversions of them).  Outputs are synced before being
    accepted, so a failed attempt can only poison buffers that are dropped
    on retry; the inputs stay valid and re-running the unit is exact
    (dispatches are deterministic functions of their inputs, RNG keys
    included).  Non-transient errors propagate immediately.

    RESOURCE_EXHAUSTED has two causes on tunnelled workers: link
    congestion (cured by waiting) and worker *program memory* filled by
    executables loaded for earlier stages (cured only by eviction).  From
    the second attempt on, all host-side executable caches are dropped
    before re-running, so the retry reloads just the programs ``fn``
    actually dispatches; re-tracing is repaid from the persistent compile
    cache.

    ``deadline_ts`` (absolute ``time.time()`` seconds; default from env
    ``MMT_RETRY_DEADLINE_TS``) caps the total backoff: a sleep that would
    end past the deadline is not taken -- the fault is re-raised instead,
    so a deadline-bounded caller (bench.py's child) fails fast with the
    real error rather than sleeping through its budget (up to 465 s of
    blind backoff otherwise; round-2 BENCH failure mode).
    """
    import gc as _gc
    import os as _os_env
    import time as _time

    if _os_env.environ.get("MMT_NO_RETRY"):  # debug aid: fail fast, full trace
        max_tries = 1
    if deadline_ts is None:
        env_dl = _os_env.environ.get("MMT_RETRY_DEADLINE_TS")
        deadline_ts = float(env_dl) if env_dl else None
    for attempt in range(max_tries):
        try:
            out = fn()
            jax.block_until_ready(out)
            return out
        except Exception as err:  # noqa: BLE001 - filtered by marker below
            msg = str(err)
            transient = any(m in msg for m in _TRANSIENT_FAULT_MARKERS)
            if not transient or attempt == max_tries - 1:
                raise
            delay = base_delay * (2.0**attempt)
            if deadline_ts is not None and _time.time() + delay > deadline_ts:
                raise
            evict = attempt >= 1
            print(
                f"[host-loop] transient backend fault in {what} "
                f"(attempt {attempt + 1}/{max_tries}); "
                f"{'evicting executables and ' if evict else ''}retrying in "
                f"{delay:.0f}s: {msg.splitlines()[0][:120]}",
                flush=True,
            )
            if evict:
                jax.clear_caches()
                _gc.collect()
            _time.sleep(delay)


def _init_counters():
    z = jnp.array(0, jnp.int64) if jax.config.jax_enable_x64 else jnp.array(0, jnp.int32)
    return {
        "n_step_calls": z,
        "constr_calls": z,
        "jacob_constr_blocks_calls": z,
        "chol_gram_blocks_calls": z,
        "log_det_sqrt_gram_calls": z,
        "grad_log_det_sqrt_gram_calls": z,
        "neg_log_dens_calls": z,
        "grad_neg_log_dens_calls": z,
    }


def _update_counters(counters, stats):
    """Accumulate per-operation call counts from transition statistics.

    Mirrors the reference's cumulative ``_call_counts`` tracing
    (``scripts/utils.py:186-199``): per tree leaf one gradient evaluation
    (which also evaluates the Jacobian, Gram Cholesky and log-det), and per
    projection-solver iteration one constraint evaluation (the solver
    iteration count is folded into ``constr_calls`` as in
    ``mici_extensions.py:1382-1387``).
    """
    n = stats["n_step"].astype(counters["n_step_calls"].dtype)
    solver_iters = stats.get("n_solver_iters")
    out = dict(counters)
    out["n_step_calls"] = counters["n_step_calls"] + n
    out["grad_log_det_sqrt_gram_calls"] = (
        counters["grad_log_det_sqrt_gram_calls"] + n
    )
    out["log_det_sqrt_gram_calls"] = counters["log_det_sqrt_gram_calls"] + n
    out["jacob_constr_blocks_calls"] = counters["jacob_constr_blocks_calls"] + n
    out["chol_gram_blocks_calls"] = counters["chol_gram_blocks_calls"] + n
    if solver_iters is not None:
        out["constr_calls"] = counters["constr_calls"] + solver_iters.astype(
            counters["constr_calls"].dtype
        )
    out["neg_log_dens_calls"] = counters["neg_log_dens_calls"] + n
    out["grad_neg_log_dens_calls"] = counters["grad_neg_log_dens_calls"] + n
    return out


# --------------------------------------------------------------------- #
# HMC driver                                                             #
# --------------------------------------------------------------------- #


def sample_hmc_chains(
    system,
    init_pos,
    key,
    num_warm_up_iter,
    num_main_iter,
    max_tree_depth=10,
    max_delta_h=1000.0,
    adapt_stat_target=0.8,
    step_size_reg_coefficient=0.05,
    metric_type="identity",
    dim_param=None,
    trace_func=None,
    init_step_size=None,
    find_init_step_size=True,
    clear_caches_between_stages=False,
    return_timings=False,
):
    """Sample vmapped dynamic-HMC chains for a Euclidean system.

    ``metric_type`` in {"identity", "diagonal", "dense", "block"}; adaptive
    metrics use Stan-style slow windows with cross-chain Welford merges
    (``dim_param`` sets the block size for "block").

    Like :func:`sample_chmc_chains`, the run is staged into separately
    jitted programs (step-size search, each warm-up window, main) so no
    single XLA program grows with the warm-up schedule;
    ``clear_caches_between_stages`` additionally drops each stage's loaded
    executable before the next compiles (for accelerator runtimes that fault
    under resident-executable pressure), and ``return_timings`` AOT-compiles
    stages to report pure execution seconds.
    """
    import time as _time

    num_chains, dim_q = init_pos.shape
    dtype = init_pos.dtype
    trace_func = trace_func if trace_func is not None else lambda q: {}
    integ = make_leapfrog_integrator(system)

    if metric_type not in ("identity", "diagonal", "dense", "block"):
        raise ValueError(f"unknown metric type {metric_type}")
    if metric_type == "block" and dim_param is None:
        raise ValueError("metric_type='block' requires dim_param")

    iteration = _make_hmc_iteration(integ, max_tree_depth, max_delta_h)

    def warm_up_sweep(metric, collect_welford):
        def sweep(carry, _):
            q, da, wf, key = carry
            key, k = _split_keys(key, 2)
            q, stats = iteration(q, k, jnp.exp(da.log_step), metric)
            da = ad.dual_averaging_update(
                da,
                stats["accept_stat"],
                adapt_stat_target=adapt_stat_target,
                reg_coefficient=step_size_reg_coefficient,
            )
            if collect_welford:
                x = q[:dim_param] if metric_type == "block" else q
                wf = ad.welford_update(wf, x)
            return (q, da, wf, key), None

        return sweep

    def main_sweep(metric, step_size):
        def sweep(carry, _):
            q, key, counters = carry
            key, k = _split_keys(key, 2)
            q, stats = iteration(q, k, step_size, metric)
            counters = _update_hmc_counters(counters, stats)
            return (q, key, counters), ({**trace_func(q), **counters}, stats)

        return sweep

    wf_dim = dim_param if metric_type == "block" else dim_q
    has_metric_adapter = metric_type != "identity"

    if has_metric_adapter:
        init_buffer, slow_windows, term_buffer = stan_windows(num_warm_up_iter)
    else:
        init_buffer, slow_windows, term_buffer = num_warm_up_iter, [], 0

    def fresh_welford():
        if not has_metric_adapter:
            # Identity metric: the Welford carry is never consumed (collect
            # stays False, finalize never runs) but it is created EAGERLY
            # below -- a dense dim_q x dim_q covariance per chain would be
            # ~65 GB at canonical noisy-obs shapes.  Thread a dim-1
            # placeholder instead (inside jit it is dead code anyway).
            return ad.welford_init(1, dtype, diagonal=True)
        return ad.welford_init(wf_dim, dtype, diagonal=(metric_type == "diagonal"))

    def finalize_metric(wf_merged):
        if metric_type == "diagonal":
            return ad.finalize_variance_metric(wf_merged)
        if metric_type == "dense":
            return ad.finalize_covariance_metric(wf_merged)
        return ad.finalize_block_diagonal_metric(wf_merged)

    timings = {}

    def run_stage(fn, label, *args):
        if not return_timings:
            out = jax.jit(fn)(*args)
        else:
            t0 = _time.perf_counter()
            compiled = jax.jit(fn).lower(*args).compile()
            timings[f"{label}_compile_s"] = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            out = compiled(*args)
            jax.block_until_ready(out)
            timings[f"{label}_exec_s"] = _time.perf_counter() - t0
        if clear_caches_between_stages:
            jax.block_until_ready(out)
            jax.clear_caches()
        return out

    # Stage 1: per-chain step-size search (own program; optional).
    def stage_init(init_pos, keys, init_eps):
        metric = IdentityMetric()

        def init_chain(q0, chain_key, eps0):
            k_mom, k_run = _split_keys(chain_key, 2)
            point = integ.init(q0, jnp.zeros_like(q0), metric)
            point = point._replace(mom=integ.sample_momentum(k_mom, point, metric))
            eps = find_reasonable_step_size(integ, metric, point, eps0)
            return ad.dual_averaging_init(eps), k_run

        return jax.vmap(init_chain)(init_pos, keys, init_eps)

    # Stage 2..k: one program per warm-up window (scan inside).
    def make_warm_stage(length, collect):
        def stage(q, da, wf, run_keys, metric):
            sweep = warm_up_sweep(metric, collect)
            return jax.vmap(
                lambda q0, da0, wf0, k0: lax.scan(
                    sweep, (q0, da0, wf0, k0), None, length=length
                )[0]
            )(q, da, wf, run_keys)

        return stage

    # Final stage: main sampling (own program).
    def stage_main(q, run_keys, metric, step_size):
        sweep = main_sweep(metric, step_size)
        return jax.vmap(
            lambda q0, k0: lax.scan(
                sweep, (q0, k0, _init_counters()), None, length=num_main_iter
            )
        )(q, run_keys)

    keys = _split_keys(key, num_chains)
    init_eps = jnp.full(
        (num_chains,), 1.0 if init_step_size is None else init_step_size, dtype
    )
    metric = IdentityMetric()
    if find_init_step_size and num_warm_up_iter > 0:
        da, run_keys = run_stage(stage_init, "init", init_pos, keys, init_eps)
    else:
        da = jax.vmap(ad.dual_averaging_init)(init_eps)
        run_keys = keys
    q = init_pos
    wf = jax.vmap(lambda _: fresh_welford())(jnp.arange(num_chains))

    if init_buffer > 0:
        q, da, wf, run_keys = run_stage(
            make_warm_stage(init_buffer, False),
            "warm_fast0",
            q, da, wf, run_keys, metric,
        )
    for i, w in enumerate(slow_windows):
        wf = jax.vmap(lambda _: fresh_welford())(jnp.arange(num_chains))
        q, da, wf, run_keys = run_stage(
            make_warm_stage(w, True), f"warm_slow{i}", q, da, wf, run_keys, metric
        )
        metric = finalize_metric(ad.welford_merge_chains(wf))
        # Re-centre dual averaging on the current smoothed step size.
        da = jax.vmap(lambda d: ad.dual_averaging_init(
                jnp.exp(d.log_step_bar), jnp.exp(d.log_step_max)
            ))(da)
    if term_buffer > 0:
        q, da, wf, run_keys = run_stage(
            make_warm_stage(term_buffer, False),
            "warm_fast1",
            q, da, wf, run_keys, metric,
        )

    step_size = ad.dual_averaging_finalize(da)
    (q, _, counters), (traces, stats) = run_stage(
        stage_main, "main", q, run_keys, metric, step_size
    )
    return {
        "final_pos": q,
        "final_step_size": step_size,
        "final_metric": metric,
        "call_counters": counters,
        "traces": traces,
        "stats": stats,
        "timings": timings,
    }


def _make_hmc_iteration(integ, max_tree_depth, max_delta_h):
    """Per-chain HMC iteration {momentum refresh, dynamic tree transition},
    shared by the in-graph and host-loop drivers so they cannot drift."""

    def iteration(q, key, step_size, metric):
        k_mom, k_tree = _split_keys(key, 2)
        point = integ.init(q, jnp.zeros_like(q), metric)
        point = point._replace(mom=integ.sample_momentum(k_mom, point, metric))
        pos, mom, stats = dynamic_multinomial_hmc(
            integ, metric, point, k_tree, step_size, max_tree_depth, max_delta_h
        )
        return pos, stats

    return iteration


def _update_hmc_counters(counters, stats):
    n = stats["n_step"].astype(counters["neg_log_dens_calls"].dtype)
    out = dict(counters)
    out["n_step_calls"] = counters["n_step_calls"] + n
    out["neg_log_dens_calls"] = counters["neg_log_dens_calls"] + n
    out["grad_neg_log_dens_calls"] = counters["grad_neg_log_dens_calls"] + n
    return out


def sample_hmc_chains_host_loop(
    system,
    init_pos,
    key,
    num_warm_up_iter,
    num_main_iter,
    max_tree_depth=10,
    max_delta_h=1000.0,
    adapt_stat_target=0.8,
    step_size_reg_coefficient=0.05,
    metric_type="identity",
    dim_param=None,
    trace_func=None,
    init_step_size=0.5,
    find_init_step_size=True,
    progress_every=0,
    checkpoint_path=None,
    checkpoint_every=0,
    max_steps_per_dispatch=None,
    clear_caches_between_stages=False,
    deadline_ts=None,
):
    """HMC driver with a *host-side* iteration loop (bounded dispatches).

    Same sampling semantics as :func:`sample_hmc_chains` (shared per-chain
    iteration via :func:`_make_hmc_iteration`, same Stan-style warm-up
    windows and cross-chain Welford merges) but each device dispatch is ONE
    vmapped iteration, so no program's execution time grows with the
    warm-up schedule -- required on accelerator runtimes that kill long
    device executions (see the CHMC host loop).  With
    ``find_init_step_size`` (default, matching :func:`sample_hmc_chains`)
    a bounded per-chain doubling search seeds dual averaging, consuming the
    identical RNG stream as the in-graph driver's search stage so the two
    drivers produce bitwise-identical trajectories given the same arguments.

    With ``checkpoint_path`` + ``checkpoint_every`` the complete sampler
    state (positions, dual-averaging and Welford states, adapted metric,
    RNG keys, call counters, accumulated main-phase output) is persisted
    every N iterations and a crashed/killed process resumes exactly where
    it stopped -- the canonical noisy-obs runs (500+2500 iterations,
    reference ``scripts/utils.py:94-101``) take hours through the TPU
    tunnel, whose worker can fault at any point.  Checkpoints are written
    only after window-boundary adaptation actions, so resumed state is
    always post-boundary and the Stan window schedule (deterministic in
    ``num_warm_up_iter``) is simply fast-forwarded.

    With ``max_steps_per_dispatch=K`` each device dispatch executes at most
    ``K`` leapfrog steps: the dynamic tree is built through the resumable
    :func:`nuts_chunk_init` / :func:`nuts_chunk_expand` /
    :func:`nuts_chunk_finalize` transition, whose carry stays device-resident
    between dispatches.  This bounds every single device execution even at
    the reference's canonical ``max_tree_depth=20`` noisy-obs configuration
    (up to 2**20 steps per iteration -- reference ``scripts/utils.py:94-101``),
    which a per-iteration dispatch cannot (accelerator runtimes behind
    tunnels kill executions beyond tens of seconds).  The chunked transition
    consumes the identical RNG stream, so results are unchanged.
    """
    import os as _os
    import time as _time

    import numpy as onp

    num_chains, dim_q = init_pos.shape
    dtype = init_pos.dtype
    trace_func = trace_func if trace_func is not None else lambda q: {}
    integ = make_leapfrog_integrator(system)
    if metric_type not in ("identity", "diagonal", "dense", "block"):
        raise ValueError(f"unknown metric type {metric_type}")
    if metric_type == "block" and dim_param is None:
        raise ValueError("metric_type='block' requires dim_param")

    iteration = _make_hmc_iteration(integ, max_tree_depth, max_delta_h)
    wf_dim = dim_param if metric_type == "block" else dim_q
    has_metric_adapter = metric_type != "identity"

    @partial(jax.jit, static_argnames=("collect",))
    def warm_iter(q, da, wf, keys, metric, collect):
        def one(q0, da0, wf0, k0):
            k_next, k = _split_keys(k0, 2)
            q1, stats = iteration(q0, k, jnp.exp(da0.log_step), metric)
            da1 = ad.dual_averaging_update(
                da0,
                stats["accept_stat"],
                adapt_stat_target=adapt_stat_target,
                reg_coefficient=step_size_reg_coefficient,
            )
            if collect:
                x = q1[:dim_param] if metric_type == "block" else q1
                wf0 = ad.welford_update(wf0, x)
            return q1, da1, wf0, k_next

        return jax.vmap(one)(q, da, wf, keys)

    @jax.jit
    def main_iter(q, keys, counters, metric, step_size):
        def one(q0, k0, c0):
            k_next, k = _split_keys(k0, 2)
            q1, stats = iteration(q0, k, step_size, metric)
            c1 = _update_hmc_counters(c0, stats)
            return q1, k_next, c1, {**trace_func(q1), **c1}, stats

        return jax.vmap(one)(q, keys, counters)

    if max_steps_per_dispatch is not None and max_steps_per_dispatch > 0:
        # Resumable-tree mode: each dispatch advances every chain's tree by
        # at most ``max_steps_per_dispatch`` leapfrog steps; the carry stays
        # on device, the host only reads back the not-done count (one int).
        # RNG splits mirror ``_make_hmc_iteration`` exactly.
        @jax.jit
        def _chunk_start(q, keys, metric):
            def one(q0, k0):
                k_next, k = _split_keys(k0, 2)
                k_mom, k_tree = _split_keys(k, 2)
                point = integ.init(q0, jnp.zeros_like(q0), metric)
                point = point._replace(
                    mom=integ.sample_momentum(k_mom, point, metric)
                )
                carry = nuts_chunk_init(
                    integ, metric, point, k_tree, max_tree_depth
                )
                return carry, k_next

            return jax.vmap(one)(q, keys)

        @jax.jit
        def _chunk_expand(carry, eps, metric, budget):
            out = jax.vmap(
                lambda c, e: nuts_chunk_expand(
                    integ, metric, c, e, budget, max_tree_depth, max_delta_h
                )
            )(carry, eps)
            return out, jnp.sum(~out.done)

        @jax.jit
        def _chunk_finish(carry):
            pos, _, stats = jax.vmap(nuts_chunk_finalize)(carry)
            return pos, stats

        _tree_log = bool(_os.environ.get("MMT_TREE_LOG"))

        def _run_transition(q, keys, eps, metric):
            carry, k_next = _chunk_start(q, keys, metric)
            budget = jnp.array(int(max_steps_per_dispatch), jnp.int32)
            rounds = 0
            t0 = _time.time()
            while True:
                carry, n_active = _chunk_expand(carry, eps, metric, budget)
                rounds += 1
                n = int(jax.device_get(n_active))
                if _tree_log and rounds % 32 == 0:
                    print(
                        f"[hmc-host-loop] tree: {rounds} dispatches "
                        f"(<= {rounds * int(max_steps_per_dispatch)} steps), "
                        f"{n} chains active, {_time.time() - t0:.0f}s",
                        flush=True,
                    )
                if n == 0:
                    break
            pos, stats = _chunk_finish(carry)
            return pos, k_next, stats

        @partial(jax.jit, static_argnames=("collect",))
        def _warm_post(q1, da, wf, stats, collect):
            def one(q0, da0, wf0, a0):
                da1 = ad.dual_averaging_update(
                    da0,
                    a0,
                    adapt_stat_target=adapt_stat_target,
                    reg_coefficient=step_size_reg_coefficient,
                )
                if collect:
                    x = q0[:dim_param] if metric_type == "block" else q0
                    wf0 = ad.welford_update(wf0, x)
                return da1, wf0

            return jax.vmap(one)(q1, da, wf, stats["accept_stat"])

        @jax.jit
        def _main_post(q1, counters, stats):
            def one(q0, c0, s0):
                c1 = _update_hmc_counters(c0, s0)
                return c1, {**trace_func(q0), **c1}

            return jax.vmap(one)(q1, counters, stats)

        def warm_iter(q, da, wf, keys, metric, collect):  # noqa: F811
            q1, k_next, stats = _run_transition(
                q, keys, jnp.exp(da.log_step), metric
            )
            da1, wf1 = _warm_post(q1, da, wf, stats, collect)
            return q1, da1, wf1, k_next

        def main_iter(q, keys, counters, metric, step_size):  # noqa: F811
            eps = jnp.broadcast_to(jnp.asarray(step_size, dtype), (num_chains,))
            q1, k_next, stats = _run_transition(q, keys, eps, metric)
            c1, tr = _main_post(q1, counters, stats)
            return q1, k_next, c1, tr, stats

    if has_metric_adapter:
        init_buffer, slow_windows, term_buffer = stan_windows(num_warm_up_iter)
    else:
        init_buffer, slow_windows, term_buffer = num_warm_up_iter, [], 0

    def fresh_welford():
        if not has_metric_adapter:
            # Identity metric: nothing consumes the Welford state (collect
            # is never True and finalize never runs) but the dispatch
            # signature threads it.  The in-graph driver dead-code-
            # eliminates it inside jit; here it would be EAGERLY
            # materialized -- a dense dim_q x dim_q covariance per chain is
            # ~65 GB at canonical noisy-obs shapes (256 chains, dim_q 8006).
            return jax.vmap(lambda _: ad.welford_init(1, dtype, diagonal=True))(
                jnp.arange(num_chains)
            )
        return jax.vmap(
            lambda _: ad.welford_init(
                wf_dim, dtype, diagonal=(metric_type == "diagonal")
            )
        )(jnp.arange(num_chains))

    def finalize_metric(wf_merged):
        if metric_type == "diagonal":
            return ad.finalize_variance_metric(wf_merged)
        if metric_type == "dense":
            return ad.finalize_covariance_metric(wf_merged)
        return ad.finalize_block_diagonal_metric(wf_merged)

    q = init_pos
    keys = _split_keys(key, num_chains)
    metric = IdentityMetric()
    init_eps = jnp.full((num_chains,), init_step_size, dtype)
    counters = jax.vmap(lambda _: _init_counters())(jnp.arange(num_chains))
    traces_acc, stats_acc = [], []
    warm_done = 0
    main_done = 0
    step_size = jnp.asarray(init_step_size, dtype)

    if checkpoint_path and _os.path.exists(checkpoint_path):
        from manifold_mcmc_tpu.systems.metrics import (
            BlockDiagonalMetric,
            DenseMetric,
            DiagonalMetric,
        )

        metric_kinds = {
            "IdentityMetric": IdentityMetric,
            "DiagonalMetric": DiagonalMetric,
            "DenseMetric": DenseMetric,
            "BlockDiagonalMetric": BlockDiagonalMetric,
        }
        with onp.load(checkpoint_path, allow_pickle=False) as ck:
            warm_done = int(ck["warm_done"])
            main_done = int(ck["main_done"])
            q = jnp.asarray(ck["q"])
            keys = jnp.asarray(ck["keys"])
            step_size = jnp.asarray(ck["step_size"])
            da = ad.DualAveragingState(
                *(
                    jnp.asarray(ck[f"da_{f}"])
                    if f"da_{f}" in ck.files
                    # Field added after the checkpoint was written (e.g.
                    # log_step_max): resume unclamped rather than failing.
                    else jnp.full((num_chains,), jnp.inf, dtype)
                    for f in ad.DualAveragingState._fields
                )
            )
            wf = ad.WelfordState(
                *(jnp.asarray(ck[f"wf_{f}"]) for f in ad.WelfordState._fields)
            )
            kind = str(ck["metric_kind"])
            n_leaves = int(ck["metric_n_leaves"])
            leaves = [jnp.asarray(ck[f"metric_{i}"]) for i in range(n_leaves)]
            metric = metric_kinds[kind](*leaves)
            counters = {
                k: jnp.asarray(ck[f"counter_{k}"]) if f"counter_{k}" in ck else v
                for k, v in counters.items()
            }
            trc = {
                k[len("trc__"):]: ck[k] for k in ck.files if k.startswith("trc__")
            }
            stc = {
                k[len("stc__"):]: ck[k] for k in ck.files if k.startswith("stc__")
            }
            traces_acc = [trc] if trc else []
            stats_acc = [stc] if stc else []
    elif find_init_step_size and num_warm_up_iter > 0:
        # Host-driven Hoffman-Gelman doubling search.  Mirrors the in-graph
        # driver's ``stage_init`` exactly (same per-chain key split, momentum
        # draw, per-iteration float ops on the same dtype), so both drivers
        # consume identical RNG streams and produce bitwise-equal step
        # sizes.  The loop runs on the host with ONE small per-iteration
        # probe program rather than as a single in-graph ``while_loop`` over
        # full gradient evaluations: a monolithic search executable is large
        # enough to exhaust bounded remote-worker program memory, after
        # which every later program load fails with RESOURCE_EXHAUSTED
        # (observed deterministically at canonical noisy-obs shapes).
        @jax.jit
        def search_init(init_pos, keys, init_eps):
            def one(q0, chain_key, eps0):
                k_mom, k_run = _split_keys(chain_key, 2)
                point = integ.init(q0, jnp.zeros_like(q0), metric)
                point = point._replace(
                    mom=integ.sample_momentum(k_mom, point, metric)
                )
                h0 = integ.energy(point, metric)
                pt1, ok, _, _ = integ.step(point, eps0, metric)
                nd0 = h0 - integ.energy(pt1, metric)
                nd0 = jnp.where(ok & jnp.isfinite(nd0), nd0, -jnp.inf)
                direction = jnp.where(nd0 > jnp.log(0.5), 1.0, -1.0).astype(
                    dtype
                )
                return point, h0, nd0, direction, k_run

            return jax.vmap(one)(init_pos, keys, init_eps)

        @jax.jit
        def search_iter(point, h0, eps, nd, direction, i, active):
            def one(point, h0, eps, nd, direction, active):
                eps_next = jnp.where(active, eps * jnp.exp2(direction), eps)
                pt1, ok, _, _ = integ.step(point, eps_next, metric)
                nd1 = h0 - integ.energy(pt1, metric)
                nd1 = jnp.where(ok & jnp.isfinite(nd1), nd1, -jnp.inf)
                return eps_next, jnp.where(active, nd1, nd)

            eps, nd = jax.vmap(one)(point, h0, eps, nd, direction, active)
            i = i + active.astype(jnp.int32)
            active = (
                active
                & (direction * nd > direction * jnp.log(0.5))
                & (i < 30)
            )
            return eps, nd, i, active, jnp.sum(active)

        if clear_caches_between_stages:
            # Evict init-phase executables (data composition, chain-init
            # solves) from worker program memory before the search programs
            # load.
            jax.block_until_ready((q, keys, init_eps))
            jax.clear_caches()

        def _search_stage():
            # One retryable PURE unit over (q, keys, init_eps): a fault at
            # any of its ~30 small dispatches redoes the whole (cheap)
            # search; retry_transient's eviction path then reloads only the
            # two probe programs.
            point, h0, nd, direction, keys2 = search_init(q, keys, init_eps)
            eps = init_eps
            i = jnp.zeros((num_chains,), jnp.int32)
            active = (direction * nd > direction * jnp.log(0.5)) & (i < 30)
            while int(jax.device_get(jnp.sum(active))) > 0:
                eps, nd, i, active, _ = search_iter(
                    point, h0, eps, nd, direction, i, active
                )
            # One step back for the doubling direction so the final accept
            # probability is on the >1/2 side (as find_reasonable_step_size).
            eps = jnp.where(direction > 0, eps * 0.5, eps)
            da = jax.vmap(ad.dual_averaging_init)(eps)
            wf = fresh_welford()
            return da, wf, keys2

        if progress_every:
            print(
                "[hmc-host-loop] entering step-size search", flush=True
            )
        _t_search = _time.time()
        da, wf, keys = retry_transient(_search_stage, what="step-size search")
        if progress_every:
            print(
                f"[hmc-host-loop] step-size search done in "
                f"{_time.time() - _t_search:.0f}s (median eps "
                f"{float(jnp.median(jnp.exp(da.log_step))):.3g})",
                flush=True,
            )
        if clear_caches_between_stages:
            # Drop the search executables before the (large) tree-transition
            # programs load; they are never dispatched again.  Without this,
            # canonical noisy-obs shapes exhaust the bounded program memory
            # at the first warm iteration.
            jax.clear_caches()
    else:
        da = jax.vmap(ad.dual_averaging_init)(init_eps)
        wf = fresh_welford()

    def save_checkpoint():
        if not checkpoint_path:
            return
        retry_transient(_save_checkpoint_payload, what="checkpoint save")

    def _save_checkpoint_payload():
        payload = {
            "warm_done": warm_done,
            "main_done": main_done,
            "q": onp.asarray(q),
            "keys": onp.asarray(keys),
            "step_size": onp.asarray(step_size),
        }
        for f in ad.DualAveragingState._fields:
            payload[f"da_{f}"] = onp.asarray(getattr(da, f))
        for f in ad.WelfordState._fields:
            payload[f"wf_{f}"] = onp.asarray(getattr(wf, f))
        leaves = jax.tree_util.tree_leaves(metric)
        payload["metric_kind"] = type(metric).__name__
        payload["metric_n_leaves"] = len(leaves)
        for i, leaf in enumerate(leaves):
            payload[f"metric_{i}"] = onp.asarray(leaf)
        for k, v in counters.items():
            payload[f"counter_{k}"] = onp.asarray(v)
        for prefix, chunks in (("trc__", traces_acc), ("stc__", stats_acc)):
            for k, v in _concat_sweep_chunks(chunks).items():
                payload[prefix + k] = v
        tmp = checkpoint_path + ".tmp.npz"
        onp.savez(tmp, **payload)
        _os.replace(tmp, checkpoint_path)

    t_start = _time.time()
    it_global = 0
    deadline_hit = False

    def _past_deadline():
        return deadline_ts is not None and _time.time() >= deadline_ts

    def run_window(length, collect):
        nonlocal q, da, wf, keys, warm_done, it_global, deadline_hit
        for _ in range(length):
            if deadline_hit:
                return
            if it_global >= warm_done and _past_deadline():
                # Clean partial exit (mirrors the CHMC host loop): persist
                # and let the caller report the completed prefix; a rerun
                # resumes from this exact iteration.
                deadline_hit = True
                jax.block_until_ready(q)
                save_checkpoint()
                return
            if it_global < warm_done:
                # Fast-forward over iterations a previous process completed
                # (checkpoints are saved post-boundary, so skipped windows
                # need no replayed adaptation actions).
                it_global += 1
                continue
            q, da, wf, keys = retry_transient(
                lambda: warm_iter(q, da, wf, keys, metric, collect),
                what=f"warm iter {it_global + 1}",
            )
            it_global += 1
            warm_done = it_global
            if checkpoint_every and warm_done % checkpoint_every == 0:
                # Mid-window saves are safe: resuming re-enters the window
                # with the checkpointed Welford state, and a save landing
                # exactly on a window's last iteration re-executes the
                # boundary actions, which are idempotent (finalize of an
                # unchanged Welford state; dual-averaging re-init at the
                # smoothed step, its own fixed point).
                jax.block_until_ready(q)
                save_checkpoint()
            if progress_every and (
                warm_done % progress_every == 0 or warm_done == 1
            ):
                jax.block_until_ready(q)
                print(
                    f"[hmc-host-loop] warm iter {warm_done}/{num_warm_up_iter} "
                    f"({_time.time() - t_start:.0f}s)",
                    flush=True,
                )

    def maybe_checkpoint_warm():
        # Called after window-boundary actions so resumed state is always
        # post-boundary (see docstring).
        if checkpoint_every and warm_done == it_global:
            save_checkpoint()

    run_window(init_buffer, False)
    for w in slow_windows:
        if it_global >= warm_done:
            wf = fresh_welford()
        run_window(w, True)
        if warm_done == it_global and not deadline_hit:
            metric = finalize_metric(ad.welford_merge_chains(wf))
            da = jax.vmap(
                lambda d: ad.dual_averaging_init(
                jnp.exp(d.log_step_bar), jnp.exp(d.log_step_max)
            )
            )(da)
            maybe_checkpoint_warm()
    run_window(term_buffer, False)
    step_size = ad.dual_averaging_finalize(da)
    if (
        num_warm_up_iter > 0
        and warm_done == num_warm_up_iter
        and main_done == 0
        and not deadline_hit
    ):
        maybe_checkpoint_warm()

    for it in range(main_done, num_main_iter):
        if deadline_hit:
            break
        if _past_deadline():
            deadline_hit = True
            save_checkpoint()
            break

        def _main_unit(q=q, keys=keys, counters=counters):
            q2, keys2, counters2, tr, st = main_iter(
                q, keys, counters, metric, step_size
            )
            trc = {k: onp.asarray(v)[:, None] for k, v in tr.items()}
            stc = {k: onp.asarray(v)[:, None] for k, v in st.items()}
            return q2, keys2, counters2, trc, stc

        q, keys, counters, trc, stc = retry_transient(
            _main_unit, what=f"main iter {it + 1}"
        )
        traces_acc.append(trc)
        stats_acc.append(stc)
        main_done = it + 1
        if checkpoint_every and main_done % checkpoint_every == 0:
            save_checkpoint()
        if progress_every and main_done % progress_every == 0:
            print(
                f"[hmc-host-loop] main iter {main_done}/{num_main_iter} "
                f"({_time.time() - t_start:.0f}s)",
                flush=True,
            )

    merge = lambda chunks: {
        k: jnp.asarray(
            onp.concatenate([c[k] for c in chunks], axis=1)
        )
        for k in chunks[0].keys()
    } if chunks else {}
    return {
        "final_pos": q,
        "final_step_size": step_size,
        "final_metric": metric,
        "call_counters": counters,
        "traces": merge(traces_acc),
        "stats": merge(stats_acc),
        "timings": {},
        "partial": deadline_hit,
        "num_warm_up_done": warm_done,
        "num_main_done": main_done,
    }


def sample_chmc_chains_host_loop(
    system,
    init_pos,
    init_x_obs_seq,
    key,
    num_warm_up_iter,
    num_main_iter,
    projection_solver="newton",
    n_inner_step=1,
    reverse_check_tol=2e-8,
    constraint_tol=1e-9,
    position_tol=1e-8,
    divergence_tol=1e10,
    max_solver_iters=50,
    max_tree_depth=10,
    max_delta_h=1000.0,
    adapt_stat_target=0.8,
    step_size_reg_coefficient=0.05,
    trace_func=None,
    metric=IdentityMetric(),
    init_step_size=0.5,
    step_size_cliff_safety=0.5,
    checkpoint_path=None,
    checkpoint_every=16,
    progress_every=0,
    max_steps_per_dispatch=None,
    deadline_ts=None,
    pooled_step_adaptation=False,
):
    """CHMC driver with a *host-side* sweep loop and crash-durable checkpoints.

    Wraps the SAME per-chain sweep bodies as :func:`sample_chmc_chains`
    (:func:`_chmc_sweep_fns`, so the two drivers cannot drift semantically;
    solver/tree defaults are identical) but is structured for unstable
    accelerator runtimes: one small jitted program per (phase, partition)
    sub-iteration is compiled and reused, so each device dispatch is bounded
    in executable size AND execution duration (this tunnelled TPU runtime
    kills device executions beyond a few tens of seconds); the iteration
    loop runs on the host (dispatch overhead is negligible against
    multi-second sub-iterations at hundreds of chains), and the complete
    sampler state is checkpointed to ``.npz`` every ``checkpoint_every``
    sweeps so a crashed process resumes exactly where it stopped.  There is
    no in-graph step-size search; dual averaging adapts from
    ``init_step_size``.

    With ``max_steps_per_dispatch=K`` each device dispatch executes at most
    ``K`` constrained (RATTLE) integrator steps: the dynamic tree of every
    sub-iteration is built through the resumable :func:`nuts_chunk_init` /
    :func:`nuts_chunk_expand` / :func:`nuts_chunk_finalize` transition
    (integrator-agnostic, so the constrained integrator slots straight in),
    whose carry stays device-resident between dispatches.  A constrained
    step is 1-2 orders heavier than a Euclidean leapfrog step (projection
    solves inside), so even ``max_tree_depth=10`` trees (up to 1024 steps)
    overrun tunnelled-worker execution watchdogs when dispatched whole --
    the canonical noisy-obs CHMC runs require chunking.  RNG consumption is
    identical (``k_mom, k_tree = split(sub_key)`` then the same tree
    stream), so chunked and single-dispatch sweeps produce identical
    trajectories.

    ``deadline_ts`` (absolute ``time.time()`` seconds, optional) makes the
    loop *deadline-aware*: before dispatching each sweep the remaining wall
    clock is checked against the recent per-sweep cost, and on expiry the
    driver checkpoints and returns whatever has completed (``deadline_hit``
    True in the result) instead of being killed mid-flight with nothing --
    callers compute diagnostics on the completed prefix and a later
    invocation resumes from the checkpoint.

    ``pooled_step_adaptation=True`` dual-averages on the CROSS-CHAIN POOLED
    accept statistic instead of per-chain: every warm-up sub-iteration
    updates one shared step size from ``mean(accept_stat)`` over the whole
    fleet.  This is a fleet-scale variant the reference (4 serial chains)
    never had: at 1024 chains the per-iteration accept estimate is nearly
    noiseless (Monte-Carlo error shrinks ~1/sqrt(num_chains)), so the
    adaptation trajectory is deterministic-like and a single unlucky
    chain's zero-accept run cannot collapse the shared step.  The
    per-chain cliff clamp (``step_size_cliff_safety``) composes with it:
    pooled mode clamps at the FLEET-MEDIAN cliff probe, floored at the
    caller's ``init_step_size`` (one shared bound; the fleet-min variant
    was a measured failure mode -- a single degenerate probe froze the
    whole fleet at step ~0, see the inline comment at the clamp site and
    ``benchmarks/results/warmup_rehab_pooled_*.json``).  Checkpoint schema
    is unchanged -- the per-chain DualAveragingState rows simply stay
    identical.

    The result includes ``timings``: wall seconds per warm-up / main sweep
    (first element of each list includes that executable's compile), plus
    ``n_warm_sweeps_done`` / ``n_main_sweeps_done`` cumulative across
    resumes and the ``deadline_hit`` flag.
    """
    import os as _os
    import time as _time

    import numpy as onp

    num_chains = init_pos.shape[0]
    num_partition = system.num_partition
    dtype = init_pos.dtype
    trace_func = trace_func if trace_func is not None else lambda q: {}

    solver_cfg = dict(
        projection_solver=projection_solver,
        n_inner_step=n_inner_step,
        reverse_check_tol=reverse_check_tol,
        constraint_tol=constraint_tol,
        position_tol=position_tol,
        divergence_tol=divergence_tol,
        max_iters=max_solver_iters,
    )
    fns = _chmc_sweep_fns(
        system,
        metric,
        solver_cfg,
        max_tree_depth,
        max_delta_h,
        adapt_stat_target,
        step_size_reg_coefficient,
        trace_func,
    )
    warm_sub_iteration = fns["warm_sub_iteration"]
    main_sub_iteration = fns["main_sub_iteration"]

    # One jitted program per (phase, partition) sub-iteration rather than one
    # per sweep: each dispatch is 1/num_partition the duration and executable
    # size, which keeps runs under accelerator-runtime watchdog limits (this
    # tunnelled TPU runtime kills device executions beyond a few tens of
    # seconds -- see .claude/skills/verify/SKILL.md).  The RNG key schedule
    # (one split into num_partition+1 subkeys per sweep, matching
    # _chmc_sweep_fns) is preserved exactly, so results remain identical to
    # the in-graph driver.

    @jax.jit
    def split_sweep_keys(keys):
        all_keys = jax.vmap(lambda k: _split_keys(k, num_partition + 1))(keys)
        return all_keys[:, 0], all_keys[:, 1:]

    def make_warm_sub(p):
        if pooled_step_adaptation:
            sub_iteration = fns["sub_iteration"]

            def fn(q, x_obs, da, sub_key):
                # All DA rows are identical in pooled mode; every chain runs
                # the shared current step, then one update from the fleet-
                # pooled accept statistic is broadcast back to all rows.
                step = jnp.exp(da.log_step[0])
                q, x_obs, stats = jax.vmap(
                    lambda q1, x1, k1: sub_iteration(q1, x1, p, k1, step)
                )(q, x_obs, sub_key)
                pooled_accept = _finite_pooled_mean(stats["accept_stat"])
                da = jax.vmap(
                    lambda d: ad.dual_averaging_update(
                        d,
                        pooled_accept,
                        adapt_stat_target=adapt_stat_target,
                        reg_coefficient=step_size_reg_coefficient,
                    )
                )(da)
                return q, x_obs, da

        else:

            def fn(q, x_obs, da, sub_key):
                return jax.vmap(
                    lambda q, x_obs, da, k: warm_sub_iteration(q, x_obs, da, k, p)
                )(q, x_obs, da, sub_key)

        return jax.jit(fn)

    def make_main_sub(p):
        def fn(q, x_obs, step_size, sub_key, counters):
            return jax.vmap(
                lambda q, x_obs, k, c: main_sub_iteration(
                    q, x_obs, c, k, step_size, p
                )
            )(q, x_obs, sub_key, counters)

        return jax.jit(fn)

    warm_subs = [make_warm_sub(p) for p in range(num_partition)]
    main_subs = [make_main_sub(p) for p in range(num_partition)]

    def warm_sweep(q, x_obs, da, keys):
        keys, sub_keys = split_sweep_keys(keys)
        for p in range(num_partition):
            q, x_obs, da = warm_subs[p](q, x_obs, da, sub_keys[:, p])
        return q, x_obs, da, keys

    def main_sweep(q, x_obs, step_size, keys, counters):
        keys, sub_keys = split_sweep_keys(keys)
        traces, stats_out = [], []
        for p in range(num_partition):
            q, x_obs, counters, tr, st = main_subs[p](
                q, x_obs, step_size, sub_keys[:, p], counters
            )
            traces.append(tr)
            stats_out.append(st)
        # Stack the partition axis *after* the chain axis to match the
        # in-graph driver's (chains, partitions, ...) sweep layout.
        stack = lambda ds: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=1), *ds
        )
        return q, x_obs, keys, counters, stack(traces), stack(stats_out)

    if max_steps_per_dispatch is not None and max_steps_per_dispatch > 0:
        # Resumable-tree mode (mirrors sample_hmc_chains_host_loop): every
        # device dispatch advances each chain's constrained NUTS tree by at
        # most ``max_steps_per_dispatch`` RATTLE steps; the carry (tree +
        # in-flight subtree, constrained points included) stays device-
        # resident and the host reads back a single int per dispatch.
        def make_chunk_start(p):
            def fn(q, x_obs, sub_key):
                def one(q0, x0, k0):
                    integ = make_constrained_integrator(
                        system, x0, partition=p, **solver_cfg
                    )
                    k_mom, k_tree = _split_keys(k0, 2)
                    point = integ.init(q0, jnp.zeros_like(q0), metric)
                    point = point._replace(
                        mom=integ.sample_momentum(k_mom, point, metric)
                    )
                    return nuts_chunk_init(
                        integ, metric, point, k_tree, max_tree_depth
                    )

                return jax.vmap(one)(q, x_obs, sub_key)

            return jax.jit(fn)

        def make_chunk_expand(p):
            def fn(carry, x_obs, eps, budget):
                def one(c, x0, e):
                    integ = make_constrained_integrator(
                        system, x0, partition=p, **solver_cfg
                    )
                    return nuts_chunk_expand(
                        integ, metric, c, e, budget, max_tree_depth, max_delta_h
                    )

                out = jax.vmap(one)(carry, x_obs, eps)
                return out, jnp.sum(~out.done)

            return jax.jit(fn)

        chunk_starts = [make_chunk_start(p) for p in range(num_partition)]
        chunk_expands = [make_chunk_expand(p) for p in range(num_partition)]

        @jax.jit
        def _chunk_finish(carry):
            pos, _, stats = jax.vmap(nuts_chunk_finalize)(carry)
            x_obs = jax.vmap(system.generate_x_obs_seq)(pos)
            return pos, x_obs, stats

        @jax.jit
        def _warm_eps(da):
            return jnp.exp(da.log_step)

        @jax.jit
        def _bcast_eps(step_size):
            return jnp.broadcast_to(
                jnp.asarray(step_size, dtype), (num_chains,)
            )

        @jax.jit
        def _warm_post(da, stats):
            accept = stats["accept_stat"]
            if pooled_step_adaptation:
                # Fleet-pooled statistic broadcast to the (identical) rows;
                # finite-masked so one NaN accept cannot poison the fleet.
                accept = jnp.broadcast_to(
                    _finite_pooled_mean(accept), accept.shape
                )
            return jax.vmap(
                lambda d, a: ad.dual_averaging_update(
                    d,
                    a,
                    adapt_stat_target=adapt_stat_target,
                    reg_coefficient=step_size_reg_coefficient,
                )
            )(da, accept)

        @jax.jit
        def _main_post(q1, counters, stats):
            def one(q0, c0, s0):
                c1 = _update_counters(c0, s0)
                return c1, {**trace_func(q0), **c1}

            return jax.vmap(one)(q1, counters, stats)

        _tree_log = bool(_os.environ.get("MMT_TREE_LOG"))

        def _run_sub_transition(q, x_obs, sub_key, eps, p):
            carry = chunk_starts[p](q, x_obs, sub_key)
            budget = jnp.array(int(max_steps_per_dispatch), jnp.int32)
            rounds = 0
            t0 = _time.time()
            while True:
                carry, n_active = chunk_expands[p](carry, x_obs, eps, budget)
                rounds += 1
                n = int(jax.device_get(n_active))
                if _tree_log and rounds % 8 == 0:
                    print(
                        f"[chmc-host-loop] tree p{p}: {rounds} dispatches "
                        f"(<= {rounds * int(max_steps_per_dispatch)} steps), "
                        f"{n} chains active, {_time.time() - t0:.0f}s",
                        flush=True,
                    )
                if n == 0:
                    break
            return _chunk_finish(carry)

        def warm_sweep(q, x_obs, da, keys):  # noqa: F811
            keys, sub_keys = split_sweep_keys(keys)
            for p in range(num_partition):
                q, x_obs, stats = _run_sub_transition(
                    q, x_obs, sub_keys[:, p], _warm_eps(da), p
                )
                da = _warm_post(da, stats)
            return q, x_obs, da, keys

        def main_sweep(q, x_obs, step_size, keys, counters):  # noqa: F811
            keys, sub_keys = split_sweep_keys(keys)
            eps = _bcast_eps(step_size)
            traces, stats_out = [], []
            for p in range(num_partition):
                q, x_obs, stats = _run_sub_transition(
                    q, x_obs, sub_keys[:, p], eps, p
                )
                counters, tr = _main_post(q, counters, stats)
                traces.append(tr)
                stats_out.append(stats)
            stack = lambda ds: jax.tree_util.tree_map(  # noqa: E731
                lambda *xs: jnp.stack(xs, axis=1), *ds
            )
            return q, x_obs, keys, counters, stack(traces), stack(stats_out)

    n_warm_sweeps = math.ceil(num_warm_up_iter / num_partition)
    n_main_sweeps = math.ceil(num_main_iter / num_partition)

    # ------------------------- resume / fresh start -------------------- #
    start_sweep = 0
    trace_chunks, stats_chunks = [], []
    # Per-sweep wall times measured by EARLIER processes that wrote this
    # checkpoint, already cleaned of each process's first sweep (which pays
    # the executable load/compile).  Persisting them makes the checkpoint
    # self-describing for timing: a watchdog salvaging a result from the
    # file alone (bench.py) can compute the per-sweep rate without having
    # observed any dispatch itself.
    prev_clean_main_times, prev_clean_warm_times = [], []
    counters = jax.vmap(lambda _: _init_counters())(jnp.arange(num_chains))
    if checkpoint_path and _os.path.exists(checkpoint_path):
        with onp.load(checkpoint_path, allow_pickle=True) as ck:
            start_sweep = int(ck["sweep"])
            if "clean_main_times" in ck.files:
                prev_clean_main_times = list(ck["clean_main_times"])
            if "clean_warm_times" in ck.files:
                prev_clean_warm_times = list(ck["clean_warm_times"])
            q = jnp.asarray(ck["q"])
            x_obs = jnp.asarray(ck["x_obs"])
            keys = jnp.asarray(ck["keys"])
            da = ad.DualAveragingState(
                *(
                    jnp.asarray(ck[f"da_{f}"])
                    if f"da_{f}" in ck.files
                    # Field added after the checkpoint was written (e.g.
                    # log_step_max): resume unclamped rather than failing.
                    else jnp.full((num_chains,), jnp.inf, dtype)
                    for f in ad.DualAveragingState._fields
                )
            )
            step_size = jnp.asarray(ck["step_size"])
            # Accumulated main-phase output is stored per key as one plain
            # (chains, sweeps_so_far, partitions, ...) array -- no pickled
            # object arrays in the checkpoint.
            trc = {
                k[len("trc__"):]: ck[k] for k in ck.files if k.startswith("trc__")
            }
            stc = {
                k[len("stc__"):]: ck[k] for k in ck.files if k.startswith("stc__")
            }
            trace_chunks = [trc] if trc else []
            stats_chunks = [stc] if stc else []
            counters = {
                k: jnp.asarray(ck[f"counter_{k}"]) if f"counter_{k}" in ck else v
                for k, v in counters.items()
            }
    else:
        q, x_obs = init_pos, init_x_obs_seq
        keys = _split_keys(key, num_chains)
        init_eps = jnp.full((num_chains,), init_step_size, dtype)
        if step_size_cliff_safety is None or num_warm_up_iter == 0:
            da = jax.vmap(ad.dual_averaging_init)(init_eps)
        else:
            # Failure-cliff ceiling for dual averaging (same probe and key
            # derivation as the in-graph driver's, so the two drivers adapt
            # identically): one extra bounded dispatch on fresh start only.
            @jax.jit
            def _cliff_probe(qs, xs, ks, eps):
                def per_chain(q0, x_obs0, chain_key, eps0):
                    integ0 = make_constrained_integrator(
                        system, x_obs0, partition=0, **solver_cfg
                    )
                    k_mom = jax.random.fold_in(chain_key, 13)
                    point = integ0.init(q0, jnp.zeros_like(q0), metric)
                    point = point._replace(
                        mom=integ0.sample_momentum(k_mom, point, metric)
                    )
                    cliff = find_step_size_cliff(integ0, metric, point, eps0)
                    return step_size_cliff_safety * cliff

                return jax.vmap(per_chain)(qs, xs, ks, eps)

            cliff = retry_transient(
                lambda: _cliff_probe(q, x_obs, keys, init_eps),
                what="cliff probe",
            )
            if pooled_step_adaptation:
                # One shared step bound, calibrated to the FLEET MEDIAN
                # probe (x step_size_cliff_safety, applied by the caller's
                # fraction inside _cliff_probe).  Not the minimum: with
                # ~1000 chains the min is the worst outlier -- one chain
                # whose probe collapses to ~0 drives the shared bound to 0
                # and freezes the whole fleet (measured, round-4 rehab
                # takes 1-2).  Not a low quantile either: the per-solve
                # failure tail is intrinsic (~3-5% of solves fail at ANY
                # step -- solver_tail_probe JSON), so low quantiles of the
                # single-step probe read far below steps the fleet
                # demonstrably sustains (p05 landed under 0.05 while the
                # fleet runs at 0.23 with accept 0.83; take 3 pinned at its
                # floor).  Floored at the caller's init step so adaptation
                # is never clamped below its own starting point.
                shared = jnp.maximum(
                    jnp.median(cliff), jnp.asarray(init_step_size, dtype)
                )
                cliff = jnp.full_like(cliff, shared)
            da = jax.vmap(ad.dual_averaging_init)(init_eps, cliff)
        step_size = jnp.asarray(init_step_size, dtype)

    def save(sweep):
        if not checkpoint_path:
            return
        retry_transient(lambda: _save_payload(sweep), what="checkpoint save")

    def _save_payload(sweep):
        payload = {
            "sweep": sweep,
            "q": onp.asarray(q),
            "x_obs": onp.asarray(x_obs),
            "keys": onp.asarray(keys),
            "step_size": onp.asarray(step_size),
        }
        for prefix, chunks in (("trc__", trace_chunks), ("stc__", stats_chunks)):
            for k, v in _concat_sweep_chunks(chunks).items():
                payload[prefix + k] = v
        for f in ad.DualAveragingState._fields:
            payload[f"da_{f}"] = onp.asarray(getattr(da, f))
        for k, v in counters.items():
            payload[f"counter_{k}"] = onp.asarray(v)
        payload["clean_main_times"] = onp.asarray(
            prev_clean_main_times + main_times[1:], onp.float64
        )
        payload["clean_warm_times"] = onp.asarray(
            prev_clean_warm_times + warm_times[1:], onp.float64
        )
        tmp = checkpoint_path + ".tmp.npz"
        onp.savez(tmp, **payload)
        _os.replace(tmp, checkpoint_path)

    warm_times, main_times = [], []
    t_start = _time.time()
    deadline_hit = False

    def out_of_time():
        """True when the next sweep would overrun the deadline.

        Budgets the *next* sweep from the MEDIAN of recent *non-first*
        sweeps (each process's first warm/main sweep embeds its executable
        compile/load, often 100x a steady-state sweep, and budgeting from
        that outlier made the loop stop ~10 minutes early after a long cold
        compile -- round-3 scaling study).  The median, unlike the minimum,
        is robust against a single fast outlier defeating the deadline on a
        slowing chip (the tunnelled runtime swings ~6x run-to-run); a 1.25x
        safety factor covers residual drift, and the caller's
        watchdog/salvage path covers any remaining overrun.  Clean sweep
        times persisted by earlier processes of a resumed run seed the
        estimate before this process has timed anything itself.
        """
        if deadline_ts is None:
            return False
        clean = (
            prev_clean_warm_times
            + warm_times[1:]
            + prev_clean_main_times
            + main_times[1:]
        )
        recent = clean[-5:] if clean else (warm_times + main_times)[-3:]
        per_sweep = float(onp.median(recent)) if recent else 30.0
        return _time.time() + 1.25 * per_sweep + 15.0 > deadline_ts

    warm_done = min(start_sweep, n_warm_sweeps)
    for sweep in range(warm_done, n_warm_sweeps):
        if out_of_time():
            deadline_hit = True
            break
        t0 = _time.time()
        q, x_obs, da, keys = retry_transient(
            lambda: warm_sweep(q, x_obs, da, keys),
            what=f"warm sweep {sweep + 1}",
        )
        warm_times.append(_time.time() - t0)
        warm_done = sweep + 1
        if checkpoint_every and (sweep + 1) % checkpoint_every == 0:
            step_size = ad.dual_averaging_finalize(da)
            save(sweep + 1)
        if progress_every and (sweep + 1) % progress_every == 0:
            print(
                f"[host-loop] warm sweep {sweep + 1}/{n_warm_sweeps} "
                f"({_time.time() - t_start:.0f}s)",
                flush=True,
            )
    step_size = ad.dual_averaging_finalize(da)
    if deadline_hit:
        save(warm_done)

    main_done = max(start_sweep - n_warm_sweeps, 0)
    for sweep in range(main_done, n_main_sweeps if not deadline_hit else main_done):
        if out_of_time():
            deadline_hit = True
            save(n_warm_sweeps + sweep)
            break
        t0 = _time.time()

        def _main_unit(q=q, x_obs=x_obs, keys=keys, counters=counters):
            # Host conversion happens inside the retried unit: a transfer of
            # a healthy buffer can itself fault transiently, and re-running
            # the (pure) sweep from its unchanged inputs is exact.
            q2, x_obs2, keys2, counters2, traces, stats = main_sweep(
                q, x_obs, step_size, keys, counters
            )
            # Store each sweep as (chains, 1, partitions, ...) so chunks of
            # any sweep count concatenate uniformly (checkpoint restore loads
            # the accumulated history as one multi-sweep chunk).
            tr = {k: onp.asarray(v)[:, None] for k, v in traces.items()}
            st = {k: onp.asarray(v)[:, None] for k, v in stats.items()}
            return q2, x_obs2, keys2, counters2, tr, st

        q, x_obs, keys, counters, tr_chunk, st_chunk = retry_transient(
            _main_unit, what=f"main sweep {sweep + 1}"
        )
        trace_chunks.append(tr_chunk)
        stats_chunks.append(st_chunk)
        main_times.append(_time.time() - t0)
        main_done = sweep + 1
        if checkpoint_every and (sweep + 1) % checkpoint_every == 0:
            save(n_warm_sweeps + sweep + 1)
        if progress_every and (sweep + 1) % progress_every == 0:
            print(
                f"[host-loop] main sweep {sweep + 1}/{n_main_sweeps} "
                f"({_time.time() - t_start:.0f}s)",
                flush=True,
            )

    def concat_chunks(chunks):
        merged = _concat_sweep_chunks(chunks)
        # (chains, sweeps, partitions, ...) -> (chains, iters, ...)
        return {
            k: v.reshape((num_chains, -1) + v.shape[3:]) for k, v in merged.items()
        }

    return {
        "final_pos": q,
        "final_x_obs_seq": x_obs,
        "final_step_size": step_size,
        "call_counters": counters,
        "traces": concat_chunks(trace_chunks),
        "stats": concat_chunks(stats_chunks),
        "timings": {
            "warm_sweep_s": warm_times,
            "main_sweep_s": main_times,
            # Accumulated compile-free per-sweep wall times across ALL
            # processes that contributed to this run (resumed checkpoints
            # persist theirs): the authoritative source for steady-state
            # per-sweep cost, usable even when THIS process dispatched zero
            # or one fresh sweep (bench.py resumed-checkpoint timing).
            "clean_main_sweep_s": list(prev_clean_main_times) + main_times[1:],
            "clean_warm_sweep_s": list(prev_clean_warm_times) + warm_times[1:],
        },
        "n_warm_sweeps_done": warm_done,
        "n_main_sweeps_done": main_done,
        "n_warm_sweeps": n_warm_sweeps,
        "n_main_sweeps": n_main_sweeps,
        "deadline_hit": deadline_hit,
    }
