"""Gradient-descent based constraint-satisfying initialisation.

Rebuilds of the two Adam-based initialisers of the reference:

* :func:`find_initial_state_by_gradient_descent` (reference
  ``sde/mici_extensions.py:1550-1676``, noiseless observations): minimise a
  relaxed objective ``mean(c^2)/2 + reg * mean(q^2)/2`` built from
  per-observation-interval shooting residuals, then polish with a Newton
  projection onto the exact manifold.
* :func:`find_initial_state_by_gradient_descent_noisy_system` (reference
  ``:1679-1801``, noisy observations): descend the exact posterior negative
  log density until the mean squared residual drops below a threshold, then
  absorb the remaining residuals into the observation-noise coordinates --
  exactly on the manifold by construction.

Both run Adam through ``optax`` with the optimisation loop on the host and a
jitted, chain-vmapped update step (initialisation is off the sampling hot
path; retries with fresh random starts mirror the reference's behaviour but
operate per chain through failure masks).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

__all__ = [
    "find_initial_state_by_gradient_descent",
    "find_initial_state_by_gradient_descent_noisy_system",
    "find_initial_states_by_gradient_descent",
    "find_initial_states_by_gradient_descent_noisy_system",
]

logger = logging.getLogger(__name__)


def _adam_update(g, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """One hand-rolled Adam step (per-chain state under vmap-style batching).

    optax's counter is global to the update call; restart semantics here need
    a PER-CHAIN step count (a restarted chain's bias correction must begin
    anew, as the reference's fresh ``opt.init`` does), so the three state
    pieces (m, v, t) are explicit arrays with a leading chain axis.
    """
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g**2
    t = t + 1
    mhat = m / (1.0 - b1**t)
    vhat = v / (1.0 - b2**t)
    return lr * mhat / (jnp.sqrt(vhat) + eps), m, v, t


def _shooting_objective(system, reg_coeff):
    """Relaxed objective: per-interval final-state mismatch + prior pull."""
    md = system.model_dict
    layout = system.layout
    S = md["num_steps_per_obs"]

    def objective(q, x_obs_seq):
        u, v_0, v_seq, _ = layout.split_q(q)
        z = md["generate_z"](u)
        x_0 = md["generate_x_0"](z, v_0)
        v_blocks = v_seq.reshape((layout.num_obs, S, layout.dim_v))
        x_inits = jnp.concatenate([x_0[None], x_obs_seq[:-1]], axis=0)

        def final_state(x0, vs):
            def body(x, v):
                x_n = md["forward_func"](z, x, v, md["delta"])
                return x_n, None

            return jax.lax.scan(body, x0, vs)[0]

        c = jax.vmap(final_state)(x_inits, v_blocks) - x_obs_seq
        return 0.5 * jnp.mean(c**2) + 0.5 * reg_coeff * jnp.mean(q**2), c

    return objective


def find_initial_state_by_gradient_descent(
    system,
    key,
    x_obs_seq_init_func,
    tol=1e-9,
    adam_step_size=2e-1,
    reg_coeff=2e-2,
    coarse_tol=1e-1,
    max_iters=1000,
    max_num_tries=10,
    use_newton=True,
):
    """Find one on-manifold ``(q, x_obs_seq)`` via relaxed descent + projection.

    ``x_obs_seq_init_func(key)`` supplies observation-consistent target
    states for each attempt.
    """
    layout = system.layout
    objective = _shooting_objective(system, reg_coeff)
    opt = optax.adam(adam_step_size)
    val_grad = jax.jit(jax.value_and_grad(objective, has_aux=True))

    @jax.jit
    def adam_step(q, opt_state, x_obs_seq):
        (obj, c), grad = val_grad(q, x_obs_seq)
        updates, opt_state = opt.update(grad, opt_state)
        return optax.apply_updates(q, updates), opt_state, obj, c

    for attempt in range(max_num_tries):
        key, k_q, k_x = jax.random.split(key, 3)
        q = jax.random.normal(k_q, (layout.dim_q,))
        x_obs_seq = x_obs_seq_init_func(k_x)
        opt_state = opt.init(q)
        for i in range(max_iters):
            q_next, opt_state, obj, c = adam_step(q, opt_state, x_obs_seq)
            if not np.isfinite(float(obj)):
                logger.info("Adam iteration diverged; restarting")
                break
            max_abs_c = float(jnp.max(jnp.abs(c)))
            if max_abs_c < coarse_tol:
                jac = system.jacob_constr_blocks(q, x_obs_seq, 0)
                if use_newton:
                    res = system.newton_projection(
                        q, x_obs_seq, jac, 1.0, constraint_tol=tol
                    )
                else:
                    chol = system.chol_gram_blocks(jac)
                    res = system.quasi_newton_projection(
                        q, x_obs_seq, jac, chol, 1.0, constraint_tol=tol
                    )
                final_c = system.constr(res.pos, x_obs_seq, 0)
                if bool(res.converged) and float(jnp.max(jnp.abs(final_c))) < tol:
                    logger.info("Found constraint-satisfying state")
                    return res.pos, x_obs_seq
                break
            if i % 100 == 0:
                logger.info(
                    "attempt %d iter %d: obj=%.3e max|c|=%.3e",
                    attempt,
                    i,
                    float(obj),
                    max_abs_c,
                )
            q = q_next
    raise RuntimeError(f"Did not find valid state in {max_num_tries} tries.")


def find_initial_states_by_gradient_descent(
    system,
    key,
    x_obs_seq_init_func,
    num_chains,
    tol=1e-9,
    adam_step_size=2e-1,
    reg_coeff=2e-2,
    coarse_tol=1e-1,
    max_iters=1000,
    max_num_tries=10,
    use_newton=True,
    block_iters=100,
):
    """Chain-vmapped noiseless-obs initialisation: one jitted Adam loop for
    the whole fleet, then one batched projection polish.

    In-graph rebuild of the reference's per-chain host loop
    (``sde/mici_extensions.py:1550-1676``): all chains descend the relaxed
    shooting objective together inside ``lax.scan`` blocks of ``block_iters``
    steps (bounding each device dispatch under accelerator watchdogs), with
    per-chain convergence masks freezing finished chains; the host polls the
    masks between blocks.  Failed chains (divergence, no coarse convergence,
    or projection failure) are redrawn and retried -- only as a masked
    re-descent, never one dispatch per chain.

    Returns ``(q, x_obs_seq)`` with leading chain axes.
    """
    layout = system.layout
    dtype = system.y_seq.dtype
    objective = _shooting_objective(system, reg_coeff)
    batched_objective = jax.vmap(jax.value_and_grad(objective, has_aux=True))

    @jax.jit
    def adam_block(q, m, v, t, x_obs, active):
        def step(carry, _):
            q, m, v, t, active = carry
            (obj, c), g = batched_objective(q, x_obs)
            max_c = jnp.max(jnp.abs(c.reshape(num_chains, -1)), axis=1)
            finite = jnp.isfinite(obj)
            still = active & finite & (max_c >= coarse_tol)
            delta, m1, v1, t1 = _adam_update(g, m, v, t, adam_step_size)
            mask = still[:, None]
            q = jnp.where(mask, q - delta, q)
            m = jnp.where(mask, m1, m)
            v = jnp.where(mask, v1, v)
            t = jnp.where(mask, t1, t)
            # A chain leaves the active set for good reasons (coarse
            # convergence) or bad (divergence); the polish step separates
            # them via the final constraint values.
            return (q, m, v, t, still), None

        return lax.scan(step, (q, m, v, t, active), None, length=block_iters)[0]

    @jax.jit
    def polish(q, x_obs):
        def one(q, x_obs):
            jac = system.jacob_constr_blocks(q, x_obs, 0)
            if use_newton:
                res = system.newton_projection(
                    q, x_obs, jac, 1.0, constraint_tol=tol
                )
            else:
                chol = system.chol_gram_blocks(jac)
                res = system.quasi_newton_projection(
                    q, x_obs, jac, chol, 1.0, constraint_tol=tol
                )
            final_c = system.constr(res.pos, x_obs, 0)
            ok = res.converged & (jnp.max(jnp.abs(final_c)) < tol)
            return res.pos, ok

        return jax.vmap(one)(q, x_obs)

    q_out = jnp.zeros((num_chains, layout.dim_q), dtype)
    x_obs_out = None
    ok = np.zeros((num_chains,), bool)
    for attempt in range(max_num_tries):
        key, k_q, k_x = jax.random.split(key, 3)
        q_fresh = jax.random.normal(k_q, (num_chains, layout.dim_q), dtype)
        x_obs_fresh = jax.vmap(x_obs_seq_init_func)(
            jax.random.split(k_x, num_chains)
        )
        ok_dev = jnp.asarray(ok)
        q = jnp.where(ok_dev[:, None], q_out, q_fresh)
        if x_obs_out is None:
            x_obs_out = x_obs_fresh
        mask_x = ok_dev.reshape((num_chains,) + (1,) * (x_obs_fresh.ndim - 1))
        x_obs = jnp.where(mask_x, x_obs_out, x_obs_fresh)
        m = jnp.zeros_like(q)
        v = jnp.zeros_like(q)
        t = jnp.zeros((num_chains, 1), dtype)
        active = jnp.asarray(~ok)
        for _ in range(max(1, max_iters // block_iters)):
            q, m, v, t, active = adam_block(q, m, v, t, x_obs, active)
            if not bool(jnp.any(active)):
                break
        q_polished, polish_ok = polish(q, x_obs)
        newly_ok = np.asarray(polish_ok) & ~ok
        q_out = jnp.where(jnp.asarray(newly_ok)[:, None], q_polished, q_out)
        x_obs_out = jnp.where(mask_x, x_obs_out, x_obs)
        ok |= newly_ok
        logger.info(
            "batched init attempt %d: %d/%d chains on manifold",
            attempt,
            int(ok.sum()),
            num_chains,
        )
        if ok.all():
            return q_out, x_obs_out
    raise RuntimeError(
        f"{int((~ok).sum())} chains failed to initialise in "
        f"{max_num_tries} tries."
    )


def find_initial_state_by_gradient_descent_noisy_system(
    system,
    key,
    adam_step_size=2e-2,
    max_iters=1000,
    max_init_tries=100,
    max_num_tries=10,
    threshold=1.0,
    slow_progress_ratio=0.8,
    check_iter=100,
):
    """Noisy-observation initialisation: descend the posterior, absorb residuals.

    Returns ``(q, x_obs_seq)`` with the observation-noise coordinates set to
    the standardised residuals so the constraint holds exactly.
    """
    md = system.model_dict
    layout = system.layout
    if not layout.noisy:
        raise ValueError("requires a noisy-observation system")
    dim_core = layout.dim_q_core
    S = md["num_steps_per_obs"]

    @jax.jit
    def objective(u_v):
        u = u_v[: layout.dim_u]
        v_0 = u_v[layout.dim_u : layout.dim_u + layout.dim_v_0]
        v_seq = u_v[layout.dim_u + layout.dim_v_0 :].reshape((-1, layout.dim_v))
        z = md["generate_z"](u)
        x_0 = md["generate_x_0"](z, v_0)
        sigma = md["generate_sigma"](u)

        def body(x, v):
            x_n = md["forward_func"](z, x, v, md["delta"])
            return x_n, x_n

        _, x_seq = jax.lax.scan(body, x_0, v_seq)
        residuals = (md["y_seq"] - md["obs_func"](x_seq[S - 1 :: S])) / sigma
        nld = (
            0.5 * jnp.sum(residuals**2)
            + layout.num_obs * jnp.log(sigma)
            + 0.5 * jnp.sum(u_v**2)
        )
        return nld, residuals

    grad_obj = jax.jit(jax.grad(lambda uv: objective(uv)[0], has_aux=False))
    opt = optax.adam(adam_step_size)

    @jax.jit
    def adam_step(u_v, opt_state):
        # Residuals evaluated at the *current* point so that, on success, the
        # observation-noise coordinates absorbed into q are exactly
        # consistent with u_v (reference mici_extensions.py:1743-1748).
        _, residuals = objective(u_v)
        updates, opt_state = opt.update(grad_obj(u_v), opt_state)
        u_v_next = optax.apply_updates(u_v, updates)
        return u_v_next, opt_state, residuals

    for attempt in range(max_num_tries):
        u_v, residuals = None, None
        for _ in range(max_init_tries):
            key, k = jax.random.split(key)
            candidate = jax.random.normal(k, (dim_core,))
            _, r = objective(candidate)
            if bool(jnp.all(jnp.isfinite(r))):
                u_v, residuals = candidate, r
                break
        if u_v is None:
            raise RuntimeError(
                f"No finite-residual start in {max_init_tries} tries."
            )
        opt_state = opt.init(u_v)
        prev_msr = float(jnp.mean(residuals**2))
        for i in range(max_iters):
            u_v_next, opt_state, residuals = adam_step(u_v, opt_state)
            msr = float(jnp.mean(residuals**2))
            if not np.isfinite(msr):
                logger.info("Adam iteration diverged; restarting")
                break
            if msr < threshold:
                q = jnp.concatenate([u_v, residuals.reshape(-1)])
                x_obs_seq = system.generate_x_obs_seq(q)
                logger.info("Found state with mean sq. residual %.3f", msr)
                return q, x_obs_seq
            u_v = u_v_next
            if i % check_iter == 0 and 0 < i < max_iters // 2:
                if msr / prev_msr > slow_progress_ratio:
                    logger.info("Slow progress; restarting")
                    break
                prev_msr = msr
    raise RuntimeError(f"Did not find valid state in {max_num_tries} tries.")


def _restart_mask(done, msr_now, msr_prev, iters_since, max_iters, slow_ratio):
    """Which chains to redraw at a block boundary (host-side, NumPy).

    Mirrors the reference's per-try restart rules
    (``sde/mici_extensions.py:1750-1795``): an unconverged chain restarts
    (a) on slow progress — block-over-block mean-squared-residual ratio
    above ``slow_ratio`` (or non-finite) — while still in the first half of
    its try (``iters_since < max_iters // 2``), or (b) unconditionally once
    ``iters_since >= max_iters`` (the reference's outer try boundary).
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = msr_now / msr_prev
    slow = ~np.isfinite(ratio) | (ratio > slow_ratio)
    return ~done & (
        (slow & (iters_since < max_iters // 2)) | (iters_since >= max_iters)
    )


def find_initial_states_by_gradient_descent_noisy_system(
    system,
    key,
    num_chains,
    adam_step_size=2e-2,
    max_iters=1000,
    max_num_tries=10,
    threshold=1.0,
    slow_progress_ratio=0.8,
    check_iter=100,
):
    """Chain-vmapped noisy-obs initialisation (one Adam loop for the fleet).

    In-graph rebuild of the reference's per-chain host loop
    (``sde/mici_extensions.py:1679-1801``): every chain descends the exact
    posterior negative log density together inside ``lax.scan`` blocks of
    ``check_iter`` steps; a chain is done once its mean squared residual
    drops below ``threshold`` (the residuals are then absorbed into the
    observation-noise coordinates, putting it exactly on the manifold).
    Per-chain restart semantics match the reference: a diverging chain
    redraws its start in-graph on the next step; at block boundaries the
    host redraws chains whose progress ratio exceeds ``slow_progress_ratio``
    within the first half of their current try, and unconditionally once a
    chain's try budget of ``max_iters`` iterations is spent (the reference's
    outer try loop).  Every restart zeroes that chain's Adam state.  Total
    Adam iterations are bounded by ``max_num_tries * max_iters``.

    Returns ``(q, x_obs_seq)`` with leading chain axes.
    """
    md = system.model_dict
    layout = system.layout
    if not layout.noisy:
        raise ValueError("requires a noisy-observation system")
    dim_core = layout.dim_q_core
    S = md["num_steps_per_obs"]
    dtype = system.y_seq.dtype

    def objective(u_v):
        u = u_v[: layout.dim_u]
        v_0 = u_v[layout.dim_u : layout.dim_u + layout.dim_v_0]
        v_seq = u_v[layout.dim_u + layout.dim_v_0 :].reshape((-1, layout.dim_v))
        z = md["generate_z"](u)
        x_0 = md["generate_x_0"](z, v_0)
        sigma = md["generate_sigma"](u)

        def body(x, v):
            x_n = md["forward_func"](z, x, v, md["delta"])
            return x_n, x_n

        _, x_seq = lax.scan(body, x_0, v_seq)
        residuals = (md["y_seq"] - md["obs_func"](x_seq[S - 1 :: S])) / sigma
        nld = (
            0.5 * jnp.sum(residuals**2)
            + layout.num_obs * jnp.log(sigma)
            + 0.5 * jnp.sum(u_v**2)
        )
        return nld, residuals

    grad_obj = jax.vmap(
        jax.value_and_grad(objective, has_aux=True)
    )

    @jax.jit
    def adam_block(carry):
        def step(carry, _):
            u_v, m, v, t, keys, done, q_out, msr_last = carry
            (nld, residuals), g = grad_obj(u_v)
            msr = jnp.mean(
                residuals.reshape(num_chains, -1) ** 2, axis=1
            )
            finite = jnp.isfinite(msr) & jnp.isfinite(nld)
            newly_done = ~done & finite & (msr < threshold)
            q_cand = jnp.concatenate(
                [u_v, residuals.reshape(num_chains, -1)], axis=1
            )
            q_out = jnp.where(newly_done[:, None], q_cand, q_out)
            done = done | newly_done
            active = ~done & finite
            # Per-chain divergence restart: redraw in place with a fresh key
            # and zeroed Adam state (reference restarts the attempt loop).
            restart = ~done & ~finite
            keys_next = jax.vmap(jax.random.split)(keys)
            fresh = jax.vmap(
                lambda k: jax.random.normal(k, (dim_core,), dtype)
            )(keys_next[:, 0])
            delta, m1, v1, t1 = _adam_update(g, m, v, t, adam_step_size)
            a = active[:, None]
            r = restart[:, None]
            u_v = jnp.where(r, fresh, jnp.where(a, u_v - delta, u_v))
            m = jnp.where(r, 0.0, jnp.where(a, m1, m))
            v = jnp.where(r, 0.0, jnp.where(a, v1, v))
            t = jnp.where(r, 0.0, jnp.where(a, t1, t))
            keys = jnp.where(r[:, :1], keys_next[:, 1], keys)
            msr_last = jnp.where(done | ~finite, msr_last, msr)
            return (u_v, m, v, t, keys, done, q_out, msr_last), None

        return lax.scan(step, carry, None, length=check_iter)[0]

    key, k0 = jax.random.split(key)
    u_v = jax.random.normal(k0, (num_chains, dim_core), dtype)
    m = jnp.zeros_like(u_v)
    v = jnp.zeros_like(u_v)
    t = jnp.zeros((num_chains, 1), dtype)
    keys = jax.random.split(key, num_chains)
    done = jnp.zeros((num_chains,), bool)
    q_out = jnp.zeros((num_chains, layout.dim_q), dtype)
    msr_prev = jnp.full((num_chains,), jnp.inf, dtype)
    carry = (u_v, m, v, t, keys, done, q_out, msr_prev)

    n_blocks = max(1, (max_num_tries * max_iters) // check_iter)
    for block in range(n_blocks):
        carry = adam_block(carry)
        u_v, m, v, t, keys, done, q_out, msr_now = carry
        if bool(jnp.all(done)):
            break
        # Restart semantics mirroring the reference's per-try loop
        # (``:1750-1795``): a chain is redrawn fresh either (a) on slow
        # progress — residual ratio over the last block above the threshold
        # — but only within the FIRST HALF of its current try (``i <
        # max_iters // 2``), or (b) unconditionally once its try budget of
        # ``max_iters`` Adam iterations is spent (the reference's outer
        # ``for t in range(max_num_tries)`` boundary).  Without (b) a chain
        # that keeps making nominal progress from a hopeless basin grinds
        # the whole global budget and the fleet init fails (observed: 2/256
        # chains stuck for 22+ blocks on SIR noisy-obs).  The per-chain Adam
        # step count ``t`` is exactly iterations-since-last-restart (zeroed
        # on every restart path), so it doubles as the try clock.
        if block > 0:
            stalled = _restart_mask(
                np.asarray(done),
                np.asarray(msr_now),
                np.asarray(msr_prev_host),
                np.asarray(t[:, 0]),
                max_iters,
                slow_progress_ratio,
            )
            if stalled.any():
                stalled_dev = jnp.asarray(stalled)[:, None]
                key, k_f = jax.random.split(key)
                fresh = jax.random.normal(k_f, (num_chains, dim_core), dtype)
                u_v = jnp.where(stalled_dev, fresh, u_v)
                m = jnp.where(stalled_dev, 0.0, m)
                v = jnp.where(stalled_dev, 0.0, v)
                t = jnp.where(stalled_dev, 0.0, t)
                logger.info(
                    "block %d: restarted %d slow chains", block, int(stalled.sum())
                )
                # A freshly-restarted chain's residual will be large again;
                # exempt it from the NEXT block's stall check.
                msr_now = jnp.where(jnp.asarray(stalled), jnp.inf, msr_now)
                carry = (u_v, m, v, t, keys, done, q_out, msr_now)
        msr_prev_host = msr_now
        logger.info(
            "block %d: %d/%d chains done",
            block,
            int(jnp.sum(done)),
            num_chains,
        )
    if not bool(jnp.all(done)):
        raise RuntimeError(
            f"{int(jnp.sum(~done))} chains failed to initialise within "
            f"{max_num_tries * max_iters} Adam iterations."
        )
    x_obs = jax.vmap(system.generate_x_obs_seq)(q_out)
    return q_out, x_obs
