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

__all__ = [
    "find_initial_state_by_gradient_descent",
    "find_initial_state_by_gradient_descent_noisy_system",
]

logger = logging.getLogger(__name__)


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
