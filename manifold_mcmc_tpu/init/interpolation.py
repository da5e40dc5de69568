"""Constraint-satisfying initialisation by noise-sequence linear interpolation.

Rebuild of reference ``find_initial_state_by_linear_interpolation``
(``sde/mici_extensions.py:1479-1547``): sample parameters and the initial
state from the prior, pick a target state sequence ``x_obs_seq`` consistent
with the observations (``obs_func(x_obs_seq) = y``), and solve per integrator
step for the noise vector that makes the simulated path *linearly interpolate*
between consecutive target states.  Requires ``forward_func`` affine in the
noise argument with full-row-rank noise Jacobian (true of all shipped models).

Everything is batched: pass a leading chain axis on the RNG key to initialise
a whole fleet in one ``vmap``.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "find_initial_state_by_linear_interpolation",
    "make_unconstrained_init_model",
]


def make_unconstrained_init_model(
    obs_interval,
    num_steps_per_obs,
    num_obs,
    dim_u,
    dim_v_0,
    dim_v,
    dim_x,
    forward_func,
    generate_x_0,
    generate_z,
):
    """Minimal ``(model_dict, layout)`` carrier for the interpolation init.

    The unconstrained HMC experiments have no
    ``ConditionedDiffusionConstrainedSystem`` but share the flat
    ``q = [u, v_0, v]`` layout; the reference initialises them through the
    same routine by passing explicit model kwargs
    (``scripts/fhn_model_noisy_obs_hmc_experiment.py:114-134``).
    """
    from types import SimpleNamespace

    from manifold_mcmc_tpu.ops.constraint import QLayout

    layout = QLayout(
        dim_u=dim_u,
        dim_v_0=dim_v_0,
        dim_v=dim_v,
        dim_x=dim_x,
        dim_y=0,
        num_obs=num_obs,
        num_steps_per_obs=num_steps_per_obs,
        noisy=False,
    )
    model_dict = dict(
        dim_u=dim_u,
        dim_v_0=dim_v_0,
        dim_v=dim_v,
        num_steps_per_obs=num_steps_per_obs,
        delta=obs_interval / num_steps_per_obs,
        forward_func=forward_func,
        generate_x_0=generate_x_0,
        generate_z=generate_z,
    )
    return SimpleNamespace(model_dict=model_dict, layout=layout)


def find_initial_state_by_linear_interpolation(
    system, key, x_obs_seq_init, u=None, v_0=None
):
    """Build an on-manifold ``(q, x_obs_seq)`` pair for one chain.

    Args:
        system: a ``ConditionedDiffusionConstrainedSystem``.
        key: PRNG key for the prior draws of ``u`` / ``v_0`` (unused if both
            are given explicitly).
        x_obs_seq_init: (num_obs, dim_x) target states at observation times,
            consistent with the observed sequence.

    Returns ``(q, x_obs_seq_init)``; vmap over a leading axis of keys /
    targets for many chains.
    """
    md = system.model_dict
    layout = system.layout
    k_u, k_v0 = jax.random.split(key)
    dtype = jnp.asarray(x_obs_seq_init).dtype
    if u is None:
        u = jax.random.normal(k_u, (md["dim_u"],), dtype)
    if v_0 is None:
        v_0 = jax.random.normal(k_v0, (md["dim_v_0"],), dtype)
    z = md["generate_z"](u)
    x_0 = md["generate_x_0"](z, v_0)
    delta = md["delta"]
    S = md["num_steps_per_obs"]

    def mean_and_noise_jacobian(x):
        v0 = jnp.zeros((md["dim_v"],), dtype)

        def step_diff(v):
            return md["forward_func"](z, x, v, delta) - x

        return step_diff(v0), jax.jacobian(step_diff)(v0)

    def solve(A, b):
        # Tiny systems (n <= 3, all shipped models) use the closed-form
        # element-wise solve on accelerators; XLA's loop-based batched LU
        # pads each matrix to a hardware tile and dominated the init cost.
        if A.shape[-1] <= 3 and jax.default_backend() != "cpu":
            from manifold_mcmc_tpu.ops.smallchol import solve_small

            return solve_small(A, b)
        return jnp.linalg.solve(A, b)

    def least_squares(J, b):
        # Minimum-norm / least-squares solve without SVD (TPU-friendly):
        # square -> direct solve; wide full-row-rank -> J^T (J J^T)^-1 b;
        # tall -> normal equations.
        m, n = J.shape
        if m == n:
            return solve(J, b)
        if m < n:
            return J.T @ solve(J @ J.T, b)
        return solve(J.T @ J, J.T @ b)

    def solve_interval(x_start, x_end):
        dx = (x_end - x_start) / S
        x_points = x_start[None] + jnp.arange(S, dtype=dtype)[:, None] * dx[None]

        def solve_step(x):
            mean_diff, noise_jac = mean_and_noise_jacobian(x)
            return least_squares(noise_jac, dx - mean_diff)

        return jax.vmap(solve_step)(x_points)

    x_starts = jnp.concatenate([x_0[None], x_obs_seq_init[:-1]], axis=0)
    v_seq = jax.vmap(solve_interval)(x_starts, x_obs_seq_init)
    v_flat = v_seq.reshape(-1)
    parts = [u, v_0, v_flat]
    if layout.noisy:
        parts.append(jnp.zeros((layout.num_obs * layout.dim_y,), dtype))
    return jnp.concatenate(parts), jnp.asarray(x_obs_seq_init)
