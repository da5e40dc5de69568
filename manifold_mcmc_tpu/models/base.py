"""Shared helpers and the module contract for example diffusion models.

Every model module (see ``fhn.py``, ``sir.py``) exposes the same surface as
the reference example models (``/root/reference/sde/example_models``):

* dimensions: ``dim_x`` (state), ``dim_w`` (Wiener process), ``dim_z``
  (parameters), ``dim_v_0`` (initial-state noise), ``dim_v`` (noise consumed
  per integrator step),
* ``drift_func(x, z)`` / ``diff_coeff(x, z)``: SDE coefficients as plain JAX
  functions,
* ``forward_func(z, x, v, dt)``: one step of the chosen time discretisation,
* ``obs_func(x_seq)``: observation operator,
* prior generators ``generate_z(u)``, ``generate_x_0(z, v_0)``,
  ``generate_sigma_y(u)`` mapping standard-normal inputs to model quantities,
* data simulators ``generate_x_seq`` / ``generate_y_seq``.

This module provides the generic scan-based simulators so each model only
defines its coefficients and priors.
"""

from jax import lax

__all__ = ["make_generate_x_seq", "make_generate_y_seq"]


def make_generate_x_seq(forward_func):
    """Build a full-path simulator scanning ``forward_func`` over noise steps.

    Mirrors reference ``sde/example_models/fhn.py:54-60``; the ``lax.scan``
    over the time axis is the fundamental sequential recurrence of the whole
    framework (everything else batches around it).
    """

    def generate_x_seq(z, x_0, v_seq, dt):
        def step_func(x, v):
            x_n = forward_func(z, x, v, dt)
            return x_n, x_n

        _, x_seq = lax.scan(step_func, x_0, v_seq)
        return x_seq

    return generate_x_seq


def make_generate_y_seq(forward_func, obs_func):
    """Build a noiseless-observation simulator subsampling the state path.

    Mirrors reference ``sde/example_models/fhn.py:63-65``.
    """
    generate_x_seq = make_generate_x_seq(forward_func)

    def generate_y_seq(z, x_0, v_seq, dt, num_steps_per_obs):
        x_seq = generate_x_seq(z, x_0, v_seq, dt)
        return obs_func(x_seq[num_steps_per_obs - 1 :: num_steps_per_obs])

    return generate_y_seq
