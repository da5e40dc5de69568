"""Precision and platform configuration.

The reference pins double precision on CPU (``scripts/utils.py:19-22``).  On
TPU the native compute dtype is float32 (f64 is software-emulated and slow),
so this framework makes precision an explicit configuration: the golden
correctness path runs in f64 on CPU (used by the test suite's oracle checks)
while the production TPU path runs f32 with appropriately rescaled solver
tolerances (see ``default_tolerances``).
"""

import jax
import jax.numpy as jnp

__all__ = ["setup", "default_dtype", "default_tolerances", "is_x64_enabled"]


def setup(x64=False, platform=None):
    """Configure JAX precision (and optionally platform) for this process.

    Must be called before any JAX computation.  ``x64=True`` reproduces the
    reference's double-precision CPU configuration.
    """
    jax.config.update("jax_enable_x64", x64)
    if platform is not None:
        jax.config.update("jax_platforms", platform)


def is_x64_enabled():
    return jax.config.jax_enable_x64


def default_dtype():
    """Default floating dtype under the current precision configuration."""
    return jnp.float64 if is_x64_enabled() else jnp.float32


def default_tolerances(obs_scale=1.0):
    """Solver / reversibility tolerances matched to the active precision.

    The reference defaults (``scripts/utils.py:149-166``) assume f64:
    constraint tol 1e-9, position tol 1e-8, reverse-check tol 2e-8.  In f32
    the achievable constraint residual floor is ~1e-6 of the constraint
    *scale* — the magnitude of the observed quantities whose cancellation
    defines ``c(q)`` — so the f32 constraint tolerance is relative: it is
    multiplied by ``max(1, obs_scale)``.  For FHN (obs ~O(1)) this is a
    no-op; for SIR (daily infected counts up to ~300) an absolute 5e-6
    tolerance sits *below* the f32 rounding floor of the forward pass
    (~``|y|·eps·√num_steps`` ≈ 5e-4) and the projection solver can never
    converge — every proposal is rejected with a convergence error and the
    chains freeze at their initial states.  Callers should pass
    ``obs_scale = max|y_seq|``.  The f64 path keeps the reference's absolute
    tolerances (its rounding floor is ~1e-13 even at SIR scale).
    """
    if is_x64_enabled():
        return {
            "constraint_tol": 1e-9,
            "position_tol": 1e-8,
            "reverse_check_tol": 2e-8,
            "divergence_tol": 1e10,
        }
    scale = max(1.0, float(obs_scale))
    return {
        "constraint_tol": 5e-6 * scale,
        "position_tol": 5e-5,
        "reverse_check_tol": 2e-4,
        "divergence_tol": 1e8,
    }
