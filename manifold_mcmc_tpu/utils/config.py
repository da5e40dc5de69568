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


def default_tolerances():
    """Solver / reversibility tolerances matched to the active precision.

    The reference defaults (``scripts/utils.py:149-166``) assume f64:
    constraint tol 1e-9, position tol 1e-8, reverse-check tol 2e-8.  In f32
    the achievable constraint residual floor is ~1e-6 of the constraint scale,
    so tolerances are loosened accordingly; empirically these retain >0.9
    acceptance under dual-averaging adaptation.
    """
    if is_x64_enabled():
        return {
            "constraint_tol": 1e-9,
            "position_tol": 1e-8,
            "reverse_check_tol": 2e-8,
            "divergence_tol": 1e10,
        }
    return {
        "constraint_tol": 5e-6,
        "position_tol": 5e-5,
        "reverse_check_tol": 2e-4,
        "divergence_tol": 1e8,
    }
