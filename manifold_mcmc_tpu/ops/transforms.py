"""Change-of-variables transforms for SDE systems via Ito's lemma.

TPU-native rebuild of ``/root/reference/sde/transforms.py:9-63``.  The
reference derives the transformed drift / diffusion coefficient symbolically
with SymPy; here Ito's lemma is applied with JAX automatic differentiation so
the transformed coefficient functions are ordinary traceable JAX functions.
"""

import jax
import jax.numpy as jnp

__all__ = ["transform_sde"]


def transform_sde(forward_func, backward_func):
    """Apply Ito's lemma to an SDE under a bijective state transformation.

    Given an Ito SDE ``dX = a(X, z) dt + B(X, z) dW`` and a smooth bijection
    ``f`` (``forward_func``, with inverse ``backward_func``), the process
    ``Y = f(X)`` satisfies ``dY = a'(Y, z) dt + B'(Y, z) dW`` with

        a'(y, z) = J_f(x) a(x, z)
                   + (1/2) sum_{k,l} (B B^T)[k, l] d^2 f / dx_k dx_l
        B'(y, z) = J_f(x) B(x, z)

    evaluated at ``x = f^{-1}(y)``.

    Returns a transform accepting ``(drift_func, diff_coeff)`` and returning
    the transformed pair, mirroring the reference factory signature.
    """

    def transform(drift_func, diff_coeff):
        def transformed_drift_func(y, z):
            x = backward_func(y)
            a = drift_func(x, z)
            B = diff_coeff(x, z)
            jac_f_a = jax.jvp(forward_func, (x,), (a,))[1]
            hess_f = jax.jacfwd(jax.jacfwd(forward_func))(x)
            ito_correction = 0.5 * jnp.einsum("...kl,kl->...", hess_f, B @ B.T)
            return jac_f_a + ito_correction

        def transformed_diff_coeff(y, z):
            x = backward_func(y)
            B = diff_coeff(x, z)
            return jax.jacfwd(forward_func)(x) @ B

        return transformed_drift_func, transformed_diff_coeff

    return transform
