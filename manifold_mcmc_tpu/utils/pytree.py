"""Small pytree and flat-vector utilities.

``split`` / ``split_and_reshape`` mirror the flat latent-vector slicing
helpers of the reference (``sde/mici_extensions.py:31-53``): the latent state
``q`` is a single flat vector ``[u, v_0, v_seq_flat, (n_seq_flat)]`` and these
carve it into its typed components with *static* lengths/shapes so the slices
are compile-time constants under ``jit``.
"""

import math

import jax.numpy as jnp

__all__ = ["split", "split_and_reshape", "tree_where"]


def split(v, lengths):
    """Split array along axis 0 into slices of the given static lengths.

    Any remainder beyond ``sum(lengths)`` is appended as a final part.
    """
    parts = []
    i = 0
    for n in lengths:
        parts.append(v[i : i + n])
        i += n
    if i < v.shape[0]:
        parts.append(v[i:])
    return parts


def split_and_reshape(array, shapes):
    """Split axis 0 into consecutive subarrays reshaped to the given shapes.

    Trailing axes of ``array`` are preserved; a remainder part is appended if
    the shapes do not consume the whole axis.
    """
    parts = []
    i = 0
    for shape in shapes:
        n = math.prod(shape)
        parts.append(array[i : i + n].reshape(shape + array.shape[1:]))
        i += n
    if i < array.shape[0]:
        parts.append(array[i:])
    return parts


def tree_where(cond, if_true, if_false):
    """Elementwise select between two matching pytrees on a scalar predicate.

    The masked-rejection primitive: numerical failures inside vmapped chains
    select the pre-step state instead of raising (the reference's
    ``ConvergenceError`` / ``NonReversibleStepError`` semantics as data).
    """
    import jax

    return jax.tree_util.tree_map(
        lambda t, f: jnp.where(cond, t, f), if_true, if_false
    )
