"""Metric (mass-matrix) representations as JAX pytrees.

Functional replacement for the lazy matrix objects of the reference's sampler
runtime (``mici.matrices``: Identity / DensePositiveDefinite /
PositiveDefiniteBlockDiagonal, used at reference
``sde/mici_extensions.py:16-20, 293-315`` and ``scripts/utils.py:243-250``).
Each metric is a registered pytree so an *adapted* metric flows through
``lax.scan`` / ``vmap`` as runtime data without retracing; the metric *type*
is static (different types compile different system variants).

All operations are expressed matrix-free as needed by the samplers:

* ``mult(v)``        -- ``M v``
* ``inv_mult(v)``    -- ``M^-1 v``
* ``sqrt_mult(v)``   -- ``L v`` with ``L L^T = M`` (momentum sampling)
* ``log_det_sqrt()`` -- ``(1/2) log det M``
* ``param_block(dim)`` -- dense upper-left ``dim x dim`` block (the ``M_0``
  factor entering the constrained system's Gram decomposition).
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = [
    "IdentityMetric",
    "DiagonalMetric",
    "DenseMetric",
    "BlockDiagonalMetric",
]


def _scalar_gaussian_flow(q, p, m, dt):
    """Exact flow of ``h2 = q^2/2 + p^2/(2m)`` per coordinate (mass ``m``)."""
    omega = 1.0 / jnp.sqrt(m)
    c, s = jnp.cos(omega * dt), jnp.sin(omega * dt)
    return c * q + s * omega * p, c * p - s * q / omega


@jax.tree_util.register_pytree_node_class
class IdentityMetric:
    """The identity mass matrix."""

    def mult(self, v):
        return v

    def inv_mult(self, v):
        return v

    def sqrt_mult(self, v):
        return v

    def log_det_sqrt(self):
        return 0.0

    def param_block(self, dim):
        return jnp.eye(dim)

    def gaussian_flow(self, q, p, dt):
        """Exact rotation flow of ``h2 = (1/2) q.q + (1/2) p.M^-1 p``."""
        c, s = jnp.cos(dt), jnp.sin(dt)
        return c * q + s * p, c * p - s * q

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()


@jax.tree_util.register_pytree_node_class
class DiagonalMetric:
    """Positive diagonal mass matrix (adapted from variance estimates)."""

    def __init__(self, diag):
        self.diag = diag

    def mult(self, v):
        return self.diag * v

    def inv_mult(self, v):
        return v / self.diag

    def sqrt_mult(self, v):
        return jnp.sqrt(self.diag) * v

    def log_det_sqrt(self):
        return 0.5 * jnp.sum(jnp.log(self.diag))

    def param_block(self, dim):
        return jnp.diag(self.diag[:dim])

    def gaussian_flow(self, q, p, dt):
        return _scalar_gaussian_flow(q, p, self.diag, dt)

    def tree_flatten(self):
        return (self.diag,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class DenseMetric:
    """Dense positive-definite mass matrix, stored via its Cholesky factor."""

    def __init__(self, matrix, chol=None):
        self.matrix = matrix
        self.chol = jnp.linalg.cholesky(matrix) if chol is None else chol

    def mult(self, v):
        return self.matrix @ v

    def inv_mult(self, v):
        return jsl.cho_solve((self.chol, True), v)

    def sqrt_mult(self, v):
        return self.chol @ v

    def log_det_sqrt(self):
        return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.chol))))

    def param_block(self, dim):
        return self.matrix[:dim, :dim]

    def gaussian_flow(self, q, p, dt):
        # Diagonalise M = V diag(m) V^T once per call; adapted metrics are
        # finalized rarely so this is off the hot path for typical runs.
        eigval, eigvec = jnp.linalg.eigh(self.matrix)
        q_hat, p_hat = _scalar_gaussian_flow(eigvec.T @ q, eigvec.T @ p, eigval, dt)
        return eigvec @ q_hat, eigvec @ p_hat

    def tree_flatten(self):
        return (self.matrix, self.chol), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class BlockDiagonalMetric:
    """``diag(M_0, I)``: dense block on the parameter coordinates, identity rest.

    The constrained system requires this structure (reference
    ``mici_extensions.py:293-315``): the global parameter coordinates get an
    adapted dense block while the high-dimensional noise coordinates keep the
    identity (they stay near their standard-normal prior).
    """

    def __init__(self, param_matrix, param_chol=None):
        self.param_matrix = param_matrix
        self.param_chol = (
            jnp.linalg.cholesky(param_matrix) if param_chol is None else param_chol
        )

    @property
    def dim_param(self):
        return self.param_matrix.shape[-1]

    def _split(self, v):
        return v[..., : self.dim_param], v[..., self.dim_param :]

    def mult(self, v):
        head, tail = self._split(v)
        return jnp.concatenate([head @ self.param_matrix.T, tail], axis=-1)

    def inv_mult(self, v):
        head, tail = self._split(v)
        return jnp.concatenate(
            [jsl.cho_solve((self.param_chol, True), head), tail], axis=-1
        )

    def sqrt_mult(self, v):
        head, tail = self._split(v)
        return jnp.concatenate([self.param_chol @ head, tail], axis=-1)

    def log_det_sqrt(self):
        return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.param_chol))))

    def param_block(self, dim):
        if dim != self.dim_param:
            raise ValueError(
                f"metric parameter block is {self.dim_param}x{self.dim_param}, "
                f"requested {dim}"
            )
        return self.param_matrix

    def gaussian_flow(self, q, p, dt):
        eigval, eigvec = jnp.linalg.eigh(self.param_matrix)
        q_h, q_t = self._split(q)
        p_h, p_t = self._split(p)
        q_hat, p_hat = _scalar_gaussian_flow(eigvec.T @ q_h, eigvec.T @ p_h, eigval, dt)
        c, s = jnp.cos(dt), jnp.sin(dt)
        return (
            jnp.concatenate([eigvec @ q_hat, c * q_t + s * p_t], axis=-1),
            jnp.concatenate([eigvec @ p_hat, c * p_t - s * q_t], axis=-1),
        )

    def tree_flatten(self):
        return (self.param_matrix, self.param_chol), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
