"""Unrolled batched linear algebra for tiny matrices.

The Woodbury Gram factorisation works on per-block matrices of size
``rows x rows`` with ``rows`` ~ 5-10 (``R * dim_y + dim_x``), batched over
(chains x blocks) ~ 10^4-10^5 instances.  XLA's ``jnp.linalg.cholesky`` /
``cho_solve`` lower these to loop-based kernels that pad each tiny matrix to
the TPU's (8, 128) tile and iterate sequentially -- measured ~45 ms per call
at 1024 chains on a v5e for what is arithmetically a ~10^7-FLOP job.

Here the factorisations/substitutions are *unrolled over the static matrix
indices* as pure element-wise operations on the batch: every ``L[i, j]`` is
one (batch...)-shaped array, the whole factorisation is a DAG of a few dozen
fused multiply-adds, and XLA compiles it into a handful of element-wise
kernels over the (large) batch dimensions.  All functions are
shape-polymorphic over leading batch axes and differentiable (plain jnp ops;
AD of the unrolled recurrences is exactly the textbook differentiated
algorithm).

Used by :mod:`ops.gram` for matrices up to ``_MAX_UNROLL_DIM``; larger
matrices fall back to the library routines (same semantics, covered by the
same oracle tests).
"""

import jax.numpy as jnp

__all__ = [
    "MAX_UNROLL_DIM",
    "cholesky_small",
    "solve_lower_small",
    "solve_upper_small",
    "cho_solve_small",
    "log_diag_prod_small",
]

MAX_UNROLL_DIM = 16


def _unstack(mat):
    """(..., n, n) -> python matrix of (...,) arrays."""
    n = mat.shape[-1]
    return [[mat[..., i, j] for j in range(n)] for i in range(n)]


def _restack(rows):
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def cholesky_small(D):
    """Lower Cholesky factor of (..., n, n) SPD matrices, unrolled over n.

    The strict upper triangle of the result is zero (matching
    ``jnp.linalg.cholesky``).
    """
    n = D.shape[-1]
    d = _unstack(D)
    L = [[None] * n for _ in range(n)]
    zero = jnp.zeros_like(d[0][0])
    for j in range(n):
        s = d[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_jj = 1.0 / L[j][j]
        for i in range(j + 1, n):
            t = d[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_jj
        for i in range(j):
            L[i][j] = zero
    return _restack(L)


def solve_lower_small(L, b):
    """Solve ``L y = b`` with lower-triangular L, unrolled.

    ``b`` is (..., n) (vector rhs) or (..., n, m) (matrix rhs); the two are
    disambiguated by comparing the batch prefix against ``L``'s.
    """
    n = L.shape[-1]
    Lm = _unstack(L)
    if b.ndim >= 2 and b.shape[-2] == n and b.shape[:-2] == L.shape[:-2]:
        m = b.shape[-1]
        cols = [[b[..., i, c] for i in range(n)] for c in range(m)]
        out_cols = []
        for c in range(m):
            y = [None] * n
            for i in range(n):
                t = cols[c][i]
                for k in range(i):
                    t = t - Lm[i][k] * y[k]
                y[i] = t / Lm[i][i]
            out_cols.append(jnp.stack(y, axis=-1))
        return jnp.stack(out_cols, axis=-1)
    y = [None] * n
    for i in range(n):
        t = b[..., i]
        for k in range(i):
            t = t - Lm[i][k] * y[k]
        y[i] = t / Lm[i][i]
    return jnp.stack(y, axis=-1)


def solve_upper_small(U, b):
    """Solve ``U x = b`` with upper-triangular U, unrolled (b as above)."""
    n = U.shape[-1]
    Um = _unstack(U)
    if b.ndim >= 2 and b.shape[-2] == n and b.shape[:-2] == U.shape[:-2]:
        m = b.shape[-1]
        out_cols = []
        for c in range(m):
            x = [None] * n
            for i in range(n - 1, -1, -1):
                t = b[..., i, c]
                for k in range(i + 1, n):
                    t = t - Um[i][k] * x[k]
                x[i] = t / Um[i][i]
            out_cols.append(jnp.stack(x, axis=-1))
        return jnp.stack(out_cols, axis=-1)
    x = [None] * n
    for i in range(n - 1, -1, -1):
        t = b[..., i]
        for k in range(i + 1, n):
            t = t - Um[i][k] * x[k]
        x[i] = t / Um[i][i]
    return jnp.stack(x, axis=-1)


def cho_solve_small(L, b):
    """Solve ``L L^T x = b`` from the lower Cholesky factor, unrolled."""
    y = solve_lower_small(L, b)
    return solve_upper_small(jnp.swapaxes(L, -1, -2), y)


def _det_small(A):
    """Determinant of (..., n, n) for n <= 3, unrolled."""
    n = A.shape[-1]
    if n == 1:
        return A[..., 0, 0]
    if n == 2:
        return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    m = _unstack(A)
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        + m[0][1] * (m[1][2] * m[2][0] - m[1][0] * m[2][2])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def solve_small(A, b):
    """Direct solve of tiny (n <= 3) general systems via adjugate formulas.

    ``A``: (..., n, n), ``b``: (..., n).  Pure element-wise arithmetic over
    the batch (no pivoting); falls back to ``jnp.linalg.solve`` for n > 3.

    Near-singular batch elements (|det| below a scale-aware floor -- e.g. a
    degenerate noise Jacobian at a poor interpolation point) get a small
    Tikhonov shift ``A + mu I`` instead of dividing by a vanishing
    determinant, so the result degrades gracefully (finite, approximately
    minimum-norm) rather than to inf/nan, matching how callers using
    ``jnp.linalg.solve`` behaved.
    """
    n = A.shape[-1]
    if n > 3:
        return jnp.linalg.solve(A, b)
    eps = jnp.finfo(A.dtype).eps
    scale = jnp.max(jnp.abs(A), axis=(-1, -2)) + eps
    det = _det_small(A)
    floor = (jnp.sqrt(eps) * scale) ** n
    mu = jnp.where(jnp.abs(det) < floor, jnp.sqrt(eps) * scale, 0.0)
    A = A + mu[..., None, None] * jnp.eye(n, dtype=A.dtype)
    if n == 1:
        return b / A[..., 0, 0][..., None]
    if n == 2:
        a, c = A[..., 0, 0], A[..., 1, 0]
        bb, d = A[..., 0, 1], A[..., 1, 1]
        det = a * d - bb * c
        x0 = (d * b[..., 0] - bb * b[..., 1]) / det
        x1 = (a * b[..., 1] - c * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    if n == 3:
        m = _unstack(A)
        c00 = m[1][1] * m[2][2] - m[1][2] * m[2][1]
        c01 = m[0][2] * m[2][1] - m[0][1] * m[2][2]
        c02 = m[0][1] * m[1][2] - m[0][2] * m[1][1]
        c10 = m[1][2] * m[2][0] - m[1][0] * m[2][2]
        c11 = m[0][0] * m[2][2] - m[0][2] * m[2][0]
        c12 = m[0][2] * m[1][0] - m[0][0] * m[1][2]
        c20 = m[1][0] * m[2][1] - m[1][1] * m[2][0]
        c21 = m[0][1] * m[2][0] - m[0][0] * m[2][1]
        c22 = m[0][0] * m[1][1] - m[0][1] * m[1][0]
        det = m[0][0] * c00 + m[0][1] * c10 + m[0][2] * c20
        b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
        return jnp.stack(
            [
                (c00 * b0 + c01 * b1 + c02 * b2) / det,
                (c10 * b0 + c11 * b1 + c12 * b2) / det,
                (c20 * b0 + c21 * b1 + c22 * b2) / det,
            ],
            axis=-1,
        )
    return jnp.linalg.solve(A, b)


def log_diag_prod_small(L):
    """``sum_i log |L[..., i, i]|`` without materialising the diagonal."""
    n = L.shape[-1]
    total = 0.0
    for i in range(n):
        total = total + jnp.log(jnp.abs(L[..., i, i]))
    return total
