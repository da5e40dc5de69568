"""Fused Pallas TPU kernel for the per-block Woodbury Gram factorisation.

One constrained-leapfrog step evaluates, for every middle block of the
partition, the chain

    D = J_v J_v^T (+ sigma^2 diag)  ->  L = chol(D)  ->  D^{-1} J_u
      ->  J_u^T D^{-1} J_u  (summed over blocks)  ->  sum_i log L_ii

(`ops.gram.chol_gram_blocks` / `log_det_sqrt_gram_from_chol`, mirroring the
reference Woodbury scheme at ``/root/reference/sde/mici_extensions.py:626-820``).
The pure-XLA path materialises each intermediate (``D``, ``chol_D``,
``D_inv_du``) to HBM between kernels, and the tiny trailing dims (rows ~ 6,
dim_u ~ 4) pad to the TPU's (8, 128) tile on every round trip.

This module fuses the whole per-block pipeline into ONE Pallas kernel that
keeps everything in VMEM/registers: per block, the Gram rows are formed as
lane-wide reductions over the noise axis (the only large dimension, ``m =
R * S * dim_v`` ~ 250) and the Cholesky / triangular solves are unrolled over
the static tiny indices as a scalar DAG -- the same algorithm as
``ops.smallchol`` but with zero intermediate HBM traffic.

Batching: the kernel is written per chain (matching the package's
single-chain function + outer ``vmap`` architecture); ``jax.vmap`` over the
chain axis batches ``pallas_call`` by prepending a grid dimension, so each
grid instance processes one chain's full set of middle blocks out of VMEM
(~100-500 KB per chain at canonical shapes).

Differentiation: ``pallas_call`` has no AD rule, so the public entry point is
wrapped in ``jax.custom_vjp`` whose backward pass replays the equivalent
``jnp`` computation (`_middle_reference`) and uses *its* VJP.  Gradients are
therefore always available and exactly match the pure-XLA path; the fusion
only accelerates forward evaluations (the projection-solver and momentum
-projection call sites, which dominate calls per step).  The
``grad log det Gram`` path should keep the jnp backend until a hand-written
backward kernel lands.

Opt-in only: nothing imports this module unless ``MMT_GRAM_BACKEND=pallas``
(or ``pallas-interpret`` for CPU testing) is set -- see ``ops.gram`` -- so the
default traced programs (and their compile caches) are unchanged.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

__all__ = ["fused_chol_gram_middle", "middle_reference"]


def middle_reference(dv, du, dn, num_state_rows):
    """Pure-jnp oracle for the fused kernel (same contract, batched blocks).

    Args:
        dv: ``(count, rows, m)`` per-block noise Jacobians.
        du: ``(count, rows, dim_u)`` per-block parameter Jacobians.
        dn: ``(count, obs_rows)`` observation-noise diagonals or ``None``.
        num_state_rows: static; trailing constraint rows without obs noise.

    Returns:
        ``(chol_D, D_inv_du, sum_duT_D_inv_du, half_log_det)`` with shapes
        ``(count, rows, rows)``, ``(count, rows, dim_u)``, ``(dim_u, dim_u)``
        and scalar.
    """
    rows = dv.shape[-2]
    D = jnp.einsum("bij,bkj->bik", dv, dv)
    if dn is not None:
        contrib = dn * dn
        if num_state_rows > 0:
            pad = jnp.zeros(contrib.shape[:-1] + (num_state_rows,), D.dtype)
            contrib = jnp.concatenate([contrib, pad], axis=-1)
        idx = jnp.arange(rows)
        D = D.at[:, idx, idx].add(contrib)
    chol_D = jnp.linalg.cholesky(D)
    D_inv_du = jax.scipy.linalg.cho_solve((chol_D, True), du)
    sum_duT = jnp.einsum("bij,bik->jk", du, D_inv_du)
    half_log_det = jnp.log(jnp.abs(chol_D.diagonal(0, -2, -1))).sum()
    return chol_D, D_inv_du, sum_duT, half_log_det


def _kernel(count, rows, dim_u, obs_rows, num_state_rows, noisy, dtype):
    """Build the Pallas kernel body for static block geometry.

    All loops below are Python loops over *static* tiny indices -- the kernel
    is a straight-line scalar/vector DAG; the only large axis (the noise
    contraction ``m``) lives in the lane dimension of the row slabs.
    """

    def kernel(*refs):
        if noisy:
            dv_ref, du_ref, dn_ref, chol_ref, dinvdu_ref, sumc_ref, hld_ref = refs
        else:
            dv_ref, du_ref, chol_ref, dinvdu_ref, sumc_ref, hld_ref = refs

        sum_c = [[jnp.zeros((), dtype) for _ in range(dim_u)] for _ in range(dim_u)]
        half_log_det = jnp.zeros((), dtype)

        for b in range(count):
            # Row slabs (1, m): the only reads of the large axis.
            slabs = [dv_ref[b, i : i + 1, :] for i in range(rows)]
            # Gram rows via lane reductions; symmetric, build lower triangle.
            d = [[None] * rows for _ in range(rows)]
            for i in range(rows):
                for k in range(i + 1):
                    d[i][k] = jnp.sum(slabs[i] * slabs[k])
            if noisy:
                for i in range(min(obs_rows, rows - num_state_rows)):
                    sig = dn_ref[b, i]
                    d[i][i] = d[i][i] + sig * sig
            # Unrolled scalar Cholesky (same recurrences as ops.smallchol).
            L = [[None] * rows for _ in range(rows)]
            for j in range(rows):
                s = d[j][j]
                for k in range(j):
                    s = s - L[j][k] * L[j][k]
                L[j][j] = jnp.sqrt(s)
                inv_jj = 1.0 / L[j][j]
                for i in range(j + 1, rows):
                    t = d[i][j]
                    for k in range(j):
                        t = t - L[i][k] * L[j][k]
                    L[i][j] = t * inv_jj
                half_log_det = half_log_det + jnp.log(jnp.abs(L[j][j]))
            for i in range(rows):
                for k in range(rows):
                    chol_ref[b, i, k] = L[i][k] if k <= i else jnp.zeros((), dtype)
            # D^{-1} du column-by-column: forward then back substitution.
            for c in range(dim_u):
                y = [None] * rows
                for i in range(rows):
                    t = du_ref[b, i, c]
                    for k in range(i):
                        t = t - L[i][k] * y[k]
                    y[i] = t / L[i][i]
                x = [None] * rows
                for i in range(rows - 1, -1, -1):
                    t = y[i]
                    for k in range(i + 1, rows):
                        t = t - L[k][i] * x[k]
                    x[i] = t / L[i][i]
                for i in range(rows):
                    dinvdu_ref[b, i, c] = x[i]
                for c2 in range(dim_u):
                    acc = sum_c[c2][c]
                    for i in range(rows):
                        acc = acc + du_ref[b, i, c2] * x[i]
                    sum_c[c2][c] = acc

        for i in range(dim_u):
            for j in range(dim_u):
                sumc_ref[i, j] = sum_c[i][j]
        hld_ref[0, 0] = half_log_det

    return kernel


@lru_cache(maxsize=None)
def _make_fused(count, rows, m, dim_u, obs_rows, num_state_rows, noisy, dtype_name,
                interpret):
    """Cached differentiable fused op for one static block geometry."""
    from jax.experimental import pallas as pl

    dtype = jnp.dtype(dtype_name)
    kernel = _kernel(count, rows, dim_u, obs_rows, num_state_rows, noisy, dtype)
    out_shape = (
        jax.ShapeDtypeStruct((count, rows, rows), dtype),
        jax.ShapeDtypeStruct((count, rows, dim_u), dtype),
        jax.ShapeDtypeStruct((dim_u, dim_u), dtype),
        jax.ShapeDtypeStruct((1, 1), dtype),
    )

    def call(dv, du, dn):
        args = (dv, du) if dn is None else (dv, du, dn)
        chol_D, D_inv_du, sum_duT, hld = pl.pallas_call(
            kernel, out_shape=out_shape, interpret=interpret
        )(*args)
        return chol_D, D_inv_du, sum_duT, hld[0, 0]

    @jax.custom_vjp
    def fused(dv, du, dn):
        return call(dv, du, dn)

    def fwd(dv, du, dn):
        return call(dv, du, dn), (dv, du, dn)

    def bwd(res, cts):
        dv, du, dn = res
        ref = partial(middle_reference, num_state_rows=num_state_rows)
        if dn is None:
            _, vjp = jax.vjp(lambda a, b: ref(a, b, None), dv, du)
            return (*vjp(cts), None)
        _, vjp = jax.vjp(ref, dv, du, dn)
        return vjp(cts)

    fused.defvjp(fwd, bwd)
    return fused


def fused_chol_gram_middle(dv, du, dn, num_state_rows, *, interpret=False):
    """Fused per-middle-block Gram factorisation (see module docstring).

    Same contract as :func:`middle_reference`; dispatches to a cached
    Pallas kernel specialised on the static block geometry.
    """
    count, rows, m = dv.shape
    dim_u = du.shape[-1]
    obs_rows = 0 if dn is None else dn.shape[-1]
    fused = _make_fused(
        count, rows, m, dim_u, obs_rows, num_state_rows, dn is not None,
        jnp.result_type(dv).name, interpret,
    )
    return fused(dv, du, dn)
