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
keeps everything in VMEM/registers: per block, the Gram and the final
``J_u^T D^{-1} J_u`` contraction are single MXU ``dot_general``s over the
noise axis (the only large dimension, ``m = R * S * dim_v`` ~ 250) and the
Cholesky / triangular solves are unrolled over the static tiny indices as a
scalar DAG -- the same algorithm as ``ops.smallchol`` but with zero
intermediate HBM traffic.

MEASURED OUTCOME (TPU v5e, 1024 chains, canonical FHN shapes -- committed at
``benchmarks/results/ab_gram_and_logdet_backends_2026-08-19.json``): the
pure-XLA default is ~13x FASTER (1.17 ms vs 15.4 ms).  XLA batches the tiny
per-block Cholesky across chains x blocks in the vector sublanes, while this
kernel runs one chain's blocks as a serial scalar DAG per grid instance; the
HBM round trips the fusion removes are already negligible at these tile
sizes.  The kernel therefore stays opt-in -- kept because it is the working
template for block-geometry regimes XLA handles badly (rows >> MAX_UNROLL_DIM
or very large ``m``, where the slab streaming wins).

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

    Mosaic constraints shape the whole kernel (TPU lowering rejects rank-0
    VMEM loads/stores): every memory access is a >=2D tile, the per-block
    Gram and the ``J_u^T D^{-1} J_u`` accumulation are single
    ``dot_general``s (MXU), and the unrolled Cholesky / substitutions run on
    scalar *values* extracted from register tiles with masked reductions and
    written back as masked-assembled 2D tiles.  Loops are Python loops over
    static tiny indices -- the kernel is a straight-line DAG.
    """
    import jax.lax as lax

    def kernel(*refs):
        if noisy:
            dv_ref, du_ref, dn2_ref, chol_ref, dinvdu_ref, sumc_ref, hld_ref = refs
        else:
            dv_ref, du_ref, chol_ref, dinvdu_ref, sumc_ref, hld_ref = refs

        # Iota masks for scalar extraction / tile assembly (2D, per guide).
        row_rr = lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
        col_rr = lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        row_ru = lax.broadcasted_iota(jnp.int32, (rows, dim_u), 0)
        col_ru = lax.broadcasted_iota(jnp.int32, (rows, dim_u), 1)

        def ext(A, masks, i, k):
            row_m, col_m = masks
            return jnp.sum(jnp.where((row_m == i) & (col_m == k), A, 0))

        sum_c = jnp.zeros((dim_u, dim_u), dtype)
        half_log_det = jnp.zeros((), dtype)

        for b in range(count):
            dvb = dv_ref[b, :, :]  # (rows, m)
            dub = du_ref[b, :, :]  # (rows, dim_u)
            # Gram block on the MXU: D = dv dv^T, contraction over the only
            # large axis m.
            D = lax.dot_general(
                dvb, dvb, (((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
            )
            if noisy:
                # dn2 arrives pre-squared and zero-padded to `rows` by the
                # wrapper; add it to the diagonal.
                dn2b = dn2_ref[b, :, :]  # (1, rows), broadcasts over rows
                D = D + jnp.where(row_rr == col_rr, dn2b, jnp.zeros((), dtype))
            # Unrolled scalar Cholesky (same recurrences as ops.smallchol).
            d_s = [
                [ext(D, (row_rr, col_rr), i, k) for k in range(i + 1)]
                for i in range(rows)
            ]
            du_s = [
                [ext(dub, (row_ru, col_ru), i, c) for c in range(dim_u)]
                for i in range(rows)
            ]
            L = [[None] * rows for _ in range(rows)]
            for j in range(rows):
                s = d_s[j][j]
                for k in range(j):
                    s = s - L[j][k] * L[j][k]
                L[j][j] = jnp.sqrt(s)
                inv_jj = 1.0 / L[j][j]
                for i in range(j + 1, rows):
                    t = d_s[i][j]
                    for k in range(j):
                        t = t - L[i][k] * L[j][k]
                    L[i][j] = t * inv_jj
                half_log_det = half_log_det + jnp.log(jnp.abs(L[j][j]))
            Lmat = jnp.zeros((rows, rows), dtype)
            for i in range(rows):
                for k in range(i + 1):
                    Lmat = jnp.where((row_rr == i) & (col_rr == k), L[i][k], Lmat)
            chol_ref[b, :, :] = Lmat
            # D^{-1} du column-by-column: forward then back substitution.
            X = jnp.zeros((rows, dim_u), dtype)
            for c in range(dim_u):
                y = [None] * rows
                for i in range(rows):
                    t = du_s[i][c]
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
                    X = jnp.where((row_ru == i) & (col_ru == c), x[i], X)
            dinvdu_ref[b, :, :] = X
            # du^T X accumulated over blocks, contraction over rows (MXU).
            sum_c = sum_c + lax.dot_general(
                dub, X, (((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        sumc_ref[:, :] = sum_c
        hld_ref[:, :] = half_log_det * jnp.ones((1, 1), dtype)

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
        if dn is None:
            args = (dv, du)
        else:
            # Pre-square and zero-pad the obs-noise diagonal to `rows` here
            # (outside the kernel) so the kernel's diag-add is one uniform
            # masked broadcast.
            dn2 = dn * dn
            if rows - dn2.shape[-1] > 0:
                dn2 = jnp.concatenate(
                    [dn2, jnp.zeros(dn2.shape[:-1] + (rows - dn2.shape[-1],),
                                    dn2.dtype)],
                    axis=-1,
                )
            args = (dv, du, dn2[:, None, :])
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
