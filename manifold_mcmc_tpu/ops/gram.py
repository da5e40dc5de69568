"""Blocked Gram-matrix linear algebra for conditioned-diffusion constraints.

The constraint Jacobian of a blocked conditioned diffusion decomposes as

    dc(q) = [ J_u | J_v | J_n ]

where ``J_u`` (derivative w.r.t. the global parameter vector ``u``) is a tall
dense strip, ``J_v`` (derivative w.r.t. the per-block Wiener noise) is block
diagonal, and ``J_n`` (derivative w.r.t. the per-observation noise, present
only for noisy observations) is diagonal with entries ``sigma``.  With a
metric ``M = diag(M_0, I, I)`` the Gram matrix ``G = dc M^-1 dc^T`` is

    G = J_u M_0^-1 J_u^T + D,      D = J_v J_v^T + J_n J_n^T (block diagonal)

and by the Woodbury identity systems in ``G`` reduce to batched solves in the
small per-block ``D`` factors plus one dense ``dim_u x dim_u`` solve in

    C = M_0 + J_u^T D^-1 J_u.

This module implements that decomposition over *block pytrees*: tuples of
per-block arrays where batched middle blocks carry a leading block axis
(ndim 3) and the initial/final blocks do not (ndim 2).  Everything is pure
``jax.numpy`` -- batched Cholesky/LU/triangular solves vectorise over both the
block axis and any outer chain-vmap axis, mapping onto the TPU's batched
small-matrix paths.

Math follows the Woodbury/block-Cholesky scheme of the reference
(``/root/reference/sde/mici_extensions.py:626-993``), re-expressed over this
package's block pytree layout.
"""

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from manifold_mcmc_tpu.ops import smallchol

__all__ = [
    "compute_D_blocks",
    "chol_gram_blocks",
    "lu_jacob_product_blocks",
    "log_det_sqrt_gram_from_chol",
    "logdet_gram_jac_cotangent",
    "lmult_by_jacob_constr",
    "rmult_by_jacob_constr",
    "lmult_by_inv_gram",
    "lmult_by_inv_jacob_product",
]


def _use_unrolled(n):
    """Unrolled tiny-matrix path: on accelerators XLA's loop-based batched
    cholesky/solves are ~100x off the roofline for n <= ~16; on CPU the
    library kernels are fast and the unrolled op DAG only bloats compiles.

    ``jax.default_backend()`` is the process default, not necessarily where
    the traced computation executes, so ``MMT_SMALLCHOL`` overrides the
    heuristic: "on" forces the unrolled path (lets CPU CI integration-test
    the production accelerator dispatch), "off" forces the library kernels,
    unset/"auto" keeps the backend heuristic."""
    import os

    import jax

    mode = os.environ.get("MMT_SMALLCHOL", "auto")
    if mode == "on":
        return n <= smallchol.MAX_UNROLL_DIM
    if mode == "off":
        return False
    return n <= smallchol.MAX_UNROLL_DIM and jax.default_backend() != "cpu"


def _cholesky(D):
    """Batched Cholesky (see :func:`_use_unrolled` for the dispatch)."""
    if _use_unrolled(D.shape[-1]):
        return smallchol.cholesky_small(D)
    return jnp.linalg.cholesky(D)


def _cho_solve(chol, b):
    """Batched solve from a lower Cholesky factor (vector or matrix rhs)."""
    if _use_unrolled(chol.shape[-1]):
        return smallchol.cho_solve_small(chol, b)
    if b.ndim >= 2 and b.shape[-2] == chol.shape[-1] and b.shape[:-2] == chol.shape[:-2]:
        return jsl.cho_solve((chol, True), b)
    return jsl.cho_solve((chol, True), b[..., None])[..., 0]


def _sum_uT_v(du_blocks, other_blocks):
    """``sum_b J_u[b]^T X[b]`` accumulated over blocks (batched or not)."""
    total = 0
    for du, x in zip(du_blocks, other_blocks):
        if du.ndim == 3:
            total = total + jnp.einsum("bij,bik->jk", du, x)
        else:
            total = total + du.T @ x
    return total


def _add_obs_noise_diag(D, dn_l, dn_r, num_state_rows):
    """Add ``sigma_l * sigma_r`` to the leading diagonal entries of ``D``.

    For non-final blocks the last ``num_state_rows`` rows of the constraint
    are state-matching rows with no observation-noise dependence, so only the
    first ``rows - num_state_rows`` diagonal entries receive the noise term.
    """
    rows = D.shape[-1]
    contrib = dn_l * dn_r
    if num_state_rows > 0:
        pad = jnp.zeros(contrib.shape[:-1] + (num_state_rows,), D.dtype)
        contrib = jnp.concatenate([contrib, pad], axis=-1)
    idx = jnp.arange(rows)
    if D.ndim == 3:
        return D.at[:, idx, idx].add(contrib)
    return D.at[idx, idx].add(contrib)


def compute_D_blocks(dv_l, dn_l, dv_r, dn_r, num_state_rows_per_block):
    """Per-block ``D[b] = J_v^l[b] J_v^r[b]^T (+ sigma_l sigma_r diag)``.

    Args:
        dv_l, dv_r: tuples of per-block noise Jacobians, shape
            ``(..., rows, block_noise_dim)``.
        dn_l, dn_r: tuples of per-block observation-noise diagonals (shape
            ``(..., num_obs_rows)``) or ``None`` for noiseless observations.
        num_state_rows_per_block: static tuple giving, per block, how many
            trailing constraint rows are state-matching rows (``dim_x`` for
            non-final blocks, 0 for the final block).
    """
    D_blocks = []
    for b, (dvl, dvr) in enumerate(zip(dv_l, dv_r)):
        D = jnp.einsum("...ij,...kj->...ik", dvl, dvr)
        if dn_l is not None and dn_l[b] is not None:
            D = _add_obs_noise_diag(D, dn_l[b], dn_r[b], num_state_rows_per_block[b])
        D_blocks.append(D)
    return tuple(D_blocks)


def chol_gram_blocks(M_0, du, dv, dn, num_state_rows_per_block):
    """Cholesky factors of the Woodbury decomposition of ``dc M^-1 dc^T``.

    Returns ``(chol_C, chol_D_blocks)`` with ``C = M_0 + J_u^T D^-1 J_u``.

    Backend: ``MMT_GRAM_BACKEND=pallas`` (``pallas-interpret`` on CPU) routes
    the batched middle blocks through the fused single-kernel pipeline in
    :mod:`manifold_mcmc_tpu.ops.pallas_gram`; unset/``jnp`` keeps the pure-XLA
    path below (the default -- traced programs are unchanged).
    """
    import os

    backend = os.environ.get("MMT_GRAM_BACKEND", "jnp")
    if backend.startswith("pallas"):
        return _chol_gram_blocks_pallas(
            M_0, du, dv, dn, num_state_rows_per_block,
            interpret=backend == "pallas-interpret",
        )
    D_blocks = compute_D_blocks(dv, dn, dv, dn, num_state_rows_per_block)
    chol_D = tuple(_cholesky(D) for D in D_blocks)
    D_inv_du = tuple(_cho_solve(cD, dub) for cD, dub in zip(chol_D, du))
    chol_C = _cholesky(M_0 + _sum_uT_v(du, D_inv_du))
    return chol_C, chol_D


def _chol_gram_blocks_pallas(M_0, du, dv, dn, num_state_rows_per_block, interpret):
    """Fused-kernel variant of :func:`chol_gram_blocks` (same contract).

    Batched (ndim-3) blocks run through one Pallas kernel per block group
    (Gram rows, Cholesky, solves and the ``J_u^T D^-1 J_u`` accumulation all
    in VMEM); unbatched initial/final blocks keep the library path, which is
    already cheap at their size.
    """
    from manifold_mcmc_tpu.ops import pallas_gram

    chol_D = []
    total = 0
    for b, (dub, dvb) in enumerate(zip(du, dv)):
        dnb = None if dn is None else dn[b]
        if dvb.ndim == 3 and (dn is None or dnb is not None):
            cD, _, sum_duT, _ = pallas_gram.fused_chol_gram_middle(
                dvb, dub, dnb, num_state_rows_per_block[b], interpret=interpret
            )
            chol_D.append(cD)
            total = total + sum_duT
        else:
            dn_one = None if dnb is None else (dnb,)
            D = compute_D_blocks(
                (dvb,), dn_one, (dvb,), dn_one, (num_state_rows_per_block[b],)
            )[0]
            cD = _cholesky(D)
            D_inv_dub = _cho_solve(cD, dub)
            chol_D.append(cD)
            total = total + _sum_uT_v((dub,), (D_inv_dub,))
    chol_C = _cholesky(M_0 + total)
    return chol_C, tuple(chol_D)


def lu_jacob_product_blocks(M_0, jac_l, jac_r, num_state_rows_per_block):
    """LU factors of the decomposition of the non-symmetric ``dc(q) M^-1 dc(q')^T``.

    ``jac_l`` / ``jac_r`` are ``(du, dv, dn)`` block triples at the two
    points.  Returns ``(lu_piv_C, lu_piv_D_blocks)`` with
    ``C = M_0 + J_u'^T D^-1 J_u`` (Newton projection solver path).
    """
    du_l, dv_l, dn_l = jac_l
    du_r, dv_r, dn_r = jac_r
    D_blocks = compute_D_blocks(dv_l, dn_l, dv_r, dn_r, num_state_rows_per_block)
    lu_piv_D = tuple(jsl.lu_factor(D) for D in D_blocks)
    D_inv_du_l = tuple(
        jsl.lu_solve(lu_piv, dul) for lu_piv, dul in zip(lu_piv_D, du_l)
    )
    lu_piv_C = jsl.lu_factor(M_0 + _sum_uT_v(du_r, D_inv_du_l))
    return lu_piv_C, lu_piv_D


def log_det_sqrt_gram_from_chol(chol_C, chol_D, log_det_sqrt_metric_0=0.0):
    """``(1/2) log det G`` from the Woodbury Cholesky factors.

    ``det G = det C / det M_0 * prod_b det D[b]`` so the half log-determinant
    is the sum of log Cholesky diagonals minus ``(1/2) log det M_0``.
    """
    half_log_det = jnp.log(jnp.abs(chol_C.diagonal(0, -2, -1))).sum(-1)
    for cD in chol_D:
        half_log_det = half_log_det + jnp.log(
            jnp.abs(cD.diagonal(0, -2, -1))
        ).sum((-1, -2) if cD.ndim == 3 else -1)
    return half_log_det - log_det_sqrt_metric_0


def logdet_gram_jac_cotangent(jac, chol, num_state_rows_per_block):
    """Cotangent of ``(1/2) log det G`` with respect to the Jacobian blocks.

    With ``G = dc M^-1 dc^T``, ``d (1/2) log det G = <Sigma, d(dc)>`` where
    ``Sigma = G^-1 dc M^-1``.  Restricted to the blocked layout and expanded
    through the Woodbury identity ``G^-1 = D^-1 - W C^-1 W^T`` with
    ``W[b] = D_b^-1 J_u[b]`` and ``C = M_0 + J_u^T D^-1 J_u``:

    * ``Sigma_du[b] = (G^-1 U)[b] M_0^-1 = W[b] C^-1`` -- the explicit
      ``M_0^-1`` cancels because ``C^-1 (C - M_0) = I - C^-1 M_0``;
    * ``Sigma_dv[b] = (G^-1)[b,b] J_v[b]`` (``J_v`` is block diagonal);
    * ``Sigma_dn[b] = diag((G^-1)[b,b])[:obs_rows] * dn[b]`` (``J_n`` is
      diagonal over the leading observation rows).

    Everything is a batched triangular solve or small einsum against the
    *cached* Cholesky factors -- no differentiation through the
    factorisation.  Feeding the result to the VJP of the blocked-Jacobian
    computation yields the same gradient as reverse-mode AD through
    ``chol_gram_blocks`` + ``log_det_sqrt_gram_from_chol`` (the reference
    differentiates straight through the blocked Cholesky,
    ``/root/reference/sde/mici_extensions.py:1143-1146``) while skipping the
    Cholesky/solve backward passes.

    Args:
        jac: ``(du, dv, dn)`` block triples as returned by
            ``jacob_constr_blocks``.
        chol: ``(chol_C, chol_D_blocks)`` from :func:`chol_gram_blocks` at
            the same point and metric.
        num_state_rows_per_block: static per-block trailing state-row counts
            (as in :func:`compute_D_blocks`).

    Returns:
        ``(S_du, S_dv, S_dn)`` with the exact structure of ``jac``.
    """
    du, dv, dn = jac
    chol_C, chol_D = chol
    dim_u = chol_C.shape[-1]
    C_inv = _cho_solve(chol_C, jnp.eye(dim_u, dtype=chol_C.dtype))
    S_du, S_dv, S_dn = [], [], []
    for b, (dub, dvb, cD) in enumerate(zip(du, dv, chol_D)):
        W = _cho_solve(cD, dub)
        S_du.append(jnp.einsum("...rj,jk->...rk", W, C_inv))
        # Materialise the tiny (rows x rows) diagonal block of G^-1 once --
        # one identity solve in D_b -- then the wide noise axis is a plain
        # matmul (MXU) instead of a triangular solve per noise column.
        rows = cD.shape[-1]
        eye_r = jnp.broadcast_to(jnp.eye(rows, dtype=cD.dtype), cD.shape)
        G_inv_bb = _cho_solve(cD, eye_r) - jnp.einsum(
            "...rj,jk,...sk->...rs", W, C_inv, W
        )
        S_dv.append(jnp.einsum("...rs,...sm->...rm", G_inv_bb, dvb))
        if dn is not None and dn[b] is not None:
            obs_rows = dn[b].shape[-1]
            diag_G_inv = G_inv_bb.diagonal(0, -2, -1)[..., :obs_rows]
            S_dn.append(diag_G_inv * dn[b])
        elif dn is not None:
            S_dn.append(None)
    if dn is None:
        return tuple(S_du), tuple(S_dv), None
    return tuple(S_du), tuple(S_dv), tuple(S_dn)


def _split_c_space(vct, du_blocks):
    """Split a constraint-space vector into per-block parts.

    Batched blocks are reshaped to ``(count, rows)``.
    """
    parts = []
    i = 0
    for du in du_blocks:
        if du.ndim == 3:
            count, rows = du.shape[0], du.shape[1]
            parts.append(vct[i : i + count * rows].reshape(count, rows))
            i += count * rows
        else:
            rows = du.shape[0]
            parts.append(vct[i : i + rows])
            i += rows
    return parts


def _flatten_c_space(parts):
    return jnp.concatenate([p.reshape(-1) for p in parts])


def lmult_by_jacob_constr(jac, layout, vct):
    """Constraint-Jacobian / vector product ``dc @ vct`` in blocked form.

    Args:
        jac: ``(du, dv, dn)`` block triples.
        layout: the static ``QLayout`` describing the flat latent vector.
        vct: flat latent-space vector (length ``layout.dim_q``).
    """
    du, dv, dn = jac
    vct_u = vct[: layout.dim_u]
    out_parts = []
    i = layout.dim_u
    for b, (dub, dvb) in enumerate(zip(du, dv)):
        noise_dim = dvb.shape[-1]
        if dvb.ndim == 3:
            count = dvb.shape[0]
            v_part = vct[i : i + count * noise_dim].reshape(count, noise_dim)
            out = dub @ vct_u + jnp.einsum("bij,bj->bi", dvb, v_part)
            i += count * noise_dim
        else:
            v_part = vct[i : i + noise_dim]
            out = dub @ vct_u + dvb @ v_part
            i += noise_dim
        out_parts.append(out)
    if dn is not None:
        j = layout.dim_q_core
        for b, dnb in enumerate(dn):
            obs_rows = dnb.shape[-1]
            if dnb.ndim == 2:
                count = dnb.shape[0]
                n_part = vct[j : j + count * obs_rows].reshape(count, obs_rows)
                j += count * obs_rows
            else:
                n_part = vct[j : j + obs_rows]
                j += obs_rows
            contrib = dnb * n_part
            rows = out_parts[b].shape[-1]
            if rows > obs_rows:
                pad = jnp.zeros(contrib.shape[:-1] + (rows - obs_rows,), vct.dtype)
                contrib = jnp.concatenate([contrib, pad], axis=-1)
            out_parts[b] = out_parts[b] + contrib
    return _flatten_c_space(out_parts)


def rmult_by_jacob_constr(jac, vct):
    """Vector / constraint-Jacobian product ``vct @ dc`` in blocked form."""
    du, dv, dn = jac
    vct_parts = _split_c_space(vct, du)
    out_u = 0
    for p, dub in zip(vct_parts, du):
        if dub.ndim == 3:
            out_u = out_u + jnp.einsum("bi,bij->j", p, dub)
        else:
            out_u = out_u + p @ dub
    out_v = []
    for p, dvb in zip(vct_parts, dv):
        if dvb.ndim == 3:
            out_v.append(jnp.einsum("bi,bij->bj", p, dvb).reshape(-1))
        else:
            out_v.append(p @ dvb)
    parts = [out_u] + out_v
    if dn is not None:
        for b, (p, dnb) in enumerate(zip(vct_parts, dn)):
            obs_rows = dnb.shape[-1]
            parts.append((p[..., :obs_rows] * dnb).reshape(-1))
    return jnp.concatenate(parts)


def lmult_by_inv_gram(jac, chol, vct):
    """Solve ``G x = vct`` in constraint space via the Woodbury factors."""
    du, dv, dn = jac
    chol_C, chol_D = chol
    vct_parts = _split_c_space(vct, du)
    D_inv_vct = [_cho_solve(cD, p) for cD, p in zip(chol_D, vct_parts)]
    rhs = 0
    for dub, dv_p in zip(du, D_inv_vct):
        if dub.ndim == 3:
            rhs = rhs + jnp.einsum("bij,bi->j", dub, dv_p)
        else:
            rhs = rhs + dub.T @ dv_p
    C_inv_rhs = _cho_solve(chol_C, rhs)
    out_parts = [
        _cho_solve(cD, p - dub @ C_inv_rhs)
        for cD, p, dub in zip(chol_D, vct_parts, du)
    ]
    return _flatten_c_space(out_parts)


def lmult_by_inv_jacob_product(jac_l, jac_r, lu_piv_C, lu_piv_D, vct):
    """Solve ``(dc(q) M^-1 dc(q')^T) x = vct`` via the Woodbury LU factors."""
    du_l, _, _ = jac_l
    du_r, _, _ = jac_r
    vct_parts = _split_c_space(vct, du_l)
    D_inv_vct = [
        jsl.lu_solve(lu_piv, p[..., None])[..., 0]
        for lu_piv, p in zip(lu_piv_D, vct_parts)
    ]
    rhs = 0
    for dub, dv_p in zip(du_r, D_inv_vct):
        if dub.ndim == 3:
            rhs = rhs + jnp.einsum("bij,bi->j", dub, dv_p)
        else:
            rhs = rhs + dub.T @ dv_p
    C_inv_rhs = jsl.lu_solve(lu_piv_C, rhs)
    out_parts = [
        jsl.lu_solve(lu_piv, (p - dul @ C_inv_rhs)[..., None])[..., 0]
        for lu_piv, p, dul in zip(lu_piv_D, vct_parts, du_l)
    ]
    return _flatten_c_space(out_parts)
