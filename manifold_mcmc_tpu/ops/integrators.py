"""Numerical time-stepping schemes for Ito stochastic differential equations.

TPU-native rebuild of the integrator-step factories of the reference
(``/root/reference/sde/integrators.py:8-149``).  The reference constructs the
step maps *symbolically* with SymNum/SymPy and compiles them to JAX with
``symnum.numpify_func``; here every derivative is taken with JAX automatic
differentiation (``jax.jvp`` / ``jax.jacfwd``) applied to plain ``jax.numpy``
drift / diffusion-coefficient functions, so the step functions trace directly
into fused XLA ops (and batch under ``vmap`` / differentiate under ``grad``
with no extra machinery).

All factories share the signature convention of the reference: given

* ``drift_func(x, z) -> a``: drift vector ``a`` of shape ``(dim_x,)``,
* ``diff_coeff(x, z) -> B``: diffusion coefficient matrix of shape
  ``(dim_x, dim_w)``,

they return ``forward_func(z, x, v, dt)`` mapping parameters ``z``, the state
``x`` at time ``t`` and a standard-normal noise vector ``v`` to (an
approximation of) the state at ``t + dt``.

All factories (and the operators they are built from) are **shape
polymorphic over trailing batch axes**: if ``drift_func`` / ``diff_coeff``
broadcast over inputs of shape ``(dim_x, *batch)`` (which plain component
indexing + ``jnp.stack`` style model code does automatically), then the
returned ``forward_func`` accepts ``x: (dim_x, *batch)``,
``v: (dim_v, *batch)`` and maps them elementwise over the batch.  The hot
rollout kernels rely on this to run one step for *all blocks (and chains)*
as a single structure-of-arrays call with the batch in the TPU lane
dimension -- no ``vmap``, no tiny trailing axes.  To keep that property,
every derivative here is a ``jax.jvp`` along broadcast basis tangents
(never ``jacfwd``, whose output axes would land on the wrong side of the
batch).
"""

import jax
import jax.numpy as jnp

__all__ = [
    "euler_maruyama_step",
    "milstein_step",
    "strong_order_1p5_step",
    "diffusion_operator",
    "Lj_operator",
]


def _basis(x, k):
    """Unit tangent along component ``k``, broadcast to ``x``'s full shape."""
    return jnp.zeros_like(x).at[k].set(jnp.ones_like(x[k]))


def _broadcast_tangent(t, x):
    """Broadcast an unbatched tangent ``(dim,)`` to ``x``'s ``(dim, *batch)``."""
    t = jnp.asarray(t, x.dtype)
    if t.ndim < x.ndim:
        t = t.reshape(t.shape + (1,) * (x.ndim - t.ndim))
    return jnp.broadcast_to(t, x.shape)


def _matvec(B, v):
    """``B @ v`` where ``B`` is ``(m, n)`` or batched ``(m, n, *batch)`` and
    ``v`` is ``(n, *batch)``; returns ``(m, *batch)``."""
    if B.ndim == 2 and v.ndim == 1:
        return B @ v
    if B.ndim == 2:
        return jnp.tensordot(B, v, axes=(1, 0))
    return (B * v[None]).sum(axis=1)


def _jvp_x(func, x, z, tangent):
    """Directional derivative of ``x -> func(x, z)`` at ``x`` along ``tangent``."""
    return jax.jvp(lambda x_: func(x_, z), (x,), (_broadcast_tangent(tangent, x),))[1]


def _matrix_hessian_product(func, x, z, matrix):
    """Contract the Hessian of ``x -> func(x, z)`` with a square matrix.

    Returns ``sum_{k,l} matrix[k, l] * d^2 func(x, z) / dx[k] dx[l]`` with the
    same output shape as ``func``.  Computed as ``dim_x^2`` forward-over-
    forward directional derivatives along basis tangents, which stays
    shape-polymorphic over trailing batch axes (``matrix`` entries may be
    scalars or ``(*batch,)`` arrays).
    """
    dim = x.shape[0]
    total = 0.0
    for k in range(dim):
        e_k = _basis(x, k)
        for l in range(dim):
            e_l = _basis(x, l)
            h_kl = jax.jvp(
                lambda x_: _jvp_x(func, x_, z, e_l), (x,), (e_k,)
            )[1]
            total = total + matrix[k, l] * h_kl
    return total


def diffusion_operator(drift_func, diff_coeff):
    """Infinitesimal generator ``L^0`` of an autonomous Ito diffusion.

    For an SDE ``dX = a(X, z) dt + B(X, z) dW`` and a (vector- or
    matrix-valued) function ``f``,

        L^0 f = (df/dx) a + (1/2) sum_{k,l} (B B^T)[k, l] d^2 f / dx_k dx_l.

    AD-based equivalent of the symbolic operator at reference
    ``sde/integrators.py:95-123``.
    """

    def apply_diffusion_operator(func):
        def diffusion_operator_func(x, z):
            a = drift_func(x, z)
            B = diff_coeff(x, z)
            # B B^T with optional trailing batch axes: (dim_x, dim_x, *batch).
            BBt = (B[:, None] * B[None, :]).sum(axis=2)
            return _jvp_x(func, x, z, a) + 0.5 * _matrix_hessian_product(
                func, x, z, BBt
            )

        return diffusion_operator_func

    return apply_diffusion_operator


def Lj_operator(diff_coeff, j=0):
    """Kloeden & Platen ``L^j`` operator: ``(L^j f)(x) = sum_k B[k, j] df/dx_k``.

    AD-based equivalent of reference ``sde/integrators.py:126-149``.
    """

    def apply_Lj(func):
        def Lj_func(x, z):
            B = diff_coeff(x, z)
            return _jvp_x(func, x, z, B[:, j])

        return Lj_func

    return apply_Lj


def euler_maruyama_step(drift_func, diff_coeff):
    """Strong order 0.5 Euler-Maruyama step (reference ``integrators.py:8-14``).

    ``x' = x + dt * a(x, z) + sqrt(dt) * B(x, z) @ v`` with ``v ~ N(0, I)``.
    """

    def forward_func(z, x, v, dt):
        return x + dt * drift_func(x, z) + jnp.sqrt(dt) * _matvec(
            diff_coeff(x, z), v
        )

    return forward_func


def milstein_step(drift_func, diff_coeff, noise_type="diagonal"):
    """Strong order 1.0 Milstein step for diagonal or scalar noise.

    Semantics follow reference ``sde/integrators.py:17-40`` with the Milstein
    correction term computed by AD instead of symbolic differentiation:

    * ``diagonal`` noise (``dim_w == dim_x``, ``B`` diagonal): correction
      component ``i`` is ``B[i,i] * dB[i,i]/dx[i] * (dw_i^2 - dt) / 2``.
    * ``scalar`` noise (``dim_w == 1``): correction is
      ``(L^1 B_col)(x) * (dw^2 - dt) / 2`` with
      ``(L^1 B_col)_i = sum_k B[k,0] dB[i,0]/dx[k]``.
    """
    if noise_type not in ("scalar", "diagonal"):
        raise NotImplementedError(f"Noise type {noise_type} not implemented.")

    def forward_func(z, x, v, dt):
        dw = jnp.sqrt(dt) * v
        a = drift_func(x, z)
        B = diff_coeff(x, z)
        if noise_type == "diagonal":
            # For diagonal noise the correction component i needs the
            # derivative of diagonal entry B[i, i] w.r.t. its own state
            # component x_i: one basis-jvp per component (polymorphic).
            dim = x.shape[0]
            correction = jnp.stack(
                [
                    B[i, i]
                    * _jvp_x(diff_coeff, x, z, _basis(x, i))[i, i]
                    * (dw[i] ** 2 - dt)
                    / 2
                    for i in range(dim)
                ],
                axis=0,
            )
        else:  # scalar noise
            L1_B = _jvp_x(lambda x_, z_: diff_coeff(x_, z_)[:, 0], x, z, B[:, 0])
            correction = L1_B * (dw[0] ** 2 - dt) / 2
        return x + dt * a + _matvec(B, dw) + correction

    return forward_func


def strong_order_1p5_step(drift_func, diff_coeff, noise_type="additive"):
    """Strong order 1.5 Taylor step for additive or scalar noise.

    AD-based rebuild of reference ``sde/integrators.py:43-92`` (Kloeden &
    Platen 1992, Ch. 10.4).  The noise argument ``v`` stacks two independent
    standard normal vectors of length ``dim_w`` used to generate the coupled
    increments

        dw   = sqrt(dt) * v[:dim_w]
        dzeta = dt^{3/2} * (v[:dim_w] + v[dim_w:] / sqrt(3)) / 2

    which have the required covariance ``Cov(dw_j, dzeta_j) = dt^2 / 2``.
    """
    L0 = diffusion_operator(drift_func, diff_coeff)

    if noise_type == "additive":

        def forward_func(z, x, v, dt):
            dim_noise = v.shape[0] // 2
            dw = jnp.sqrt(dt) * v[:dim_noise]
            dzeta = dt * jnp.sqrt(dt) * (v[:dim_noise] + v[dim_noise:] / jnp.sqrt(3.0)) / 2
            Lj_drift_terms = sum(
                Lj_operator(diff_coeff, j)(drift_func)(x, z) * dzeta[j]
                for j in range(dim_noise)
            )
            return (
                x
                + dt * drift_func(x, z)
                + _matvec(diff_coeff(x, z), dw)
                + (dt**2 / 2) * L0(drift_func)(x, z)
                + Lj_drift_terms
            )

    elif noise_type == "scalar":
        L1 = Lj_operator(diff_coeff, 0)

        def diff_col(x, z):
            return diff_coeff(x, z)[:, 0]

        def forward_func(z, x, v, dt):
            dw = jnp.sqrt(dt) * v[:1]
            dzeta = dt * jnp.sqrt(dt) * (v[:1] + v[1:] / jnp.sqrt(3.0)) / 2
            return (
                x
                + dt * drift_func(x, z)
                + _matvec(diff_coeff(x, z), dw)
                + _matvec(L1(diff_coeff)(x, z), (dw**2 - dt)) / 2
                + L1(drift_func)(x, z) * dzeta
                + L0(diff_col)(x, z) * (dw * dt - dzeta)
                + (dt**2 / 2) * L0(drift_func)(x, z)
                + _matvec(L1(L1(diff_coeff))(x, z), (dw**3 / 3 - dt * dw))
            )

    else:
        raise NotImplementedError(f"Noise type {noise_type} not implemented.")

    return forward_func
