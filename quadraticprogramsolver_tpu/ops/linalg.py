"""Small batched linear-algebra primitives shared by solvers and backends.

Everything here operates on arrays with arbitrary leading batch axes and maps
onto the MXU (batched matmuls) or VPU (elementwise/reductions) under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matvec(M: jax.Array, v: jax.Array) -> jax.Array:
    """Batched M @ v: (*B, r, c) x (*B, c) -> (*B, r)."""
    return jnp.einsum("...ij,...j->...i", M, v)


def matvec_t(M: jax.Array, v: jax.Array) -> jax.Array:
    """Batched M.T @ v: (*B, r, c) x (*B, r) -> (*B, c)."""
    return jnp.einsum("...ij,...i->...j", M, v)


def inf_norm(v: jax.Array) -> jax.Array:
    """Batched infinity norm over the last axis; 0 for empty vectors."""
    if v.shape[-1] == 0:
        return jnp.zeros(v.shape[:-1], v.dtype)
    return jnp.max(jnp.abs(v), axis=-1)


def inf_norm_diff(a: jax.Array, b: jax.Array) -> jax.Array:
    """Fused ||a - b||_inf (reference `_NormInfDif`, ProxQP.jl:300-309)."""
    return inf_norm(a - b)


def batch_identity(batch_shape: tuple[int, ...], n: int, dtype) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(n, dtype=dtype), batch_shape + (n, n))


def add_scaled_identity(M: jax.Array, s) -> jax.Array:
    """M + s*I on the last two axes; s scalar or batched (*B,)."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    s = jnp.asarray(s, M.dtype)
    return M + s[..., None, None] * eye if s.ndim else M + s * eye


def sym(M: jax.Array) -> jax.Array:
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def spsd_sqrt(A: jax.Array, rank_tol: float = 1e-10) -> jax.Array:
    """Batched M with M'M = A for (possibly singular) symmetric PSD A.

    Role of the reference's `CalcSPSDSquareRoot` (SPSDMatSquareRoot.jl:63-118),
    which does pivoted-QR rank detection + reduced Cholesky (dense) or shifted
    Cholesky (sparse). The TPU idiom is a batched eigendecomposition: with
    A = V diag(w) V', M = diag(sqrt(w_clipped)) V' satisfies M'M = A, and
    eigenvalues below rank_tol * max(w) are clipped to zero — the same
    numerical-rank cutoff as the reference's R-diagonal test (:100-101).
    Returns M of shape (*B, n, n) (rows beyond the rank are zero).
    """
    w, V = jnp.linalg.eigh(sym(A))
    w_max = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    w = jnp.where(w > rank_tol * w_max, w, 0.0)
    return jnp.sqrt(w)[..., None] * jnp.swapaxes(V, -1, -2)


def spd_inverse(M: jax.Array) -> jax.Array:
    """Batched SPD inverse via Cholesky.

    On TPU the explicit inverse turns every downstream solve into one batched
    matmul (full MXU rate, no sequential triangular dependency) — the TPU
    analogue of the reference caching a CHOLMOD/QDLDL factorization and
    calling ldiv! per iteration (LinearSystemSolvers.jl:30-44). Combined with
    iterative refinement this recovers direct-solve accuracy.
    """
    L = jnp.linalg.cholesky(M)
    eye = batch_identity(M.shape[:-2], M.shape[-1], M.dtype)
    inv = jax.scipy.linalg.cho_solve((L, True), eye)
    return sym(inv)
