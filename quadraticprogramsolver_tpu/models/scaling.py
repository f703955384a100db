"""Modified Ruiz equilibration (problem scaling).

The reference lists "Implement the scaling procedure from the reference
paper" as To-Do #2 (README.md:69-75) and never implemented it. This is the
OSQP §5.1 modified Ruiz scheme for the dense batched form: iteratively
equilibrate the column inf-norms of the KKT block matrix [[P, A'], [A, 0]]
with diagonal D (variables) and E (constraints) plus a cost normalization c,

    P' = c D P D,  q' = c D q,  A' = E A D,  l' = E l,  u' = E u,

recovering x = D x', z = E^{-1} z', y = E y' / c. Everything is batched
elementwise math plus reductions — pure VPU work under one jit, a few
equivalent matvec sweeps total.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.problem import QP
from ..core.pytree import pytree_dataclass as _pytree_dataclass


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class ScalingData:
    d: jax.Array   # (*B, n) variable scaling
    e: jax.Array   # (*B, m) constraint scaling
    c: jax.Array   # (*B,) cost scaling


def _safe_rsqrt_norm(norms):
    """1/sqrt(norm) with unit fallback for structurally-zero rows/cols."""
    return jnp.where(norms > 0, jax.lax.rsqrt(jnp.maximum(norms, 1e-30)), 1.0)


def equilibrate(qp: QP, num_iters: int = 10):
    """Returns (scaled_qp, ScalingData). Bounds may contain +-inf (E is
    positive and finite, so infinite bounds stay infinite)."""
    dt = qp.dtype
    batch = qp.batch_shape
    n, m = qp.n, qp.m

    def body(_, carry):
        P, A, q, d, e, c = carry
        col_P = jnp.max(jnp.abs(P), axis=-2)                   # (*B, n)
        col_A = (jnp.max(jnp.abs(A), axis=-2) if m
                 else jnp.zeros(batch + (n,), dt))             # (*B, n)
        dx = _safe_rsqrt_norm(jnp.maximum(col_P, col_A))
        dz = (_safe_rsqrt_norm(jnp.max(jnp.abs(A), axis=-1)) if m
              else jnp.zeros(batch + (0,), dt))
        P = dx[..., :, None] * P * dx[..., None, :]
        A = dz[..., :, None] * A * dx[..., None, :] if m else A
        q = dx * q
        d = d * dx
        e = e * dz
        # Cost normalization (OSQP: mean column norm of P vs ||q||_inf).
        mean_col = jnp.mean(jnp.max(jnp.abs(P), axis=-2), axis=-1)
        q_norm = jnp.max(jnp.abs(q), axis=-1) if n else jnp.zeros(batch, dt)
        g_den = jnp.maximum(mean_col, q_norm)
        g = jnp.where(g_den > 0, 1.0 / jnp.maximum(g_den, 1e-30), 1.0)
        P = g[..., None, None] * P
        q = g[..., None] * q
        c = c * g
        return P, A, q, d, e, c

    init = (qp.P, qp.A, qp.q,
            jnp.ones(batch + (n,), dt), jnp.ones(batch + (m,), dt),
            jnp.ones(batch, dt))
    P, A, q, d, e, c = jax.lax.fori_loop(0, num_iters, body, init)
    scaled = QP(P=P, q=q, A=A, l=e * qp.l, u=e * qp.u)
    return scaled, ScalingData(d=d, e=e, c=c)


def equilibrate_sparse_host(P, q, A, l, u, num_iters: int = 10):
    """Host-side modified Ruiz for scipy sparse problems (the large
    matrix-free path).

    Same math as :func:`equilibrate`, run once on CSR at construction time —
    the ELL container then stores the *scaled* problem and the solver maps
    residuals back through ``term_scale`` (solve(..., scaling=...)), so
    termination stays on unscaled residuals (OSQP's discipline).

    Returns (P_s, q_s, A_s, l_s, u_s, ScalingData) with scipy/numpy values;
    feed the first five to :func:`~..core.sparse_problem.make_sparse_qp`.
    """
    import numpy as np
    import scipy.sparse as sp

    P = sp.csr_matrix(P, dtype=np.float64)
    A = sp.csr_matrix(A, dtype=np.float64)
    q = np.asarray(q, np.float64).copy()
    n = q.shape[0]
    m = A.shape[0]
    d = np.ones(n)
    e = np.ones(m)
    c = 1.0

    def col_abs_max(M):
        # max |M_ij| per column; .max per axis on csc is efficient.
        if M.nnz == 0:
            return np.zeros(M.shape[1])
        return np.abs(M).max(axis=0).toarray().ravel()

    def row_abs_max(M):
        if M.nnz == 0:
            return np.zeros(M.shape[0])
        return np.abs(M).max(axis=1).toarray().ravel()

    for _ in range(num_iters):
        col_P = col_abs_max(P)                     # symmetric, but exact mirror
        col_A = col_abs_max(A) if m else np.zeros(n)
        norms = np.maximum(col_P, col_A)
        dx = np.where(norms > 0, 1.0 / np.sqrt(np.maximum(norms, 1e-30)), 1.0)
        row_A = row_abs_max(A) if m else np.zeros(0)
        dz = np.where(row_A > 0, 1.0 / np.sqrt(np.maximum(row_A, 1e-30)), 1.0)
        Dx = sp.diags(dx)
        P = Dx @ P @ Dx
        if m:
            A = sp.diags(dz) @ A @ Dx
        q *= dx
        d *= dx
        e *= dz
        mean_col = col_abs_max(P).mean() if n else 0.0
        q_norm = np.abs(q).max() if n else 0.0
        g_den = max(mean_col, q_norm)
        g = 1.0 / max(g_den, 1e-30) if g_den > 0 else 1.0
        P = g * P
        q *= g
        c *= g

    l_s = e * np.asarray(l, np.float64)
    u_s = e * np.asarray(u, np.float64)
    scal = ScalingData(d=jnp.asarray(d), e=jnp.asarray(e),
                       c=jnp.asarray(c))
    return P.tocsr(), q, A.tocsr(), l_s, u_s, scal


def scale_iterates(scaling: ScalingData, x=None, z=None, y=None):
    """Map unscaled warm starts into the scaled space."""
    xs = None if x is None else x / scaling.d
    zs = None if z is None else scaling.e * z
    ys = None if y is None else scaling.c[..., None] * y / scaling.e
    return xs, zs, ys


def unscale_iterates(scaling: ScalingData, x, z, y):
    """Map scaled-space solution back: x = D x', z = E^-1 z', y = E y'/c."""
    return (
        scaling.d * x,
        z / scaling.e,
        scaling.e * y / scaling.c[..., None],
    )
