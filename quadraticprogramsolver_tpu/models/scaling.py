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
