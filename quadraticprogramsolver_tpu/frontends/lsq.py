"""Constrained least-squares front-end — the reference README's motivating form.

    min 0.5 ||Ax - b||^2   s.t.   Bx <= c,  Dx = e
    (README.md:20-28: "Any Quadratic Program Solver can solve Constrained
     Least Squares ... as well")

Lowered onto either solver family:
  * canonical box form (P = A'A, q = -A'b, stacked [D; B] rows with l=u=e for
    equalities and (-inf, c] for inequalities) for the OSQP-ADMM solver;
  * split form (A_eq = D, b_eq = e, C = B, d = c) for the ProxQP solver.

All array args may carry leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.problem import QP, ProxQPProblem
from ..core.settings import ProxQPSettings, Settings
from ..models import admm, proxqp
from ..ops.linalg import matvec_t


def _normal_objective(A, b):
    """P = A'A (PSD), q = -A'b for 0.5||Ax-b||^2 (dropping the constant)."""
    P = jnp.einsum("...ki,...kj->...ij", A, A)
    q = -matvec_t(A, b)
    return P, q


def _empty_like(A, rows):
    batch = A.shape[:-2]
    n = A.shape[-1]
    return (jnp.zeros(batch + (rows, n), A.dtype), jnp.zeros(batch + (rows,), A.dtype))


def _check_pairs(B, c, D, e):
    if (B is None) != (c is None):
        raise ValueError("B and c must be provided together (Bx <= c)")
    if (D is None) != (e is None):
        raise ValueError("D and e must be provided together (Dx = e)")


def lsq_to_qp(A, b, B=None, c=None, D=None, e=None) -> QP:
    """Lower the constrained LSQ onto the canonical box form."""
    _check_pairs(B, c, D, e)
    A, b = jnp.asarray(A), jnp.asarray(b)
    P, q = _normal_objective(A, b)
    if B is None:
        B, c = _empty_like(A, 0)
    if D is None:
        D, e = _empty_like(A, 0)
    B, c, D, e = map(jnp.asarray, (B, c, D, e))
    G = jnp.concatenate([D, B], axis=-2)
    l = jnp.concatenate([e, jnp.full(c.shape, -jnp.inf, A.dtype)], axis=-1)
    u = jnp.concatenate([e, c], axis=-1)
    return QP(P=P, q=q, A=G, l=l, u=u)


def lsq_to_proxqp(A, b, B=None, c=None, D=None, e=None) -> ProxQPProblem:
    """Lower the constrained LSQ onto the equality/inequality split form."""
    _check_pairs(B, c, D, e)
    A, b = jnp.asarray(A), jnp.asarray(b)
    P, q = _normal_objective(A, b)
    if B is None:
        B, c = _empty_like(A, 0)
    if D is None:
        D, e = _empty_like(A, 0)
    B, c, D, e = map(jnp.asarray, (B, c, D, e))
    return ProxQPProblem(P=P, q=q, A=D, b=e, C=B, d=c)


def solve_lsq(A, b, B=None, c=None, D=None, e=None,
              settings: Settings = Settings(), x0=None):
    """Solve the constrained LSQ with the OSQP-ADMM solver."""
    return admm.solve(lsq_to_qp(A, b, B, c, D, e), settings, x0)


def solve_lsq_proxqp(A, b, B=None, c=None, D=None, e=None,
                     settings: ProxQPSettings = ProxQPSettings()):
    """Solve the constrained LSQ with the prox-ALM (ProxQP) solver."""
    return proxqp.solve(lsq_to_proxqp(A, b, B, c, D, e), settings)
