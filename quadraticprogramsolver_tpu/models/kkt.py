"""Pluggable KKT linear-system backends (the per-iteration hot kernel).

Re-imagines the reference's strategy pairs ``(LinSysSolInit, LinSysSol!)``
(`/root/reference/LinearSystemSolvers.jl:16-229`) as stateless functions over
an explicit cache pytree:

    init(qp, rho, sigma, settings)            -> cache
    refactor(cache, qp, rho, sigma, settings) -> cache     (rho drifted)
    solve(cache, qp, x, z, y, rho, settings)  -> (xx, zz[, cache])

All backends solve the same reduced system each ADMM iteration: with
M = P + sigma*I + rho*A'A (SPD),

    xx = M^{-1} (sigma*x - q + A'(rho*z - y)),      zz = A @ xx,

which is algebraically identical to the quasi-definite 2x2 KKT solve the
reference's direct backends perform (LinearSystemSolvers.jl:30-44) — the
Schur complement of the (2,2) block — and exactly what its CG backends build
(LinearSystemSolvers.jl:125-142). ``rho`` is per-instance (*B,), so a fleet
of QPs adapts penalties independently under one compiled program.

TPU-first choices:
* CHOLESKY caches the **explicit inverse** M^{-1}: each iteration's solve is
  then a single batched matmul on the MXU instead of two sequential
  triangular solves. Iterative refinement (matvec residual + one more
  matmul) recovers the accuracy lost to the explicit inverse in f32.
* CG is matrix-free with a Jacobi preconditioner under `lax.while_loop`,
  with per-lane convergence masking — the large-problem path where O(n^2)
  storage of M^{-1} is unaffordable (the regime the reference routes to PCG,
  SolveQuadraticProgram.m:190-204).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.problem import QP
from ..core.settings import (
    MAX_DIRECT_KKT_DIM,
    KKTBackendKind,
    Settings,
)
from ..ops.linalg import add_scaled_identity, inf_norm, matvec, matvec_t, spd_inverse, sym


def resolve_backend(kind: KKTBackendKind, qp: QP) -> KKTBackendKind:
    """Static auto-selection, mirroring the reference's direct/iterative switch
    on KKT dimension (`SolveQuadraticProgram.m:190-204`). Density is not
    consulted — the dense batched representation has density 1 by
    construction; problem size alone decides."""
    if kind is not KKTBackendKind.AUTO:
        return kind
    if qp.n + qp.m <= MAX_DIRECT_KKT_DIM:
        return KKTBackendKind.CHOLESKY
    return KKTBackendKind.CG


def _normal_rhs(qp: QP, x, z, y, rho, sigma):
    """sigma*x - q + A'(rho*z - y) — the reduced-KKT right-hand side."""
    return sigma * x - qp.q + matvec_t(qp.A, rho[..., None] * z - y)


def _apply_normal(qp: QP, rho, sigma, v):
    """Matrix-free M @ v = P v + sigma v + rho A'(A v).

    Same operator the reference's matrix-free backends wrap
    (LinearSystemSolvers.jl:152-157)."""
    return matvec(qp.P, v) + sigma * v + rho[..., None] * matvec_t(qp.A, matvec(qp.A, v))


# --------------------------------------------------------------------------
# Dense Cholesky backend (direct path)
# --------------------------------------------------------------------------

def _build_normal_matrix(qp: QP, rho, sigma):
    AtA = jnp.einsum("...ki,...kj->...ij", qp.A, qp.A)
    M = qp.P + rho[..., None, None] * AtA
    return add_scaled_identity(sym(M), sigma)


def cholesky_init(qp: QP, rho, sigma, settings: Settings):
    return {"M_inv": spd_inverse(_build_normal_matrix(qp, rho, sigma))}


def cholesky_refactor(cache, qp: QP, rho, sigma, settings: Settings):
    return cholesky_init(qp, rho, sigma, settings)


def cholesky_solve(cache, qp: QP, x, z, y, rho, settings: Settings):
    sigma = jnp.asarray(settings.sigma, qp.dtype)
    b = _normal_rhs(qp, x, z, y, rho, sigma)
    M_inv = cache["M_inv"]
    xx = matvec(M_inv, b)
    for _ in range(settings.kkt_refinement_steps):
        r = b - _apply_normal(qp, rho, sigma, xx)
        xx = xx + matvec(M_inv, r)
    zz = matvec(qp.A, xx)
    return xx, zz, cache


# --------------------------------------------------------------------------
# Matrix-free PCG backend (iterative path)
# --------------------------------------------------------------------------

def _jacobi_diag_inv(qp: QP, rho, sigma):
    diag_P = jnp.diagonal(qp.P, axis1=-2, axis2=-1)
    diag_AtA = jnp.sum(qp.A * qp.A, axis=-2)
    d = diag_P + sigma + rho[..., None] * diag_AtA
    return jnp.where(d > 0, 1.0 / d, 1.0)


def cg_init(qp: QP, rho, sigma, settings: Settings):
    batch = qp.batch_shape
    return {
        "diag_inv": _jacobi_diag_inv(qp, rho, sigma),
        # Warm start from the previous iteration's solution — the reference's
        # CG backends reuse vXX across iterations the same way
        # (LinearSystemSolvers.jl:135, cg! mutates the previous iterate).
        "xx": jnp.zeros(batch + (qp.n,), qp.dtype),
    }


def cg_refactor(cache, qp: QP, rho, sigma, settings: Settings):
    return {"diag_inv": _jacobi_diag_inv(qp, rho, sigma), "xx": cache["xx"]}


def cg_solve(cache, qp: QP, x, z, y, rho, settings: Settings):
    sigma = jnp.asarray(settings.sigma, qp.dtype)
    b = _normal_rhs(qp, x, z, y, rho, sigma)
    xx = _pcg(
        lambda v: _apply_normal(qp, rho, sigma, v),
        b,
        cache["xx"],
        cache["diag_inv"],
        abs_tol=settings.cg_eps,
        max_iterations=settings.cg_max_iterations,
    )
    zz = matvec(qp.A, xx)
    return xx, zz, {**cache, "xx": xx}


def _pcg(apply_M, b, x0, diag_inv, abs_tol: float, max_iterations: int):
    """Batched Jacobi-preconditioned CG with per-lane convergence masking.

    The tolerance floors at ~10 ulps of ||b|| so float32 lanes terminate
    instead of stalling at the reference's f64-era abstol (m:102, 1e-9).
    """
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    b_norm = jnp.linalg.norm(b, axis=-1)
    tol2 = jnp.maximum(jnp.asarray(abs_tol, dtype), 10 * eps * b_norm) ** 2

    r0 = b - apply_M(x0)
    z0 = diag_inv * r0
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=-1)
    done0 = jnp.sum(r0 * r0, axis=-1) <= tol2

    def cond(carry):
        it, _, _, _, _, done = carry
        return (it < max_iterations) & ~jnp.all(done)

    def body(carry):
        it, xk, rk, pk, rzk, done = carry
        Ap = apply_M(pk)
        pAp = jnp.sum(pk * Ap, axis=-1)
        alpha = jnp.where(done | (pAp <= 0), 0.0, rzk / jnp.where(pAp == 0, 1.0, pAp))
        xk = xk + alpha[..., None] * pk
        rk = rk - alpha[..., None] * Ap
        zk = diag_inv * rk
        rzk1 = jnp.sum(rk * zk, axis=-1)
        beta = jnp.where(done | (rzk == 0), 0.0, rzk1 / jnp.where(rzk == 0, 1.0, rzk))
        pk = zk + beta[..., None] * pk
        done = done | (jnp.sum(rk * rk, axis=-1) <= tol2)
        return it + 1, xk, rk, pk, rzk1, done

    _, x, _, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0, done0))
    return x


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Backend:
    init: Any
    refactor: Any
    solve: Any


BACKENDS = {
    KKTBackendKind.CHOLESKY: Backend(cholesky_init, cholesky_refactor, cholesky_solve),
    KKTBackendKind.CG: Backend(cg_init, cg_refactor, cg_solve),
}


def get_backend(kind: KKTBackendKind, qp: QP) -> Backend:
    kind = resolve_backend(kind, qp)
    if kind not in BACKENDS:
        raise NotImplementedError(f"KKT backend {kind} not implemented yet")
    return BACKENDS[kind]
