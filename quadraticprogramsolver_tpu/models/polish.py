"""Solution polishing — masked active-set refinement with static shapes.

Re-designs the reference polish step (`/root/reference/SolveQuadraticProgram.m:289-325`):
there, rows of A with y<0 (lower-active) / y>0 (upper-active) are *sliced out*
to form a reduced KKT system, delta-regularized, and solved by repeated MINRES
refinement, accepted only on convergence.

Row slicing means dynamic shapes — a non-starter under XLA. Instead we keep
the full (m)-row system and *mask*: inactive rows of A are zeroed and their
dual equations replaced by nu_i = 0, so the polished system is

    [[P + delta*I,  E'], [E,  -R]] [x; nu] = [-q; g],
    E = diag(active) A,  R = diag(active ? delta : 1),  g = l or u on active rows,

which has the same solution as the reference's reduced system on active rows
and pins nu = 0 elsewhere. Infinite bounds are never active (SURVEY.md §7).

The quasi-definite system is solved by Schur complement on the SPD block —
two batched Cholesky solves on the MXU — then iteratively refined against the
full KKT operator `polish_refinement_steps` times (the analogue of the
reference's numPolishItr MINRES sweeps, m:314-320). Acceptance is per-lane:
the polished x replaces the ADMM x only where it reduces the measured KKT
error, mirroring the reference's accept-only-if-converged guard (m:322-325).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.problem import QP
from ..core.settings import Settings
from ..ops.linalg import add_scaled_identity, inf_norm, matvec, matvec_t, spd_inverse, sym


def _kkt_error(qp: QP, x, y):
    """max(dual residual, bound violation) — the polish acceptance metric."""
    Ax = matvec(qp.A, x)
    res_dual = inf_norm(matvec(qp.P, x) + qp.q + matvec_t(qp.A, y))
    viol = inf_norm(Ax - jnp.clip(Ax, qp.l, qp.u))
    return jnp.maximum(res_dual, viol)


def polish(qp: QP, settings: Settings, x, z, y, rho):
    """Refine (x, y) on the active set identified by sign(y). Batched.

    Returns (x, y) with per-lane acceptance.
    """
    dt = qp.dtype
    delta = jnp.asarray(settings.delta, dt)

    # Active set from the dual signs (m:293-294); infinite bounds never bind.
    low_active = (y < 0) & jnp.isfinite(qp.l)
    up_active = (y > 0) & jnp.isfinite(qp.u)
    active = low_active | up_active
    g = jnp.where(low_active, qp.l, 0.0) + jnp.where(up_active, qp.u, 0.0)
    g = g.astype(dt)

    E = jnp.where(active[..., None], qp.A, 0.0)
    r_diag = jnp.where(active, delta, jnp.asarray(1.0, dt))

    # Schur-complement direct solve of [[H, E'], [E, -R]].
    H_inv = spd_inverse(add_scaled_identity(sym(qp.P), delta))
    EHiEt = jnp.einsum("...ik,...kl,...jl->...ij", E, H_inv, E)
    S = sym(EHiEt) + r_diag[..., None] * jnp.eye(qp.m, dtype=dt)
    S_inv = spd_inverse(S)

    def kkt_solve(rx, rn):
        """Solve [[H, E'], [E, -R]] [dx; dn] = [rx; rn] via cached inverses."""
        w = matvec(H_inv, rx)
        dn = matvec(S_inv, matvec(E, w) - rn)
        dx = w - matvec(H_inv, matvec_t(E, dn))
        return dx, dn

    def kkt_apply(px, pn):
        return (
            matvec(qp.P, px) + delta * px + matvec_t(E, pn),
            matvec(E, px) - r_diag * pn,
        )

    bx, bn = -qp.q, g
    px, pn = kkt_solve(bx, bn)
    # Iterative refinement against the *unregularized-in-P* operator — the
    # analogue of the reference's repeated MINRES correction (m:314-320).
    for _ in range(max(1, settings.polish_iterations) - 1):
        ax, an = kkt_apply(px, pn)
        dx, dn = kkt_solve(bx - ax, bn - an)
        px, pn = px + dx, pn + dn

    err_before = _kkt_error(qp, x, y)
    err_after = _kkt_error(qp, px, pn)
    accept = (err_after < err_before) & jnp.all(jnp.isfinite(px), axis=-1)

    x_out = jnp.where(accept[..., None], px, x)
    y_out = jnp.where(accept[..., None], pn, y)
    return x_out, y_out
