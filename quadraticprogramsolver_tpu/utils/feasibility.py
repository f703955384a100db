"""Host-side LP certificates for infeasibility/unboundedness claims.

The device solver flags lanes PRIMAL_INFEASIBLE / DUAL_INFEASIBLE from OSQP
Farkas-direction certificates (models/admm.py:_infeasibility_certificates).
These helpers verify such a claim *independently* on host, in f64, via
scipy's HiGHS LP solver — the role the reference's external oracles (Gurobi,
OSQP) play for its tests (/root/reference/RunTests.jl:74-83). Used by the
driver dry run and tests so a certificate false-positive fails loudly
instead of passing a `status >= 1` smoke check.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize as spo
import scipy.sparse as sp


def primal_feasible(A, l, u, tol: float = 1e-9) -> bool:
    """Does any x satisfy l <= Ax <= u? (Phase-1 LP, exact up to HiGHS tol.)

    A lane flagged PRIMAL_INFEASIBLE is a false positive iff this returns
    True for its constraint data.
    """
    A = sp.csr_matrix(np.asarray(A, np.float64))
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    n = A.shape[1]
    res = spo.linprog(
        c=np.zeros(n),
        A_ub=sp.vstack([A[np.isfinite(u)], -A[np.isfinite(l)]], format="csr"),
        b_ub=np.concatenate([u[np.isfinite(u)] + tol,
                             -(l[np.isfinite(l)] - tol)]),
        bounds=[(None, None)] * n,
        method="highs",
    )
    # status 0 = optimal (feasible point found), 2 = infeasible.
    return res.status == 0


def dual_unbounded(P, q, A, l, u, tol: float = 1e-9) -> bool:
    """Does an unbounded descent ray exist? (OSQP §3.4 dual-infeasibility.)

    The QP is unbounded below iff some dx has P dx = 0, q'dx < 0, and
    (A dx)_i in the recession cone of [l_i, u_i] (zero when both bounds are
    finite, <= 0 when only u_i is, >= 0 when only l_i is). Solved as an LP
    over dx in [-1, 1]^n; a lane flagged DUAL_INFEASIBLE is a false positive
    iff this returns False.
    """
    P = np.asarray(P, np.float64)
    A = np.asarray(A, np.float64)
    q = np.asarray(q, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    fin_l, fin_u = np.isfinite(l), np.isfinite(u)
    both = fin_l & fin_u
    only_u = fin_u & ~fin_l
    only_l = fin_l & ~fin_u
    A_eq = np.vstack([P, A[both]])
    b_eq = np.zeros(A_eq.shape[0])
    A_ub = np.vstack([A[only_u], -A[only_l]])
    b_ub = np.zeros(A_ub.shape[0])
    res = spo.linprog(
        c=q,
        A_ub=A_ub if A_ub.size else None,
        b_ub=b_ub if A_ub.size else None,
        A_eq=A_eq if A_eq.size else None,
        b_eq=b_eq if A_eq.size else None,
        bounds=[(-1.0, 1.0)] * q.size,
        method="highs",
    )
    return res.status == 0 and res.fun < -tol


def verify_status_flags(qp_arrays, status, statuses_to_check=(4, 5)) -> list:
    """Cross-check every lane flagged infeasible/unbounded against the LP
    oracle. Returns a list of (lane, status, reason) false positives.

    qp_arrays: (P, q, A, l, u) batched host arrays; status: (B,) ints
    (4 = PRIMAL_INFEASIBLE, 5 = DUAL_INFEASIBLE).
    """
    P, q, A, l, u = (np.asarray(a) for a in qp_arrays)
    status = np.asarray(status)
    bad = []
    for i in np.where(np.isin(status, statuses_to_check))[0]:
        if status[i] == 4 and primal_feasible(A[i], l[i], u[i]):
            bad.append((int(i), 4, "flagged primal-infeasible but feasible"))
        if status[i] == 5 and not dual_unbounded(P[i], q[i], A[i], l[i], u[i]):
            bad.append((int(i), 5, "flagged dual-infeasible but bounded"))
    return bad
