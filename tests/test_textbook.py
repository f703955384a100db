"""Textbook QPs (Hock-Schittkowski) with independently derived optima.

Each problem's exact solution is computed IN THE TEST from its known active
set via a plain numpy equality-constrained KKT solve (independent of every
solver code path in this package), then self-validated against the full KKT
conditions (primal feasibility, multiplier signs, stationarity) so a wrong
active set cannot silently pass. The ADMM solver must reproduce it.

Complements the random-family parity sweep: these are the classic curated
instances (the Maros-Meszaros style of fixture BASELINE.md references) with
structure the random families never produce (exactly binding inequalities,
zero variables at bounds).
"""

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps

SETTINGS = qps.Settings(max_iterations=50_000, eps_abs=1e-10, eps_rel=1e-10,
                        rho=0.1, adaptive_rho=True)


def _exact_from_active_set(P, q, A_eq, b_eq):
    """Solve the equality-constrained KKT system [P A'; A 0][x;nu]=[-q;b]."""
    n, me = P.shape[0], A_eq.shape[0]
    K = np.block([[P, A_eq.T], [A_eq, np.zeros((me, me))]])
    v = np.linalg.solve(K, np.concatenate([-q, b_eq]))
    return v[:n], v[n:]


def _check_kkt(P, q, A, l, u, x, tol=1e-9):
    """Full-problem KKT certificate for the candidate optimum."""
    r = A @ x
    assert (r >= l - tol).all() and (r <= u + tol).all(), "infeasible"
    # Stationarity with multipliers recovered by least squares on the
    # active rows (sign-checked below).
    fin_l, fin_u = np.isfinite(l), np.isfinite(u)
    # Mask the infinite bounds BEFORE the arithmetic: inf inside np.where's
    # discarded branch still evaluates and warns.
    lf = np.where(fin_l, l, 0.0)
    uf = np.where(fin_u, u, 0.0)
    act_l = fin_l & (r <= np.where(fin_l, lf + 1e-7 * (1 + np.abs(lf)), -np.inf))
    act_u = fin_u & (r >= np.where(fin_u, uf - 1e-7 * (1 + np.abs(uf)), np.inf))
    act = act_l | act_u
    g = P @ x + q
    if act.any():
        y_act, *_ = np.linalg.lstsq(A[act].T, -g, rcond=None)
        y = np.zeros(A.shape[0])
        y[act] = y_act
    else:
        y = np.zeros(A.shape[0])
    assert np.abs(g + A.T @ y).max() <= 1e-7 * (1 + np.abs(g).max()), "not stationary"
    # Sign conditions: lower-active rows need y <= 0, upper-active y >= 0.
    assert (y[act_l & ~act_u] <= tol).all()
    assert (y[act_u & ~act_l] >= -tol).all()


def _solve_and_compare(P, q, A, l, u, x_star, atol=5e-7):
    _check_kkt(P, q, A, l, u, x_star)
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    sol = qps.solve_jit(qp, SETTINGS)
    assert bool(sol.info.solved), int(sol.info.status)
    dev = np.abs(np.asarray(sol.x) - x_star).max()
    assert dev <= atol, (dev, np.asarray(sol.x), x_star)
    return sol


def test_hs21():
    # min 0.01 x1^2 + x2^2 - 100   s.t. 10 x1 - x2 >= 10,
    # 2 <= x1 <= 50, -50 <= x2 <= 50.  Optimum x* = (2, 0), f* = -99.96.
    P = np.diag([0.02, 2.0])
    q = np.zeros(2)
    A = np.array([[10.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([10.0, 2.0, -50.0])
    u = np.array([np.inf, 50.0, 50.0])
    x_star = np.array([2.0, 0.0])          # x1 at its lower bound
    sol = _solve_and_compare(P, q, A, l, u, x_star)
    f = 0.5 * x_star @ P @ x_star - 100.0
    assert np.isclose(f, -99.96)
    assert np.isclose(float(sol.info.objective) - 100.0, -99.96, atol=1e-6)


def test_hs35():
    # Beale: min 9 - 8x1 - 6x2 - 4x3 + 2x1^2 + 2x2^2 + x3^2 + 2x1x2 + 2x1x3
    # s.t. x >= 0, x1 + x2 + 2x3 <= 3.  x* = (4/3, 7/9, 4/9), f* = 1/9.
    P = np.array([[4.0, 2.0, 2.0], [2.0, 4.0, 0.0], [2.0, 0.0, 2.0]])
    q = np.array([-8.0, -6.0, -4.0])
    A = np.vstack([np.array([[1.0, 1.0, 2.0]]), np.eye(3)])
    l = np.array([-np.inf, 0.0, 0.0, 0.0])
    u = np.array([3.0, np.inf, np.inf, np.inf])
    # Known active set: the linear constraint binds; bounds inactive.
    x_star, _ = _exact_from_active_set(P, q, np.array([[1.0, 1.0, 2.0]]),
                                       np.array([3.0]))
    assert np.allclose(x_star, [4 / 3, 7 / 9, 4 / 9])
    sol = _solve_and_compare(P, q, A, l, u, x_star)
    assert np.isclose(float(sol.info.objective) + 9.0, 1 / 9, atol=1e-7)


def test_hs76():
    # min x1^2 + 0.5x2^2 + x3^2 + 0.5x4^2 - x1x3 + x3x4 - x1 - 3x2 + x3 - x4
    # s.t. x >= 0, x1+2x2+x3+x4 <= 5, 3x1+x2+2x3-x4 <= 4, x2+4x3 >= 1.5.
    # Known optimum f* = -4.681818... with active set {x1+2x2+x3+x4 = 5, x3 = 0}.
    P = np.array([[2.0, 0.0, -1.0, 0.0],
                  [0.0, 1.0, 0.0, 0.0],
                  [-1.0, 0.0, 2.0, 1.0],
                  [0.0, 0.0, 1.0, 1.0]])
    q = np.array([-1.0, -3.0, 1.0, -1.0])
    A = np.vstack([
        np.array([[1.0, 2.0, 1.0, 1.0],
                  [3.0, 1.0, 2.0, -1.0],
                  [0.0, 1.0, 4.0, 0.0]]),
        np.eye(4),
    ])
    l = np.array([-np.inf, -np.inf, 1.5, 0.0, 0.0, 0.0, 0.0])
    u = np.array([5.0, 4.0, np.inf, np.inf, np.inf, np.inf, np.inf])
    A_act = np.array([[1.0, 2.0, 1.0, 1.0],
                      [0.0, 0.0, 1.0, 0.0]])
    x_star, _ = _exact_from_active_set(P, q, A_act, np.array([5.0, 0.0]))
    sol = _solve_and_compare(P, q, A, l, u, x_star)
    assert np.isclose(float(sol.info.objective), -4.681818181818, atol=1e-7)


def test_hs118_style_box_qp():
    # A separable box QP with every variable at an interior optimum or a
    # bound, exercising polish on a mixed active set: min sum 0.5(x_i - c_i)^2
    # with box [0, 1]^n; x* = clip(c, 0, 1) exactly.
    rng = np.random.default_rng(0)
    n = 16
    c = rng.uniform(-0.5, 1.5, n)
    P = np.eye(n)
    q = -c
    A = np.eye(n)
    l = np.zeros(n)
    u = np.ones(n)
    x_star = np.clip(c, 0.0, 1.0)
    import dataclasses

    st = dataclasses.replace(SETTINGS, polish_iterations=5)
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    sol = qps.solve_jit(qp, st)
    assert bool(sol.info.solved)
    assert np.abs(np.asarray(sol.x) - x_star).max() <= 1e-9
