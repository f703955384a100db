"""Operator builders + SPSD square root + the monotone-smoothing application
end-to-end through both solver families (the ProxQP002 demo, oracle-checked)."""

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.models import proxqp
from quadraticprogramsolver_tpu.ops.linalg import spsd_sqrt
from quadraticprogramsolver_tpu.problems.operators import (
    difference_operator,
    monotone_smoothing_qp,
    monotonicity_operator,
)
from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference


def test_difference_operator_derivatives():
    n = 50
    t = np.linspace(0, 1, n)
    # Second difference of a quadratic is constant: d2(t^2)*h^-2 -> 2.
    D2 = difference_operator(2, n)
    h = t[1] - t[0]
    vals = D2 @ (t**2) / h**2
    assert np.allclose(vals, 2.0, atol=1e-8)
    # First difference of a linear function is its slope.
    D1 = difference_operator(1, n)
    assert np.allclose(D1 @ (3.0 * t) / h, 3.0, atol=1e-8)
    assert D2.shape == (n - 2, n)


def test_monotonicity_operator_signs():
    # Reference values rise on [0,4], fall on [4,8].
    y = np.array([0.0, 1, 2, 3, 4, 3, 2, 1, 0])
    M = monotonicity_operator([0, 4, 8], y)
    assert M.shape == (8, 9)
    x_good = np.array([0.0, 0.5, 1, 2, 5, 4, 3, 1, 0.5])  # up then down
    assert (M @ x_good <= 1e-12).all()
    x_bad = np.array([0.0, -0.5, 1, 2, 5, 4, 3, 1, 0.5])  # dips while rising
    assert (M @ x_bad > 0).any()


def test_monotone_smoothing_end_to_end():
    rng = np.random.default_rng(0)
    n = 40
    t = np.linspace(0, 1, n)
    truth = np.sin(np.pi * t)  # rises then falls
    y = truth + 0.05 * rng.standard_normal(n)
    ref_idx = [0, n // 2, n - 1]
    P, q, C, d = monotone_smoothing_qp(y, ref_idx, smooth_order=2, lam=0.5)

    # Oracle on the box form.
    m = C.shape[0]
    ref = solve_qp_reference(P, q, C, np.full(m, -np.inf), d,
                             eps_abs=1e-10, eps_rel=1e-10)
    assert ref.status == 3

    # ProxQP family.
    prob = qps.make_proxqp(P, q, np.zeros((0, n)), np.zeros(0), C, d,
                           dtype=np.float64)
    sol = proxqp.solve_jit(prob, qps.ProxQPSettings(
        max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.info.converged)
    assert np.abs(np.asarray(sol.x) - ref.x).max() <= 1e-5

    # OSQP-ADMM family on the box form.
    box = qps.make_qp(P, q, C, np.full(m, -np.inf), d, dtype=np.float64)
    sol2 = qps.solve_jit(box, qps.Settings(eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
                                           max_iterations=20000))
    assert np.abs(np.asarray(sol2.x) - ref.x).max() <= 1e-5

    # The smoothed signal is piecewise monotone (the constraint's purpose).
    x = np.asarray(sol.x)
    assert (np.diff(x[: n // 2 + 1]) >= -1e-7).all()
    assert (np.diff(x[n // 2:]) <= 1e-7).all()


def test_spsd_sqrt_full_rank():
    rng = np.random.default_rng(1)
    n = 16
    W = rng.standard_normal((n, n))
    A = W @ W.T + 0.1 * np.eye(n)
    M = np.asarray(spsd_sqrt(A))
    assert np.abs(M.T @ M - A).max() <= 1e-8


def test_spsd_sqrt_singular():
    rng = np.random.default_rng(2)
    n, r = 20, 7
    W = rng.standard_normal((n, r))
    A = W @ W.T  # rank r, singular PSD
    M = np.asarray(spsd_sqrt(A))
    assert np.abs(M.T @ M - A).max() <= 1e-8
    # Numerical rank respected: only r nonzero rows.
    assert (np.abs(M).max(axis=1) > 1e-8).sum() == r


def test_spsd_sqrt_batched():
    rng = np.random.default_rng(3)
    W = rng.standard_normal((4, 10, 10))
    A = np.einsum("bij,bkj->bik", W, W)
    M = np.asarray(spsd_sqrt(A))
    rebuilt = np.einsum("bji,bjk->bik", M, M)
    assert np.abs(rebuilt - A).max() <= 1e-7


def test_monotone_smoothing_sparse_scale():
    """The ProxQP application at matrix-free scale (a suite-sized stand-in
    for benchmarks/large_smoothing.py's n=5e4 run): n=2000 through
    make_sparse_proxqp + CG + Anderson, exact piecewise monotonicity."""
    import scipy.sparse as sp

    from quadraticprogramsolver_tpu.models import proxqp
    from quadraticprogramsolver_tpu.problems.operators import (
        monotone_smoothing_sparse_qp)

    n = 2000
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, n)
    y = np.sin(np.pi * t) + 0.05 * rng.standard_normal(n)
    ref_idx = np.array([0, n // 2, n - 1])
    P, q, C, d = monotone_smoothing_sparse_qp(y, ref_idx, smooth_order=2,
                                              lam=50.0)
    A = sp.csr_matrix(([1.0], ([0], [0])), shape=(1, n))
    b = np.array([y[0]])
    sprob = qps.make_sparse_proxqp(P, q, A, b, C, d, dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-6, eps_rel=1e-6,
                            cg_eps=1e-10, cg_max_iterations=300,
                            anderson_memory=8)
    sol = proxqp.solve_jit(sprob, st)
    assert int(sol.info.status) == 3, int(sol.info.status)
    x = np.asarray(sol.x)
    half = n // 2
    assert (np.diff(x[: half + 1]) >= -1e-6).all()
    assert (np.diff(x[half:]) <= 1e-6).all()
    assert abs(x[0] - y[0]) <= 1e-6
