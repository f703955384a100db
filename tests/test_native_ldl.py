"""Native sparse LDL' (C++ via ctypes) — correctness vs scipy and use in the
oracle's quasi-definite KKT role."""

import numpy as np
import pytest
import scipy.sparse as sp

from quadraticprogramsolver_tpu.problems.generator import ProblemClass, generate_random_qp
from quadraticprogramsolver_tpu.utils.native import LDLFactorization, kkt_factorization


def _random_kkt(n=30, m=15, rho=0.7, sigma=1e-6, seed=0, density=0.3):
    rng = np.random.default_rng(seed)
    M = sp.random(n, n, density=density, random_state=np.random.default_rng(seed + 1),
                  data_rvs=rng.standard_normal)
    P = (M.T @ M + 0.01 * sp.identity(n)).tocsc()
    A = sp.random(m, n, density=density, random_state=np.random.default_rng(seed + 2),
                  data_rvs=rng.standard_normal).tocsc()
    K = sp.bmat([[P + sigma * sp.identity(n), A.T],
                 [A, -sp.identity(m) / rho]], format="csc")
    return K, n, m


def test_factor_reconstructs_matrix():
    K, n, m = _random_kkt()
    f = LDLFactorization(K)
    N = n + m
    L = sp.csc_matrix(
        (f._Lx, f._Li, f._Lp), shape=(N, N)).toarray() + np.eye(N)
    rebuilt = L @ np.diag(f.D) @ L.T
    assert np.abs(rebuilt - K.toarray()).max() <= 1e-10


def test_quasi_definite_signature():
    K, n, m = _random_kkt()
    f = LDLFactorization(K)
    assert f.num_positive_pivots == n
    assert (f.D[:] != 0).all()
    assert (np.sort(f.D)[::-1][:n] > 0).all()


def test_solve_matches_scipy():
    K, n, m = _random_kkt(seed=3)
    f = LDLFactorization(K)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n + m)
    x = f.solve(b)
    x_ref = sp.linalg.spsolve(K.tocsc(), b)
    assert np.abs(x - x_ref).max() <= 1e-8
    # multi-RHS
    B = rng.standard_normal((n + m, 3))
    X = f.solve(B)
    for j in range(3):
        assert np.abs(X[:, j] - sp.linalg.spsolve(K.tocsc(), B[:, j])).max() <= 1e-8


def test_refactor_same_pattern():
    K, n, m = _random_kkt(seed=5, rho=0.5)
    f = LDLFactorization(K)
    K2, _, _ = _random_kkt(seed=5, rho=2.0)  # same pattern, new rho
    f.refactor(K2)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n + m)
    assert np.abs(f.solve(b) - sp.linalg.spsolve(K2.tocsc(), b)).max() <= 1e-8


def test_refactor_rejects_new_pattern():
    K, _, _ = _random_kkt(seed=7)
    f = LDLFactorization(K)
    other = sp.identity(K.shape[0], format="csc")
    with pytest.raises(ValueError, match="pattern"):
        f.refactor(other)


def test_dense_spd():
    rng = np.random.default_rng(2)
    n = 20
    M = rng.standard_normal((n, n))
    S = M @ M.T + np.eye(n)
    f = LDLFactorization(sp.csc_matrix(S))
    assert f.num_positive_pivots == n
    b = rng.standard_normal(n)
    assert np.abs(f.solve(b) - np.linalg.solve(S, b)).max() <= 1e-9


def test_kkt_factorization_on_generated_problem():
    data = generate_random_qp(ProblemClass.RANDOM_QP, 40, seed=1)
    f = kkt_factorization(data.P, data.A, rho=0.1, sigma=1e-6)
    assert f.num_positive_pivots == data.n
    rng = np.random.default_rng(3)
    b = rng.standard_normal(data.n + data.m)
    K = sp.bmat([[data.P + 1e-6 * sp.identity(data.n), data.A.T],
                 [data.A, -sp.identity(data.m) / 0.1]], format="csc")
    assert np.abs(K @ f.solve(b) - b).max() <= 1e-9


def test_not_quasi_definite_detected():
    # A singular matrix hits a zero pivot.
    Z = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 1.0]]))
    with pytest.raises(ArithmeticError):
        LDLFactorization(Z)


def test_mindeg_ordering_valid_and_fill_reducing():
    """The native minimum-degree ordering is a permutation, and on an
    arrow matrix (dense first row/col) it slashes fill: natural order fills
    L completely (~n^2/2), ordering the hub last keeps L linear."""
    from quadraticprogramsolver_tpu.utils.native import mindeg_ordering

    n = 200
    rows = [0] * (n - 1) + list(range(n))
    cols = list(range(1, n)) + list(range(n))
    vals = [0.1] * (n - 1) + [float(n)] * n
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    A = (A + A.T).tocsc()  # symmetric arrow, diagonal dominant (SPD)
    perm = mindeg_ordering(A)
    assert sorted(perm.tolist()) == list(range(n))
    f_nat = LDLFactorization(A, ordering="natural")
    f_amd = LDLFactorization(A, ordering="mindeg")
    assert f_nat.nnz_L == n * (n - 1) // 2          # complete fill
    assert f_amd.nnz_L <= 2 * n                     # hub eliminated last
    # Both must still solve correctly.
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    x_ref = sp.linalg.spsolve(A, b)
    assert np.abs(f_nat.solve(b) - x_ref).max() <= 1e-8
    assert np.abs(f_amd.solve(b) - x_ref).max() <= 1e-8


def test_mindeg_on_quasi_definite_kkt():
    """Permuted quasi-definite KKT stays factorizable (Vanderbei) and the
    solve/refactor round trip stays in the original index space."""
    K, n, m = _random_kkt(seed=7, rho=0.5)
    f = LDLFactorization(K, ordering="mindeg")
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n + m)
    x_ref = sp.linalg.spsolve(K.tocsc(), b)
    assert np.abs(f.solve(b) - x_ref).max() <= 1e-8
    assert f.num_positive_pivots == n
    K2, _, _ = _random_kkt(seed=7, rho=2.0)  # same pattern, new rho
    f.refactor(K2)
    x2 = f.solve(b)
    assert np.abs(x2 - sp.linalg.spsolve(K2.tocsc(), b)).max() <= 1e-8


def test_kkt_factorization_default_ordering_solves():
    data = generate_random_qp(ProblemClass.RANDOM_QP, 40, seed=2)
    f = kkt_factorization(data.P, data.A, rho=0.3, sigma=1e-6)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(data.n + data.m)
    K = sp.bmat([[data.P + 1e-6 * sp.identity(data.n), data.A.T],
                 [data.A, -sp.identity(data.m) / 0.3]], format="csc")
    assert np.abs(f.solve(b) - sp.linalg.spsolve(K, b)).max() <= 1e-7


def test_mindeg_matches_scipy_fill_ballpark():
    """Sanity vs an established ordering: our mindeg fill is within 2x of
    scipy's COLAMD-based spsolve... approximated here by comparing against
    reverse-Cuthill-McKee, which scipy ships."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from quadraticprogramsolver_tpu.utils.native import mindeg_ordering

    K, n, m = _random_kkt(n=60, m=30, seed=11, density=0.1)
    perm_rcm = np.asarray(reverse_cuthill_mckee(K.tocsr(), symmetric_mode=True))
    Krcm = K[perm_rcm, :][:, perm_rcm].tocsc()
    f_rcm = LDLFactorization(Krcm, ordering="natural")
    f_md = LDLFactorization(K, ordering="mindeg")
    assert f_md.nnz_L <= 2 * f_rcm.nnz_L
