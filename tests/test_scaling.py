"""Ruiz equilibration tests — correctness of the scaling map and its payoff
on badly-scaled problems (the reference's unimplemented To-Do #2)."""

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.models.scaling import (
    equilibrate,
    scale_iterates,
    unscale_iterates,
)
from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference


def _badly_scaled_qp(n=24, seed=0, spread=4.0):
    """A feasible QP whose rows/cols span ~10^spread in magnitude."""
    rng = np.random.default_rng(seed)
    s = 10.0 ** rng.uniform(-spread / 2, spread / 2, n)
    W = rng.standard_normal((n, n))
    P = (s[:, None] * (W @ W.T + 0.1 * np.eye(n)) * s[None, :])
    q = s * rng.standard_normal(n)
    m = n // 2
    r = 10.0 ** rng.uniform(-spread / 2, spread / 2, m)
    A = r[:, None] * rng.standard_normal((m, n)) * s[None, :]
    x_feas = rng.standard_normal(n) / s
    l = A @ x_feas - r * rng.random(m)
    u = A @ x_feas + r * rng.random(m)
    return P, q, A, l, u


def test_equilibrate_normalizes_columns():
    P, q, A, l, u = _badly_scaled_qp()
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    scaled, scal = equilibrate(qp, 10)
    Ps, As = np.asarray(scaled.P), np.asarray(scaled.A)
    col = np.maximum(np.abs(Ps).max(axis=0), np.abs(As).max(axis=0))
    row = np.abs(As).max(axis=1)
    # Equilibrated inf-norms cluster near 1 (vs 10^4 spread before).
    assert col.max() / col.min() < 10
    assert row.max() / row.min() < 10
    assert (np.asarray(scal.d) > 0).all() and (np.asarray(scal.e) > 0).all()


def test_scale_unscale_roundtrip():
    P, q, A, l, u = _badly_scaled_qp(seed=1)
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    _, scal = equilibrate(qp, 5)
    rng = np.random.default_rng(0)
    x, z, y = (rng.standard_normal(qp.n), rng.standard_normal(qp.m),
               rng.standard_normal(qp.m))
    xs, zs, ys = scale_iterates(scal, x, z, y)
    xr, zr, yr = unscale_iterates(scal, xs, zs, ys)
    assert np.allclose(xr, x) and np.allclose(zr, z) and np.allclose(yr, y)


def test_scaled_solution_matches_oracle():
    P, q, A, l, u = _badly_scaled_qp(seed=2, spread=3.0)
    ref = solve_qp_reference(P, q, A, l, u, eps_abs=1e-11, eps_rel=1e-11, rho=0.1)
    assert ref.status == 3
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    st = qps.Settings(max_iterations=50_000, eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
                      adaptive_rho=True, scaling_iters=10)
    sol = qps.solve_jit(qp, st)
    assert bool(sol.info.solved)
    rel = np.abs(np.asarray(sol.x) - ref.x).max() / (np.abs(ref.x).max() + 1)
    assert rel <= 1e-6, rel


def test_scaling_reduces_iterations_on_bad_problems():
    P, q, A, l, u = _badly_scaled_qp(seed=3, spread=4.0)
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    base = qps.Settings(max_iterations=50_000, eps_abs=1e-6, eps_rel=1e-6,
                        rho=0.1, adaptive_rho=True)
    scaled = qps.Settings(max_iterations=50_000, eps_abs=1e-6, eps_rel=1e-6,
                          rho=0.1, adaptive_rho=True, scaling_iters=10)
    it_base = int(qps.solve_jit(qp, base).info.iterations)
    it_scaled = int(qps.solve_jit(qp, scaled).info.iterations)
    assert it_scaled < it_base, (it_scaled, it_base)


def test_scaling_unscaled_reporting():
    P, q, A, l, u = _badly_scaled_qp(seed=4, spread=2.0)
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    st = qps.Settings(max_iterations=50_000, eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
                      adaptive_rho=True, scaling_iters=10)
    sol = qps.solve_jit(qp, st)
    x = np.asarray(sol.x)
    # Reported residuals must be the unscaled ones.
    rp = np.abs(A @ x - np.asarray(sol.z)).max()
    rd = np.abs(P @ x + q + A.T @ np.asarray(sol.y)).max()
    assert np.isclose(float(sol.info.res_prim), rp, rtol=1e-6, atol=1e-12)
    assert np.isclose(float(sol.info.res_dual), rd, rtol=1e-6, atol=1e-12)
    obj = 0.5 * x @ P @ x + q @ x
    assert np.isclose(float(sol.info.objective), obj, rtol=1e-9)


def test_sparse_equilibrate_matches_oracle_and_reports_unscaled():
    """Pre-scaled sparse path (equilibrate_sparse_host + solve(scaling=...)):
    solution matches the oracle on the ORIGINAL problem and reported
    residuals/objective are unscaled."""
    import scipy.sparse as sp

    from quadraticprogramsolver_tpu.models.scaling import equilibrate_sparse_host

    P, q, A, l, u = _badly_scaled_qp(seed=6, spread=3.0)
    ref = solve_qp_reference(P, q, A, l, u, eps_abs=1e-11, eps_rel=1e-11, rho=0.1)
    assert ref.status == 3
    Ps, qs, As, ls, us, scal = equilibrate_sparse_host(
        sp.csr_matrix(P), q, sp.csr_matrix(A), l, u, 10)
    sqp = qps.make_sparse_qp(Ps, qs, As, ls, us, dtype=np.float64)
    st = qps.Settings(max_iterations=50_000, eps_abs=1e-9, eps_rel=1e-9,
                      rho=0.1, adaptive_rho=True, cg_eps=1e-12,
                      cg_max_iterations=500)
    sol = qps.solve_jit(sqp, st, None, None, None, None, scal)
    assert bool(sol.info.solved), int(sol.info.status)
    x = np.asarray(sol.x)
    rel = np.abs(x - ref.x).max() / (np.abs(ref.x).max() + 1)
    assert rel <= 1e-6, rel
    rp = np.abs(A @ x - np.asarray(sol.z)).max()
    rd = np.abs(P @ x + q + A.T @ np.asarray(sol.y)).max()
    assert np.isclose(float(sol.info.res_prim), rp, rtol=1e-6, atol=1e-12)
    assert np.isclose(float(sol.info.res_dual), rd, rtol=1e-6, atol=1e-12)
    obj = 0.5 * x @ P @ x + q @ x
    assert np.isclose(float(sol.info.objective), obj, rtol=1e-9)


def test_sparse_equilibrate_reduces_iterations():
    """The sparse pre-scaling must pay on badly-scaled problems, including
    through solve_segmented with host-side rho adaptation (the n=1e5
    configuration's exact code path)."""
    import scipy.sparse as sp

    from quadraticprogramsolver_tpu.models.admm import solve_segmented
    from quadraticprogramsolver_tpu.models.scaling import equilibrate_sparse_host

    # seed 8 / spread 5: the unscaled solve exhausts the full 20k budget
    # while the pre-scaled one finishes in ~50 iterations.
    P, q, A, l, u = _badly_scaled_qp(seed=8, spread=5.0)
    st = qps.Settings(max_iterations=20_000, eps_abs=1e-6, eps_rel=1e-6,
                      rho=0.1, adaptive_rho=True, cg_eps=1e-12,
                      cg_max_iterations=500)
    plain = qps.make_sparse_qp(sp.csr_matrix(P), q, sp.csr_matrix(A), l, u,
                               dtype=np.float64)
    it_base = int(qps.solve_jit(plain, st).info.iterations)
    Ps, qs, As, ls, us, scal = equilibrate_sparse_host(
        sp.csr_matrix(P), q, sp.csr_matrix(A), l, u, 10)
    sqp = qps.make_sparse_qp(Ps, qs, As, ls, us, dtype=np.float64)
    sol = solve_segmented(sqp, st, segment_iterations=500,
                          host_rho_adaptation=True, scaling=scal)
    assert bool(sol.info.solved)
    it_scaled = int(sol.info.iterations)
    assert it_scaled < it_base, (it_scaled, it_base)


def test_scaled_termination_is_unscaled():
    """Weak-#6 regression: with scaling on, a lane may report SOLVED only if
    the ORIGINAL problem's residuals pass the eps tests (OSQP discipline —
    termination maps residuals back through D, E, c inside the loop)."""
    P, q, A, l, u = _badly_scaled_qp(seed=5, spread=4.0)
    qp = qps.make_qp(P, q, A, l, u, dtype=np.float64)
    eps = 1e-7
    st = qps.Settings(max_iterations=50_000, eps_abs=eps, eps_rel=eps, rho=0.1,
                      adaptive_rho=True, scaling_iters=10)
    sol = qps.solve_jit(qp, st)
    assert int(sol.info.status) == int(qps.Status.SOLVED)
    x, z, y = (np.asarray(v) for v in (sol.x, sol.z, sol.y))
    Ax = A @ x
    rp = np.abs(Ax - z).max()
    rd = np.abs(P @ x + q + A.T @ y).max()
    max_prim = max(np.abs(Ax).max(), np.abs(z).max())
    max_dual = max(np.abs(P @ x).max(), np.abs(A.T @ y).max(), np.abs(q).max())
    assert rp <= eps + eps * max_prim, (rp, max_prim)
    assert rd <= eps + eps * max_dual, (rd, max_dual)
