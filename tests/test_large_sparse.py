"""Large sparse matrix-free path (scaled-down CI version of BASELINE config 4;
the full n=1e5 run lives in benchmarks/large_sparse.py)."""

import numpy as np

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.problems.generator import generate_large_sparse_qp
from quadraticprogramsolver_tpu.utils.oracle import kkt_optimality


def test_large_sparse_cg_solve():
    n = 5_000
    data = generate_large_sparse_qp(n, seed=0)
    assert data.P.nnz < 30 * n  # actually sparse
    sqp = qps.make_sparse_qp(data.P, data.q, data.A, data.l, data.u,
                             dtype=np.float64)
    st = qps.Settings(max_iterations=2000, eps_abs=1e-6, eps_rel=1e-6, rho=0.1,
                      adaptive_rho=True, cg_eps=1e-9, cg_max_iterations=400)
    sol = qps.solve_jit(sqp, st)
    assert bool(sol.info.solved)
    # Certificate-style optimality check — no oracle trajectory at this size.
    rep = kkt_optimality(data.P, data.q, data.A, data.l, data.u,
                         np.asarray(sol.x), np.asarray(sol.z), np.asarray(sol.y))
    # Termination is eps_abs + eps_rel*scale; at this size the problem norms
    # put the accepted residuals near 1e-5..1e-4.
    assert rep.res_prim <= 1e-4
    assert rep.res_dual <= 1e-4
    assert rep.res_comp <= 1e-3


def test_bcoo_storage_matches_ell():
    """storage="bcoo" runs the same operators through BCOO matvecs and must
    reproduce the ELL solve (same math, different lowering)."""
    n = 2_000
    data = generate_large_sparse_qp(n, seed=1)
    st = qps.Settings(max_iterations=2000, eps_abs=1e-6, eps_rel=1e-6, rho=0.1,
                      adaptive_rho=True, cg_eps=1e-9, cg_max_iterations=400)
    args = (data.P, data.q, data.A, data.l, data.u)
    sol_e = qps.solve_jit(qps.make_sparse_qp(*args, dtype=np.float64), st)
    sol_b = qps.solve_jit(
        qps.make_sparse_qp(*args, dtype=np.float64, storage="bcoo"), st)
    assert bool(sol_e.info.solved) and bool(sol_b.info.solved)
    dev = np.abs(np.asarray(sol_e.x) - np.asarray(sol_b.x)).max()
    assert dev <= 1e-8, dev
    # diag_AtWA (vector-rho Jacobi diagonal) agrees between storages.
    import jax.numpy as jnp

    w = jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.0, data.m))
    d_e = qps.make_sparse_qp(*args, dtype=np.float64).diag_AtWA(w)
    d_b = qps.make_sparse_qp(*args, dtype=np.float64, storage="bcoo").diag_AtWA(w)
    assert np.abs(np.asarray(d_e) - np.asarray(d_b)).max() <= 1e-10
