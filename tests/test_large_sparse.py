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
