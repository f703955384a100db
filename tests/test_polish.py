"""Polish coverage beyond the dense m<=n Schur path (VERDICT round-1 #6).

The reference polish (SolveQuadraticProgram.m:289-325) applies on its full
direct path; ours must cover sparse/operator QPs and dense m>>n, both routed
through the matrix-free MINRES polish (models/polish.py:polish_minres) — the
reference's own polish solver is minres (m:315).
"""

import numpy as np

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.models.polish import _active_set, polish_minres
from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference


def _ref(data):
    return solve_qp_reference(data.P, data.q, data.A, data.l, data.u,
                              eps_abs=1e-12, eps_rel=1e-12, rho=0.1)


def test_active_set_matches_oracle():
    # The sign(y)-only rule misidentifies ~30 rows at a loose solve; the
    # proximity-augmented rule recovers the oracle active set (measured on
    # these seeds — see models/polish.py:_active_set).
    for seed in (2, 6):
        data = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 200, seed=seed)
        sqp = qps.make_sparse_qp(data.P, data.q, data.A, data.l, data.u,
                                 dtype=np.float64)
        loose = qps.Settings(max_iterations=500, eps_abs=1e-4, eps_rel=1e-4,
                             rho=0.1, adaptive_rho=True, cg_eps=1e-10,
                             cg_max_iterations=500)
        base = qps.solve_jit(sqp, loose)
        ref = _ref(data)
        oracle_act = (np.isclose(ref.z, data.l, atol=1e-9)
                      | np.isclose(ref.z, data.u, atol=1e-9))
        active, _ = _active_set(sqp, qps.Settings(polish_iterations=10),
                                base.x, base.z, base.y)
        assert int((np.asarray(active) != oracle_act).sum()) == 0


def test_polish_sparse_improves_solution():
    # Matrix-free polish on the SparseQP/CG path (the path that previously
    # raised "polish requires a dense QP").
    data = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 200, seed=2)
    sqp = qps.make_sparse_qp(data.P, data.q, data.A, data.l, data.u,
                             dtype=np.float64)
    kw = dict(max_iterations=500, eps_abs=1e-4, eps_rel=1e-4, rho=0.1,
              adaptive_rho=True, cg_eps=1e-10, cg_max_iterations=500)
    base = qps.solve_jit(sqp, qps.Settings(**kw))
    pol = qps.solve_jit(sqp, qps.Settings(polish_iterations=10, **kw))
    ref = _ref(data)
    dev_base = np.abs(np.asarray(base.x) - ref.x).max()
    dev_pol = np.abs(np.asarray(pol.x) - ref.x).max()
    assert dev_pol <= dev_base + 1e-12
    assert dev_pol <= 1e-6, (dev_base, dev_pol)


def test_polish_dense_tall_uses_minres_path():
    # Dense m >> n (inequality_qp has m = 10n): the m x m Schur complement
    # would be O(m^3), so this dispatches to MINRES. A modestly tight base
    # solve resolves the active set; polish then lands near the oracle.
    data = qps.generate_random_qp(qps.ProblemClass.INEQUALITY_QP, 40, seed=1)
    qp = qps.make_qp(*data.dense(), dtype=np.float64)
    assert qp.m > qp.n
    kw = dict(max_iterations=2000, eps_abs=1e-5, eps_rel=1e-5, rho=0.1,
              adaptive_rho=True)
    base = qps.solve_jit(qp, qps.Settings(**kw))
    pol = qps.solve_jit(qp, qps.Settings(polish_iterations=10, **kw))
    ref = _ref(data)
    dev_base = np.abs(np.asarray(base.x) - ref.x).max()
    dev_pol = np.abs(np.asarray(pol.x) - ref.x).max()
    assert dev_pol <= dev_base + 1e-12
    assert dev_pol <= 1e-6, (dev_base, dev_pol)


def test_polish_minres_rejects_when_ambiguous():
    # Per-lane acceptance guard: polishing from a very loose point must never
    # make the reported solution worse than the unpolished one.
    data = qps.generate_random_qp(qps.ProblemClass.INEQUALITY_QP, 30, seed=3)
    qp = qps.make_qp(*data.dense(), dtype=np.float64)
    loose = qps.Settings(max_iterations=100, eps_abs=1e-2, eps_rel=1e-2,
                         rho=0.1)
    base = qps.solve_jit(qp, loose)
    px, pn = polish_minres(qp, qps.Settings(polish_iterations=10),
                           base.x, base.z, base.y, base.info.rho)
    from quadraticprogramsolver_tpu.models.polish import _kkt_error
    assert float(_kkt_error(qp, px, pn)) <= float(
        _kkt_error(qp, base.x, base.y)) + 1e-12
