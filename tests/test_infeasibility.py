"""Infeasibility-certificate detection (OSQP §3.4 — a capability beyond the
reference, which burns its full iteration budget on infeasible instances)."""

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps

SETTINGS = qps.Settings(max_iterations=4000, eps_abs=1e-8, eps_rel=1e-8, rho=0.1,
                        adaptive_rho=True)


def test_primal_infeasible_contradictory_rows():
    # x1 >= 1 and x1 <= -1 simultaneously: cleanly infeasible.
    P = np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    l = np.array([1.0, -np.inf])
    u = np.array([np.inf, -1.0])
    sol = qps.solve_jit(qps.make_qp(P, q, A, l, u, dtype=np.float64), SETTINGS)
    assert int(sol.info.status) == qps.Status.PRIMAL_INFEASIBLE


def test_primal_infeasible_generator_instance():
    # The reference generator's equality class can emit all-zero sparse rows
    # with l=u != 0 — genuinely infeasible (probed: n=20 seed 13).
    data = qps.generate_random_qp(qps.ProblemClass.EQUALITY_QP, 20, seed=13)
    sol = qps.solve_jit(qps.make_qp(*data.dense(), dtype=np.float64), SETTINGS)
    assert int(sol.info.status) == qps.Status.PRIMAL_INFEASIBLE
    # And it is detected in far fewer iterations than the budget.
    assert int(sol.info.iterations) < 1000


def test_dual_infeasible_unbounded():
    # min -x2 with P=0 on x2 direction, only lower bounds: unbounded below.
    P = np.diag([1.0, 0.0])
    q = np.array([0.0, -1.0])
    A = np.array([[1.0, 0.0]])
    l = np.array([-1.0])
    u = np.array([1.0])
    sol = qps.solve_jit(qps.make_qp(P, q, A, l, u, dtype=np.float64), SETTINGS)
    assert int(sol.info.status) == qps.Status.DUAL_INFEASIBLE


def test_feasible_problems_unaffected():
    # Certificates must not fire on feasible instances.
    for cls, seed in ((qps.ProblemClass.RANDOM_QP, 0),
                      (qps.ProblemClass.PORTFOLIO, 0),
                      (qps.ProblemClass.EQUALITY_QP, 7)):
        data = qps.generate_random_qp(cls, 20, seed=seed)
        sol = qps.solve_jit(qps.make_qp(*data.dense(), dtype=np.float64), SETTINGS)
        assert int(sol.info.status) in (qps.Status.SOLVED, qps.Status.SOLVED_ADMM), (
            cls, int(sol.info.status))


def test_batched_mixed_feasibility():
    # One feasible and one infeasible lane in the same fleet.
    feas = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 20, seed=3)
    inf = qps.generate_random_qp(qps.ProblemClass.EQUALITY_QP, 20, seed=13)
    fq = qps.pad_qp(qps.make_qp(*feas.dense(), dtype=np.float64), 24, 16)
    iq = qps.pad_qp(qps.make_qp(*inf.dense(), dtype=np.float64), 24, 16)
    both = qps.stack_qps([fq, iq])
    sol = qps.solve_jit(both, SETTINGS)
    status = np.asarray(sol.info.status)
    assert status[0] in (qps.Status.SOLVED, qps.Status.SOLVED_ADMM)
    assert status[1] == qps.Status.PRIMAL_INFEASIBLE


def test_certificates_can_be_disabled():
    data = qps.generate_random_qp(qps.ProblemClass.EQUALITY_QP, 20, seed=13)
    st = qps.Settings(max_iterations=200, eps_abs=1e-8, eps_rel=1e-8, rho=0.1,
                      adaptive_rho=True, check_infeasibility=False)
    sol = qps.solve_jit(qps.make_qp(*data.dense(), dtype=np.float64), st)
    assert int(sol.info.status) == qps.Status.MAX_ITERATIONS
