"""Host LP oracle for infeasibility certificates (utils/feasibility.py)."""

import numpy as np

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.utils.feasibility import (
    dual_unbounded,
    primal_feasible,
    verify_status_flags,
)


def test_primal_feasible_simple():
    A = np.array([[1.0, 0.0], [0.0, 1.0]])
    assert primal_feasible(A, np.array([0.0, 0.0]), np.array([1.0, 1.0]))
    # x1 >= 1 and x1 <= -1: infeasible.
    A2 = np.array([[1.0, 0.0], [1.0, 0.0]])
    assert not primal_feasible(
        A2, np.array([1.0, -np.inf]), np.array([np.inf, -1.0]))


def test_primal_feasible_generator_instances():
    # The probed infeasible equality instance is confirmed infeasible...
    d = qps.generate_random_qp(qps.ProblemClass.EQUALITY_QP, 20, seed=13)
    _, _, A, l, u = d.dense()
    assert not primal_feasible(A, l, u)
    # ...and a feasible random_qp instance is confirmed feasible.
    d2 = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 20, seed=3)
    _, _, A2, l2, u2 = d2.dense()
    assert primal_feasible(A2, l2, u2)


def test_dual_unbounded():
    # min -x2 with curvature only on x1 and x2 unconstrained: unbounded.
    P = np.diag([1.0, 0.0])
    q = np.array([0.0, -1.0])
    A = np.array([[1.0, 0.0]])
    assert dual_unbounded(P, q, A, np.array([-1.0]), np.array([1.0]))
    # Strictly convex: always bounded.
    assert not dual_unbounded(np.eye(2), q, A, np.array([-1.0]),
                              np.array([1.0]))


def test_verify_status_flags_catches_false_positive():
    d = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 20, seed=3)
    P, q, A, l, u = d.dense()
    batch = tuple(np.stack([v, v]) for v in (P, q, A, l, u))
    # Lane 1 falsely flagged primal-infeasible on a feasible problem.
    bad = verify_status_flags(batch, np.array([3, 4]))
    assert bad and bad[0][0] == 1 and bad[0][1] == 4
    # Correct flags pass.
    assert verify_status_flags(batch, np.array([3, 3])) == []
