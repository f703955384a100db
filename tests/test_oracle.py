"""Oracle self-consistency: the host-side f64 reference solver must itself
satisfy the KKT conditions it certifies others against."""

import numpy as np
import pytest

from quadraticprogramsolver_tpu.problems.generator import ProblemClass, generate_random_qp
from quadraticprogramsolver_tpu.utils.oracle import kkt_optimality, solve_qp_reference


# Seeds pinned to feasible instances — the reference generator's sparse A can
# emit all-zero rows with l=u != 0, i.e. genuinely infeasible problems.
@pytest.mark.parametrize(
    "cls,seed",
    [(ProblemClass.RANDOM_QP, 0), (ProblemClass.EQUALITY_QP, 7),
     (ProblemClass.PORTFOLIO, 0)],
    ids=lambda v: getattr(v, "value", v))
def test_oracle_satisfies_kkt(cls, seed):
    data = generate_random_qp(cls, 20, seed=seed)
    res = solve_qp_reference(data.P, data.q, data.A, data.l, data.u,
                             eps_abs=1e-10, eps_rel=1e-10)
    assert res.status == 3
    rep = kkt_optimality(data.P, data.q, data.A, data.l, data.u, res.x, res.z, res.y)
    assert rep.optimal(1e-6), rep


def test_oracle_unconstrained_analytic():
    # With loose box bounds the QP solution is -P^{-1} q.
    rng = np.random.default_rng(0)
    n = 12
    M = rng.standard_normal((n, n))
    P = M @ M.T + np.eye(n)
    q = rng.standard_normal(n)
    A = np.eye(n)
    l, u = -1e3 * np.ones(n), 1e3 * np.ones(n)
    res = solve_qp_reference(P, q, A, l, u, eps_abs=1e-11, eps_rel=1e-11)
    x_star = np.linalg.solve(P, -q)
    assert np.abs(res.x - x_star).max() < 1e-7


def test_oracle_linsys_backends_agree():
    # Native quasi-definite LDL' vs scipy splu must produce the same solve.
    data = generate_random_qp(ProblemClass.RANDOM_QP, 25, seed=0)
    a = solve_qp_reference(data.P, data.q, data.A, data.l, data.u,
                           eps_abs=1e-10, eps_rel=1e-10, linsys="ldl")
    b = solve_qp_reference(data.P, data.q, data.A, data.l, data.u,
                           eps_abs=1e-10, eps_rel=1e-10, linsys="splu")
    assert a.status == b.status == 3
    assert a.iterations == b.iterations
    assert np.abs(a.x - b.x).max() <= 1e-9


def test_oracle_active_bound():
    # min 0.5 x^2 - 2x s.t. 0 <= x <= 1 -> x* = 1, dual y = -(P x + q) = 1 > 0 at upper.
    res = solve_qp_reference([[1.0]], [-2.0], [[1.0]], [0.0], [1.0],
                             eps_abs=1e-11, eps_rel=1e-11)
    assert abs(res.x[0] - 1.0) < 1e-8
    assert res.y[0] > 0.9
