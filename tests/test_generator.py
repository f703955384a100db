"""Generator structural tests — shapes, bounds, determinism per family.

Checks the distributions/structure promised by the reference generator
(`/root/reference/GenerateQuadraticProgram.jl:8-115`).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from quadraticprogramsolver_tpu.problems.generator import (
    ALL_CLASSES,
    ProblemClass,
    generate_batch,
    generate_random_qp,
)


@pytest.mark.parametrize("cls", ALL_CLASSES, ids=lambda c: c.value)
def test_shapes_and_psd(cls):
    # Cap the m = 100n families so the dense eigvalsh stays small.
    mc = 30 if cls in (ProblemClass.LASSO, ProblemClass.HUBER, ProblemClass.SVM,
                       ProblemClass.INEQUALITY_QP) else 0
    data = generate_random_qp(cls, 20, num_constraints=mc, seed=3)
    n, m = data.n, data.m
    assert data.P.shape == (n, n)
    assert data.A.shape == (m, n)
    assert data.q.shape == (n,) and data.l.shape == (m,) and data.u.shape == (m,)
    P = data.P.toarray()
    assert np.allclose(P, P.T, atol=1e-12)
    w = np.linalg.eigvalsh(P)
    assert w.min() >= -1e-10, f"P not PSD for {cls}: min eig {w.min()}"
    finite = np.isfinite(data.l) & np.isfinite(data.u)
    assert np.all(data.l[finite] <= data.u[finite] + 1e-12)


def test_default_dimensions():
    # Default constraint counts per family (GenerateQuadraticProgram.jl:18,23,28,40,51,65,80).
    n = 12
    assert generate_random_qp(ProblemClass.RANDOM_QP, n).m == n // 2
    assert generate_random_qp(ProblemClass.INEQUALITY_QP, n).m == 10 * n
    assert generate_random_qp(ProblemClass.EQUALITY_QP, n).m == n // 2
    pf = generate_random_qp(ProblemClass.PORTFOLIO, n)
    k = max(5, n // 100)
    assert pf.n == n + k and pf.m == k + 1 + n
    lasso = generate_random_qp(ProblemClass.LASSO, n)
    assert lasso.n == 2 * n + 100 * n and lasso.m == 100 * n + 2 * n
    iso = generate_random_qp(ProblemClass.ISOTONIC, n)
    assert iso.m == n - 1


def test_equality_class_bounds_equal():
    data = generate_random_qp(ProblemClass.EQUALITY_QP, 16, seed=5)
    assert np.array_equal(data.l, data.u)


def test_one_sided_bounds():
    # lasso/huber/svm emit +-inf one-sided bounds (jl:60,75,91).
    for cls in (ProblemClass.LASSO, ProblemClass.HUBER, ProblemClass.SVM):
        data = generate_random_qp(cls, 8, num_constraints=20, seed=1)
        assert np.isinf(data.l).any() or np.isinf(data.u).any(), cls


def test_random_qp_masked_bounds_quirk():
    # The generic branch sets ~15% of lower bounds to the upper bound and ~15%
    # of upper bounds to exactly 1.0 (the reference's vU[vI] .= vI[vI] quirk,
    # jl:32-35). With m=500 both events are overwhelmingly likely.
    data = generate_random_qp(ProblemClass.RANDOM_QP, 1000, seed=11)
    m = data.m
    assert (data.l == data.u).sum() > 0.05 * m
    assert (data.u == 1.0).sum() > 0.05 * m


def test_determinism():
    for cls in ALL_CLASSES:
        a = generate_random_qp(cls, 10, seed=42)
        b = generate_random_qp(cls, 10, seed=42)
        assert (a.P != b.P).nnz == 0 and (a.A != b.A).nnz == 0
        assert np.array_equal(a.q, b.q)
        assert np.array_equal(a.l, b.l) and np.array_equal(a.u, b.u)


def test_generate_batch_shapes():
    qp = generate_batch(ProblemClass.RANDOM_QP, batch=4, num_elements=10, seed=0)
    assert qp.P.shape == (4, 10, 10)
    assert qp.A.shape == (4, 5, 10)
    assert qp.batch_shape == (4,)
    # Instances differ across the batch.
    P = np.asarray(qp.P)
    assert not np.allclose(P[0], P[1])
