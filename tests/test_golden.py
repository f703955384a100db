"""Golden-file fixtures: frozen (P, q, A, l, u) + f64 oracle solutions.

The reference reproduces cases across implementations by round-tripping
problems as .mat files (SolveQuadraticProgramUnitTest.m:47-49, 83-85); these
.npz fixtures play the same role — the solver must keep landing on the
pinned solutions bit-for-bit-independent of the generator. Regenerate with
tests/golden/make_golden.py (only if the fixture format itself changes).
"""

import glob
import os

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps

HERE = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(HERE, "*.npz")))


def test_fixtures_present():
    assert len(FIXTURES) >= 6, FIXTURES


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_golden_solution_reproduced(path):
    d = np.load(path)
    qp = qps.make_qp(d["P"], d["q"], d["A"], d["l"], d["u"], dtype=np.float64)
    st = qps.Settings(max_iterations=50_000, eps_abs=1e-9, eps_rel=1e-9,
                      rho=0.1, adaptive_rho=True)
    sol = qps.solve_jit(qp, st)
    assert int(sol.info.status) in (qps.Status.SOLVED, qps.Status.SOLVED_ADMM)
    # RunTests.jl:93 acceptance: ||x - x_ref||_inf <= 1e-5 (both at tight eps).
    assert np.abs(np.asarray(sol.x) - d["x"]).max() <= 1e-5


@pytest.mark.parametrize("path", FIXTURES[:2], ids=[os.path.basename(p) for p in FIXTURES[:2]])
def test_golden_oracle_kkt_consistent(path):
    # The pinned solutions themselves satisfy the KKT conditions — guards
    # against a corrupted fixture being silently accepted.
    from quadraticprogramsolver_tpu.utils.oracle import kkt_optimality

    d = np.load(path)
    rep = kkt_optimality(d["P"], d["q"], d["A"], d["l"], d["u"],
                         d["x"], d["z"], d["y"])
    assert rep.res_prim <= 1e-8 and rep.res_dual <= 1e-8, rep
