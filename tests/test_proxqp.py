"""ProxQP (prox-ALM) solver tests.

Oracle discipline: lower the split-form problem onto the canonical box form
and cross-check x against the host f64 OSQP-ADMM oracle — the same
cross-family validation the reference performs by solving its ProxQP demos
with Convex.jl/ECOS (`/root/reference/ProxQP001.jl:52-62,94`).
"""

import dataclasses

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.models import proxqp
from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference


def _random_split_problem(n=20, me=4, mi=8, seed=0, dtype=np.float64):
    """Dense strictly-convex QP with feasible Ax=b, Cx<=d (ProxQP001.jl-style)."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((me, n))
    C = rng.standard_normal((mi, n))
    x_feas = rng.standard_normal(n)
    b = A @ x_feas
    d = C @ x_feas + rng.random(mi)  # strictly feasible at x_feas
    return qps.make_proxqp(P, q, A, b, C, d, dtype=dtype)


def _oracle_x(prob):
    box = prob.to_box_qp()
    ref = solve_qp_reference(
        np.asarray(box.P), np.asarray(box.q), np.asarray(box.A),
        np.asarray(box.l), np.asarray(box.u),
        eps_abs=1e-10, eps_rel=1e-10, rho=0.1)
    assert ref.status == 3
    return ref.x


SETTINGS = qps.ProxQPSettings(max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9)


def test_proxqp_matches_box_oracle():
    for seed in range(3):
        prob = _random_split_problem(seed=seed)
        x_ref = _oracle_x(prob)
        sol = proxqp.solve_jit(prob, SETTINGS)
        assert bool(sol.info.converged)
        dev = np.abs(np.asarray(sol.x) - x_ref).max()
        assert dev <= 1e-5, f"seed {seed}: dev {dev}"


def test_proxqp_feasibility_and_duals():
    prob = _random_split_problem(seed=3)
    sol = proxqp.solve_jit(prob, SETTINGS)
    x = np.asarray(sol.x)
    A, b = np.asarray(prob.A), np.asarray(prob.b)
    C, d = np.asarray(prob.C), np.asarray(prob.d)
    assert np.abs(A @ x - b).max() <= 1e-6
    assert (C @ x - d).max() <= 1e-6
    z = np.asarray(sol.z)
    assert (z >= 0).all()
    # Stationarity: Px + q + A'y + C'z = 0.
    P, q = np.asarray(prob.P), np.asarray(prob.q)
    stat = P @ x + q + A.T @ np.asarray(sol.y) + C.T @ z
    assert np.abs(stat).max() <= 1e-5


def test_proxqp_batched():
    probs = [_random_split_problem(seed=s) for s in (0, 1, 2, 3)]
    import jax

    batched = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    sol = proxqp.solve_jit(batched, SETTINGS)
    assert sol.x.shape == (4, 20)
    for i, p in enumerate(probs):
        solo = proxqp.solve_jit(p, SETTINGS)
        dev = np.abs(np.asarray(sol.x[i]) - np.asarray(solo.x)).max()
        assert dev <= 1e-8, f"lane {i}: {dev}"


def test_proxqp_no_early_exit_matches_reference_budget():
    # The reference never breaks out of its loop (ProxQP.jl:157); with
    # early_exit=False the scan must run the full budget and still converge.
    prob = _random_split_problem(seed=1)
    st = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-8, eps_rel=1e-8,
                            early_exit=False)
    sol = proxqp.solve_jit(prob, st)
    assert bool(sol.info.converged)
    x_ref = _oracle_x(prob)
    assert np.abs(np.asarray(sol.x) - x_ref).max() <= 1e-5


def test_proxqp_warm_start_equality_kkt():
    # Warm start must satisfy the equality constraints at t=0 (ProxQP.jl:80-90).
    prob = _random_split_problem(seed=5)
    x, y, s, z = proxqp.warm_start(prob)
    A, b = np.asarray(prob.A), np.asarray(prob.b)
    assert np.abs(A @ np.asarray(x) - b).max() <= 1e-8
    assert (np.asarray(s) >= 0).all()
    assert np.count_nonzero(np.asarray(z)) == 0


def test_lsq_frontend_both_families():
    rng = np.random.default_rng(7)
    m, n = 30, 12
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    B = rng.standard_normal((5, n))
    x_feas = rng.standard_normal(n)
    c = B @ x_feas + rng.random(5)
    D = rng.standard_normal((3, n))
    e = D @ x_feas

    from quadraticprogramsolver_tpu.frontends import lsq

    box = lsq.lsq_to_qp(A, b, B, c, D, e)
    ref = solve_qp_reference(
        np.asarray(box.P), np.asarray(box.q), np.asarray(box.A),
        np.asarray(box.l), np.asarray(box.u), eps_abs=1e-10, eps_rel=1e-10)
    assert ref.status == 3

    sol_admm = lsq.solve_lsq(
        A, b, B, c, D, e,
        settings=qps.Settings(eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
                              max_iterations=20000))
    dev = np.abs(np.asarray(sol_admm.x) - ref.x).max()
    assert dev <= 1e-5, dev

    sol_prox = lsq.solve_lsq_proxqp(A, b, B, c, D, e, settings=SETTINGS)
    dev = np.abs(np.asarray(sol_prox.x) - ref.x).max()
    assert dev <= 1e-5, dev


def test_lsq_unconstrained_matches_lstsq():
    rng = np.random.default_rng(9)
    A = rng.standard_normal((40, 10))
    b = rng.standard_normal(40)
    from quadraticprogramsolver_tpu.frontends import lsq

    sol = lsq.solve_lsq(A, b, settings=qps.Settings(eps_abs=1e-10, eps_rel=1e-10))
    x_np = np.linalg.lstsq(A, b, rcond=None)[0]
    assert np.abs(np.asarray(sol.x) - x_np).max() <= 1e-6


def test_proxqp_fused_chunk_matches_xla():
    import jax

    # 128-multiple dims, f32: the fused Pallas chunk (interpret mode on CPU)
    # must agree with the XLA chunk path.
    probs = [_random_split_problem(n=128, me=128, mi=128, seed=s,
                                   dtype=np.float32) for s in (0, 1)]
    batched = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    st_x = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-5, eps_rel=1e-5)
    st_f = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-5, eps_rel=1e-5,
                              fused_chunk=True)
    sx = proxqp.solve_jit(batched, st_x)
    sf = proxqp.solve_jit(batched, st_f)
    assert np.asarray(sf.info.converged).all()
    scale = np.abs(np.asarray(sx.x)).max() + 1.0
    dev = np.abs(np.asarray(sx.x) - np.asarray(sf.x)).max() / scale
    assert dev <= 1e-4, dev


def test_proxqp_chunk_lanes_match():
    import dataclasses

    import jax

    # ProxQPSettings.chunk_lanes interleaving must reproduce the lanes=1
    # fused solve bit-identically (pack predication passes frozen lanes
    # through); 4 does not divide B=6 -> silent fallback to 1.
    probs = [_random_split_problem(n=128, me=128, mi=128, seed=s,
                                   dtype=np.float32) for s in range(6)]
    batched = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    st1 = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-5, eps_rel=1e-5,
                             fused_chunk=True)
    s1 = proxqp.solve_jit(batched, st1)
    for lanes in (2, 4):
        sL = proxqp.solve_jit(
            batched, dataclasses.replace(st1, chunk_lanes=lanes))
        np.testing.assert_array_equal(np.asarray(sL.info.iterations),
                                      np.asarray(s1.info.iterations))
        dev = np.abs(np.asarray(sL.x) - np.asarray(s1.x)).max()
        assert dev == 0.0, (lanes, dev)


def test_proxqp_chunk_dot_precision_high():
    import dataclasses

    import jax

    # Manual bf16x3 iterate dots: converges at a 1e-4 tolerance (possibly
    # with extra iterations — the split noise is ~1e-5 relative per
    # chunk, so sub-1e-4 tolerances on this family STALL: measured
    # res_prim plateau 3e-4 at eps 1e-5; that negative is why the knob is
    # workload-dependent opt-in) and lands within 1e-3 of the HIGHEST
    # solve.
    probs = [_random_split_problem(n=128, me=128, mi=128, seed=s,
                                   dtype=np.float32) for s in (0, 1)]
    batched = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    st = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-4, eps_rel=1e-4,
                            fused_chunk=True, sigma_free_rhs=True,
                            kkt_refinement_steps=0)
    s0 = proxqp.solve_jit(batched, st)
    s1 = proxqp.solve_jit(batched, dataclasses.replace(
        st, chunk_dot_precision="high", chunk_lanes=2))
    assert np.asarray(s0.info.converged).all()
    assert np.asarray(s1.info.converged).all()
    dev = np.abs(np.asarray(s1.x) - np.asarray(s0.x)).max()
    scale = np.abs(np.asarray(s0.x)).max()
    assert dev <= 1e-3 * max(scale, 1.0), (dev, scale)


def test_proxqp_fused_chunk_pads_unaligned_dims():
    import jax

    # Non-128-multiple dims: the solver pads internally (pad_proxqp) so the
    # fused path still runs, and the sliced-back solution matches XLA.
    probs = [_random_split_problem(n=100, me=7, mi=33, seed=s,
                                   dtype=np.float32) for s in (0, 1)]
    batched = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    st_x = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-5, eps_rel=1e-5)
    st_f = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-5, eps_rel=1e-5,
                              fused_chunk=True)
    sx = proxqp.solve_jit(batched, st_x)
    sf = proxqp.solve_jit(batched, st_f)
    assert sf.x.shape == sx.x.shape
    assert sf.y.shape == sx.y.shape and sf.z.shape == sx.z.shape
    assert np.asarray(sf.info.converged).all()
    scale = np.abs(np.asarray(sx.x)).max() + 1.0
    dev = np.abs(np.asarray(sx.x) - np.asarray(sf.x)).max() / scale
    assert dev <= 1e-4, dev


def test_proxqp_zero_start_converges_same():
    prob = _random_split_problem(seed=2)
    x_ref = _oracle_x(prob)
    st = qps.ProxQPSettings(max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9,
                            kkt_warm_start=False)
    sol = proxqp.solve_jit(prob, st)
    assert bool(sol.info.converged)
    assert np.abs(np.asarray(sol.x) - x_ref).max() <= 1e-5


def test_lsq_inconsistent_args_rejected():
    from quadraticprogramsolver_tpu.frontends import lsq

    rng = np.random.default_rng(0)
    A = rng.standard_normal((10, 4))
    b = rng.standard_normal(10)
    with pytest.raises(ValueError, match="together"):
        lsq.lsq_to_qp(A, b, c=np.zeros(2))
    with pytest.raises(ValueError, match="together"):
        lsq.lsq_to_proxqp(A, b, D=np.zeros((2, 4)))


def test_sparse_builders_match_dense():
    from quadraticprogramsolver_tpu.problems.operators import (
        difference_operator, difference_operator_sparse,
        monotone_smoothing_qp, monotone_smoothing_sparse_qp,
        monotonicity_operator, monotonicity_operator_sparse)

    rng = np.random.default_rng(1)
    n = 200
    y = np.cumsum(rng.standard_normal(n))
    ref_idx = np.array([0, 40, 95, 150, 199])
    for o in (1, 2, 4):
        assert np.abs(difference_operator(o, n)
                      - difference_operator_sparse(o, n).toarray()).max() == 0
    assert np.abs(monotonicity_operator(ref_idx, y)
                  - monotonicity_operator_sparse(ref_idx, y).toarray()).max() == 0
    Pd, qd, Cd, dd = monotone_smoothing_qp(y, ref_idx, 2, 5.0)
    Ps, qs2, Cs, ds2 = monotone_smoothing_sparse_qp(y, ref_idx, 2, 5.0)
    assert np.abs(Pd - Ps.toarray()).max() < 1e-12
    assert np.abs(Cd - Cs.toarray()).max() == 0
    assert np.array_equal(qd, qs2) and np.array_equal(dd, ds2)


def test_sparse_proxqp_matches_dense_path():
    # The matrix-free CG path must agree with the dense cached-inverse path
    # (VERDICT #3 parity criterion: sparse ProxQP vs the box-form solve).
    import scipy.sparse as sp

    from quadraticprogramsolver_tpu.problems.operators import (
        monotone_smoothing_qp)

    rng = np.random.default_rng(0)
    n = 400
    t = np.linspace(0, 4 * np.pi, n)
    y = np.sin(t) + 0.1 * rng.standard_normal(n)
    ref_idx = np.arange(0, n, 25)
    P, q, C, d = monotone_smoothing_qp(y, ref_idx, smooth_order=2, lam=10.0)
    A = np.zeros((1, n))
    A[0, 0] = 1.0
    b = np.array([y[0]])
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-8,
                            cg_eps=1e-12, cg_max_iterations=400,
                            kkt_warm_start=False)
    dense = qps.make_proxqp(P, q, A, b, C, d, dtype=np.float64)
    sol_d = proxqp.solve_jit(dense, st)
    sparse = qps.make_sparse_proxqp(
        sp.csr_matrix(P), q, sp.csr_matrix(A), b, sp.csr_matrix(C), d,
        dtype=np.float64)
    sol_s = proxqp.solve_jit(sparse, st)
    assert bool(sol_d.info.converged) and bool(sol_s.info.converged)
    dev = np.abs(np.asarray(sol_s.x) - np.asarray(sol_d.x)).max()
    assert dev <= 1e-8, dev
    # Constraint feasibility of the sparse solution.
    assert float((C @ np.asarray(sol_s.x)).max()) <= 1e-6


def test_sparse_proxqp_box_form_parity():
    # Same split QP through the OSQP-ADMM box solver: the two solver
    # families must agree on the solution.
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n, me, mi = 60, 10, 30
    W = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    P = W @ W.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((me, n)) * (rng.random((me, n)) < 0.3)
    b = A @ rng.standard_normal(n)
    C = rng.standard_normal((mi, n)) * (rng.random((mi, n)) < 0.3)
    d = C @ rng.standard_normal(n) + 1.0
    st = qps.ProxQPSettings(max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9,
                            cg_eps=1e-12, cg_max_iterations=500,
                            kkt_warm_start=False)
    sparse = qps.make_sparse_proxqp(
        sp.csr_matrix(P), q, sp.csr_matrix(A), b, sp.csr_matrix(C), d,
        dtype=np.float64)
    sol = proxqp.solve_jit(sparse, st)
    assert bool(sol.info.converged)
    box = qps.make_proxqp(P, q, A, b, C, d, dtype=np.float64).to_box_qp()
    ref = qps.solve_jit(box, qps.Settings(
        max_iterations=50_000, eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
        adaptive_rho=True))
    assert int(ref.info.status) >= 2
    dev = np.abs(np.asarray(sol.x) - np.asarray(ref.x)).max()
    assert dev <= 1e-6, dev


def test_proxqp_anderson_parity_and_safeguard():
    """AA-accelerated prox-ALM still matches the box-form oracle, never
    loses a problem plain solves, and does not raise iteration counts."""
    import dataclasses

    st_aa = dataclasses.replace(SETTINGS, anderson_memory=8)
    for seed in range(3):
        prob = _random_split_problem(seed=seed)
        x_ref = _oracle_x(prob)
        plain = proxqp.solve_jit(prob, SETTINGS)
        sol = proxqp.solve_jit(prob, st_aa)
        assert bool(sol.info.converged)
        dev = np.abs(np.asarray(sol.x) - x_ref).max()
        assert dev <= 1e-5, f"seed {seed}: dev {dev}"
        assert int(sol.info.iterations) <= int(plain.info.iterations), seed
        # Mixed iterates stay dual-feasible by construction (z >= 0).
        assert float(np.asarray(sol.z).min()) >= 0.0


def test_proxqp_anderson_rescues_static_rho():
    """The sharpest measured effect: with adaptive rho OFF and a cold start,
    the plain ALM stalls past a 4000-iteration budget on these instances
    while AA(16) converges within ~1000 — the acceleration substitutes for
    the rho adaptation the reference relies on (ProxQP.jl:277-286)."""
    import dataclasses

    base = qps.ProxQPSettings(max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9,
                              kkt_warm_start=False, adaptive_rho=False)
    for seed in range(3):
        prob = _random_split_problem(n=40, me=8, mi=16, seed=seed)
        plain = proxqp.solve_jit(prob, base)
        aa = proxqp.solve_jit(
            prob, dataclasses.replace(base, anderson_memory=16))
        assert not bool(plain.info.converged), seed
        assert bool(aa.info.converged), seed
        assert int(aa.info.iterations) <= 1500, (seed, int(aa.info.iterations))
        x_ref = _oracle_x(prob)
        assert np.abs(np.asarray(aa.x) - x_ref).max() <= 1e-5


def test_proxqp_anderson_reduces_iterations_adaptive():
    """With adaptive rho on, AA still trims iterations at a fine check
    cadence (measured 370 -> 290 summed over these seeds at ci=10)."""
    import dataclasses

    base = qps.ProxQPSettings(max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9,
                              kkt_warm_start=False, check_interval=10)
    totals = {}
    for mem in (0, 8):
        st = dataclasses.replace(base, anderson_memory=mem)
        tot = 0
        for seed in range(3):
            prob = _random_split_problem(n=40, me=8, mi=16, seed=seed)
            sol = proxqp.solve_jit(prob, st)
            assert bool(sol.info.converged), (mem, seed)
            tot += int(sol.info.iterations)
        totals[mem] = tot
    assert totals[8] < totals[0], totals


def test_proxqp_anderson_sparse_path():
    """AA composes with the matrix-free SparseProxQP CG path."""
    import dataclasses
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n, me, mi = 60, 6, 12
    P = sp.identity(n, format="csc") * 2.0
    q = rng.standard_normal(n)
    A = sp.random(me, n, density=0.2, format="csc",
                  data_rvs=rng.standard_normal)
    C = sp.random(mi, n, density=0.2, format="csc",
                  data_rvs=rng.standard_normal)
    x_feas = rng.standard_normal(n)
    b = A @ x_feas
    d = C @ x_feas + rng.random(mi)
    dense = qps.make_proxqp(P.toarray(), q, A.toarray(), b, C.toarray(), d,
                            dtype=np.float64)
    x_ref = _oracle_x(dense)
    sprob = qps.make_sparse_proxqp(P, q, A, b, C, d, dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=4000, eps_abs=1e-9, eps_rel=1e-9,
                            anderson_memory=8, kkt_warm_start=False)
    sol = proxqp.solve_jit(sprob, st)
    assert bool(sol.info.converged)
    assert np.abs(np.asarray(sol.x) - x_ref).max() <= 1e-5


def test_proxqp_primal_infeasibility_certificate():
    """Contradictory equality rows (x1 = 0 and x1 = 1): the diverging dual
    direction is a Farkas certificate; the reference loops its full budget
    on such input (ProxQP.jl has no detection)."""
    n = 4
    P = np.eye(n)
    q = np.zeros(n)
    A = np.zeros((2, n)); A[0, 0] = 1.0; A[1, 0] = 1.0
    b = np.array([0.0, 1.0])
    C = np.zeros((1, n)); C[0, 1] = 1.0
    d = np.array([1.0])
    prob = qps.make_proxqp(P, q, A, b, C, d, dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, kkt_warm_start=False)
    sol = proxqp.solve_jit(prob, st)
    assert int(sol.info.status) == 4, int(sol.info.status)
    assert not bool(sol.info.converged)
    # Reference-style behavior on request: detection off runs the budget.
    import dataclasses

    off = proxqp.solve_jit(
        prob, dataclasses.replace(st, check_infeasibility=False))
    assert int(off.info.status) == 1


def test_proxqp_dual_infeasibility_certificate():
    """Unbounded problem (min -x1 s.t. x1 >= 0 direction free): flagged
    DUAL_INFEASIBLE via the dx certificate."""
    n = 3
    P = np.zeros((n, n)); P[1, 1] = 1.0; P[2, 2] = 1.0
    q = np.array([-1.0, 0.0, 0.0])
    A = np.zeros((1, n)); A[0, 1] = 1.0   # x2 = 0 (feasible)
    b = np.zeros(1)
    C = np.zeros((1, n)); C[0, 0] = -1.0  # -x1 <= 0, x1 unbounded above
    d = np.zeros(1)
    prob = qps.make_proxqp(P, q, A, b, C, d, dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, kkt_warm_start=False)
    sol = proxqp.solve_jit(prob, st)
    assert int(sol.info.status) == 5, int(sol.info.status)


def test_proxqp_status_solved_and_no_false_positives():
    """Feasible instances keep converging with detection on (default) and
    report status SOLVED — incl. under Anderson acceleration."""
    import dataclasses

    for seed in range(3):
        prob = _random_split_problem(seed=seed)
        for extra in ({}, dict(anderson_memory=8)):
            sol = proxqp.solve_jit(
                prob, dataclasses.replace(SETTINGS, **extra))
            assert int(sol.info.status) == 3, (seed, extra)
            assert bool(sol.info.converged)


def test_sparse_proxqp_bcoo_storage_matches_ell():
    """storage="bcoo" SparseProxQP reproduces the ELL solve."""
    import scipy.sparse as sp

    from quadraticprogramsolver_tpu.problems.operators import (
        monotone_smoothing_qp)

    rng = np.random.default_rng(1)
    n = 300
    t = np.linspace(0, 3 * np.pi, n)
    y = np.cos(t) + 0.1 * rng.standard_normal(n)
    P, q, C, d = monotone_smoothing_qp(y, np.arange(0, n, 20),
                                       smooth_order=2, lam=5.0)
    A = np.zeros((1, n))
    A[0, 0] = 1.0
    b = np.array([y[0]])
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-8,
                            cg_eps=1e-12, cg_max_iterations=400,
                            kkt_warm_start=False)
    args = (sp.csr_matrix(P), q, sp.csr_matrix(A), b, sp.csr_matrix(C), d)
    sol_e = proxqp.solve_jit(qps.make_sparse_proxqp(*args, dtype=np.float64), st)
    sol_b = proxqp.solve_jit(
        qps.make_sparse_proxqp(*args, dtype=np.float64, storage="bcoo"), st)
    assert bool(sol_e.info.converged) and bool(sol_b.info.converged)
    dev = np.abs(np.asarray(sol_e.x) - np.asarray(sol_b.x)).max()
    assert dev <= 1e-8, dev


def test_proxqp_solve_segmented_matches_monolithic():
    """Segment boundaries are just check boundaries: same solution, and
    cumulative iteration accounting within one check interval."""
    prob = _random_split_problem(n=24, me=4, mi=8, seed=5)
    st = qps.ProxQPSettings(max_iterations=600, eps_abs=1e-9, eps_rel=1e-8,
                            check_interval=25, kkt_warm_start=False)
    sol_m = proxqp.solve_jit(prob, st)
    sol_s = proxqp.solve_segmented(prob, st, segment_iterations=100)
    assert bool(sol_m.info.converged.all()) and bool(sol_s.info.converged.all())
    dev = np.abs(np.asarray(sol_m.x) - np.asarray(sol_s.x)).max()
    assert dev <= 1e-9, dev
    it_m = np.asarray(sol_m.info.iterations)
    it_s = np.asarray(sol_s.info.iterations)
    # Lanes that finished in an earlier segment re-verify on re-entry:
    # counts match to one check interval per extra segment.
    assert (np.abs(it_m - it_s) <= 2 * st.check_interval).all(), (it_m, it_s)


def test_proxqp_sigma_free_matches_oracle_and_plain():
    """Exact-ALM sigma-free path (ProxQPSettings.sigma_free_rhs): the
    {Ga, Gc, g} column cache replaces M^{-1}; solutions must land on the
    oracle and agree with the plain proximal path."""
    prob = _random_split_problem(seed=3)
    x_ref = _oracle_x(prob)
    st = dataclasses.replace(SETTINGS, kkt_refinement_steps=0)
    st_sf = dataclasses.replace(st, sigma_free_rhs=True)
    plain = proxqp.solve_jit(prob, st)
    sf = proxqp.solve_jit(prob, st_sf)
    assert bool(sf.info.converged)
    assert np.abs(np.asarray(sf.x) - x_ref).max() <= 1e-6
    assert np.abs(np.asarray(sf.x) - np.asarray(plain.x)).max() <= 1e-6
    # Refinement requires M^{-1} — rejected.
    with pytest.raises(ValueError, match="refinement"):
        proxqp.solve(prob, dataclasses.replace(
            SETTINGS, sigma_free_rhs=True, kkt_refinement_steps=1))


def test_proxqp_sigma_free_fused_chunk_matches_xla():
    """sigma_free + fused_chunk (slab factor with separate (A, C) blocks +
    the Ga/Gc kernel, interpret mode on CPU) must agree with the sigma-free
    XLA path and converge."""
    import jax

    probs = [_random_split_problem(n=128, me=128, mi=128, seed=s,
                                   dtype=np.float32) for s in (0, 1)]
    batched = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    st_x = qps.ProxQPSettings(max_iterations=500, eps_abs=1e-5, eps_rel=1e-5,
                              kkt_refinement_steps=0, sigma_free_rhs=True)
    st_f = dataclasses.replace(st_x, fused_chunk=True)
    sx = proxqp.solve_jit(batched, st_x)
    sf = proxqp.solve_jit(batched, st_f)
    assert np.asarray(sf.info.converged).all()
    scale = np.abs(np.asarray(sx.x)).max() + 1.0
    dev = np.abs(np.asarray(sx.x) - np.asarray(sf.x)).max() / scale
    assert dev <= 1e-4, dev
