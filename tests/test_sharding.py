"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 plan:
N-device CPU-simulated mesh tests — a capability the reference has no
analogue of)."""

import sys

import jax
import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.parallel.mesh import (
    make_fleet_mesh,
    shard_fleet,
    solve_fleet,
    solve_prox_fleet,
)

SETTINGS = qps.Settings(max_iterations=2000, eps_abs=1e-8, eps_rel=1e-8, rho=0.1)


def prox_fleet(batch=16, n=20, me=4, mi=8, seed0=0, dtype=np.float64):
    """Fleet of dense strictly-convex split-form QPs (ProxQP001.jl-style)."""
    probs = []
    for s in range(seed0, seed0 + batch):
        rng = np.random.default_rng(s)
        M = rng.standard_normal((n, n))
        P = M @ M.T + 0.5 * np.eye(n)
        q = rng.standard_normal(n)
        A = rng.standard_normal((me, n))
        C = rng.standard_normal((mi, n))
        x_feas = rng.standard_normal(n)
        probs.append(qps.make_proxqp(P, q, A, A @ x_feas, C,
                                     C @ x_feas + rng.random(mi), dtype=dtype))
    return jax.tree.map(lambda *xs: np.stack(xs), *probs)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_fleet_matches_single_device():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=16,
                            num_elements=20, seed=0, dtype=np.float64)
    plain = qps.solve_jit(qp, SETTINGS)
    mesh = make_fleet_mesh()
    sharded = solve_fleet(qp, SETTINGS, mesh)
    dev = np.abs(np.asarray(plain.x) - np.asarray(sharded.x)).max()
    assert dev <= 1e-10, dev
    assert np.array_equal(np.asarray(plain.info.status),
                          np.asarray(sharded.info.status))


def test_shard_placement():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=8,
                            num_elements=10, seed=1)
    mesh = make_fleet_mesh()
    sq = shard_fleet(qp, mesh)
    # Each leaf's leading axis is split 8 ways.
    shard_shapes = {s.data.shape for s in sq.P.addressable_shards}
    assert shard_shapes == {(1, 10, 10)}


def test_indivisible_fleet_rejected():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=6,
                            num_elements=10, seed=1)
    with pytest.raises(ValueError, match="not divisible"):
        shard_fleet(qp, make_fleet_mesh())


def test_prepared_factor_shards_with_fleet():
    """Factor reuse under GSPMD: prepare() on a sharded fleet produces a
    sharded PreparedFactor, and the prepared solve matches the unsharded
    prepared solve — the MPC-fleet deployment shape (factor once, ticks
    sharded over the mesh)."""
    from quadraticprogramsolver_tpu.models import admm

    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=16,
                            num_elements=20, seed=0, dtype=np.float64)
    st = qps.Settings(max_iterations=2000, eps_abs=1e-8, eps_rel=1e-8,
                      rho=0.1, adaptive_rho=False)
    prep_plain = admm.prepare_jit(qp, st)
    ref = qps.solve_jit(qp, st, None, None, None, None, None, prep_plain)

    sq = shard_fleet(qp, make_fleet_mesh())
    prep = admm.prepare_jit(sq, st)
    # The cache inherits the fleet sharding (per-device factor shards).
    assert {s.data.shape for s in prep.cache["M_inv"].addressable_shards} \
        == {(2, 20, 20)}
    sol = qps.solve_jit(sq, st, None, None, None, None, None, prep)
    assert np.abs(np.asarray(ref.x) - np.asarray(sol.x)).max() <= 1e-10
    assert np.array_equal(np.asarray(ref.info.status),
                          np.asarray(sol.info.status))


def test_cached_solver_on_mesh():
    """CachedQPSolver(mesh=...): the persistent sharded-solver deployment
    shape — setup shards fleet + factor; update() keeps the sharding."""
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=16,
                            num_elements=20, seed=3, dtype=np.float64)
    st = qps.Settings(max_iterations=2000, eps_abs=1e-8, eps_rel=1e-8,
                      rho=0.1, adaptive_rho=False)
    plain = qps.CachedQPSolver(qp, st)
    ref = plain.solve()
    solver = qps.CachedQPSolver(qp, st, mesh=make_fleet_mesh())
    sol = solver.solve()
    assert np.abs(np.asarray(ref.x) - np.asarray(sol.x)).max() <= 1e-10
    q2 = np.asarray(qp.q) * 0.5
    plain.update(q=q2)
    solver.update(q=q2)
    # Updated leaf keeps the fleet sharding.
    assert {s.data.shape for s in solver.qp.q.addressable_shards} == {(2, 20)}
    r2 = plain.solve(warm_start=True)
    s2 = solver.solve(warm_start=True)
    assert np.abs(np.asarray(r2.x) - np.asarray(s2.x)).max() <= 1e-10


def test_prox_prepared_shards_with_fleet():
    from quadraticprogramsolver_tpu.models import proxqp

    prob = prox_fleet(batch=8, seed0=40)
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-9)
    prep_plain = proxqp.prepare_jit(prob, st)
    ref = qps.solve_proxqp_jit(prob, st, None, None, prep_plain)
    sp = shard_fleet(prob, make_fleet_mesh())
    prep = proxqp.prepare_jit(sp, st)
    assert {s.data.shape for s in prep.cache.addressable_shards} \
        == {(1, 20, 20)}
    sol = qps.solve_proxqp_jit(sp, st, None, None, prep)
    assert np.abs(np.asarray(ref.x) - np.asarray(sol.x)).max() <= 1e-10
    assert np.array_equal(np.asarray(ref.info.status),
                          np.asarray(sol.info.status))


def test_prox_fleet_matches_single_device():
    """SURVEY §2 parallelism mandate, extended to the SECOND solver family:
    a sharded prox-ALM fleet must match the single-device batched solve."""
    prob = prox_fleet()
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-9)
    plain = qps.solve_proxqp_jit(prob, st)
    sharded = solve_prox_fleet(prob, st, make_fleet_mesh())
    assert np.asarray(plain.info.converged).all()
    dev = np.abs(np.asarray(plain.x) - np.asarray(sharded.x)).max()
    assert dev <= 1e-10, dev
    assert np.array_equal(np.asarray(plain.info.status),
                          np.asarray(sharded.info.status))
    assert np.array_equal(np.asarray(plain.info.iterations),
                          np.asarray(sharded.info.iterations))
    # Duals/slacks shard-match too (the full carry splits cleanly).
    for leaf in ("y", "z", "s"):
        d = np.abs(np.asarray(getattr(plain, leaf))
                   - np.asarray(getattr(sharded, leaf))).max()
        assert d <= 1e-10, (leaf, d)


def test_prox_fleet_sigma_free_and_anderson_shard():
    # The heavier state carries (sigma-free {Ga,Gc,g} cache, Anderson ring
    # buffers, infeasibility product caches) must all shard on the fleet
    # axis without a gather.
    prob = prox_fleet(batch=8, seed0=100)
    st = qps.ProxQPSettings(max_iterations=1000, eps_abs=1e-7, eps_rel=1e-7,
                            sigma_free_rhs=True, kkt_refinement_steps=0,
                            anderson_memory=4)
    plain = qps.solve_proxqp_jit(prob, st)
    sharded = solve_prox_fleet(prob, st, make_fleet_mesh())
    dev = np.abs(np.asarray(plain.x) - np.asarray(sharded.x)).max()
    assert dev <= 1e-10, dev
    assert np.array_equal(np.asarray(plain.info.status),
                          np.asarray(sharded.info.status))


def test_prox_shard_placement():
    prob = prox_fleet(batch=8)
    sp = shard_fleet(prob, make_fleet_mesh())
    assert {s.data.shape for s in sp.P.addressable_shards} == {(1, 20, 20)}
    assert {s.data.shape for s in sp.C.addressable_shards} == {(1, 8, 20)}


def test_prox_block_split_matches_single_device():
    """One large split-form QP with constraint rows sharded over the mesh
    (parallel/prox_consensus.py) vs the single-device solve at identical
    settings (zero start: the block solver has no equality-KKT warm start)."""
    from quadraticprogramsolver_tpu.parallel.prox_consensus import (
        solve_prox_block_split)

    rng = np.random.default_rng(42)
    n, me, mi = 24, 8, 16
    M = rng.standard_normal((n, n))
    P_ = M @ M.T + 0.5 * np.eye(n)
    A = rng.standard_normal((me, n))
    C = rng.standard_normal((mi, n))
    xf = rng.standard_normal(n)
    prob = qps.make_proxqp(P_, rng.standard_normal(n), A, A @ xf, C,
                           C @ xf + rng.random(mi), dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-9,
                            kkt_warm_start=False)
    plain = qps.solve_proxqp_jit(prob, st)
    dist = solve_prox_block_split(prob, st)
    assert bool(plain.info.converged) and bool(dist.info.converged)
    assert int(plain.info.iterations) == int(dist.info.iterations)
    for leaf in ("x", "y", "z", "s"):
        dev = np.abs(np.asarray(getattr(plain, leaf))
                     - np.asarray(getattr(dist, leaf))).max()
        assert dev <= 1e-8, (leaf, dev)


def test_prox_block_split_adaptive_rho_and_history():
    # The tau-triggered double-sqrt rho rule and the per-check trace must
    # behave identically distributed: start rho far off so adaptation trips.
    from quadraticprogramsolver_tpu.parallel.prox_consensus import (
        solve_prox_block_split)

    rng = np.random.default_rng(21)
    n, me, mi = 24, 8, 16
    M = rng.standard_normal((n, n))
    P_ = M @ M.T + 0.5 * np.eye(n)
    A = rng.standard_normal((me, n))
    C = rng.standard_normal((mi, n))
    xf = rng.standard_normal(n)
    prob = qps.make_proxqp(P_, rng.standard_normal(n), A, A @ xf, C,
                           C @ xf + rng.random(mi), dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-9,
                            rho=1e-4, adaptive_rho=True,
                            kkt_warm_start=False, record_history=True)
    plain = qps.solve_proxqp_jit(prob, st)
    dist = solve_prox_block_split(prob, st)
    assert bool(plain.info.converged) and bool(dist.info.converged)
    assert float(dist.info.rho) > 1e-4  # adaptation really tripped
    # Identical adaptation trajectory (the rho trace matches below);
    # the final value agrees to program-reordering rounding (~5e-12).
    assert abs(float(plain.info.rho) - float(dist.info.rho)) < 1e-9
    assert int(plain.info.iterations) == int(dist.info.iterations)
    assert np.abs(np.asarray(plain.x) - np.asarray(dist.x)).max() <= 1e-8
    hp = plain.info.history
    hd = dist.info.history
    ran = np.isfinite(np.asarray(hp["res_prim"]))
    assert np.allclose(np.asarray(hp["res_prim"])[ran],
                       np.asarray(hd["res_prim"])[ran], rtol=1e-8)
    assert np.allclose(np.asarray(hp["rho"])[ran],
                       np.asarray(hd["rho"])[ran], rtol=1e-12)


def test_prox_block_split_detects_infeasible():
    # Contradictory equalities (same row, different b): both the batched
    # solver and the distributed one must flag PRIMAL_INFEASIBLE via the
    # split-form Farkas certificates.
    from quadraticprogramsolver_tpu.parallel.prox_consensus import (
        solve_prox_block_split)

    rng = np.random.default_rng(8)
    n, mi = 16, 8
    P_ = np.eye(n)
    row = rng.standard_normal(n)
    A = np.stack([row, row])
    b = np.array([1.0, -1.0])        # row.x = 1 AND row.x = -1
    C = rng.standard_normal((mi, n))
    d = C @ rng.standard_normal(n) + 1.0
    prob = qps.make_proxqp(P_, rng.standard_normal(n), A, b, C, d,
                           dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-9,
                            kkt_warm_start=False)
    plain = qps.solve_proxqp_jit(prob, st)
    dist = solve_prox_block_split(prob, st)
    assert int(plain.info.status) == qps.Status.PRIMAL_INFEASIBLE
    assert int(dist.info.status) == qps.Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("trial", [0, 1, 2, 5])
def test_prox_block_split_random_shapes(trial):
    """Seeded random-shape parity hammer: arbitrary (n, me, mi) with random
    rho and adaptive on/off must match the single-device solve to f64
    roundoff (a 12-trial sweep measured devs ~1e-15 across the board)."""
    from quadraticprogramsolver_tpu.parallel.prox_consensus import (
        solve_prox_block_split)

    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(8, 40))
    me = int(rng.integers(1, max(2, n // 3)))
    mi = int(rng.integers(1, n))
    M = rng.standard_normal((n, n))
    P_ = M @ M.T + (0.3 + rng.random()) * np.eye(n)
    A = rng.standard_normal((me, n))
    C = rng.standard_normal((mi, n))
    xf = rng.standard_normal(n)
    prob = qps.make_proxqp(P_, rng.standard_normal(n), A, A @ xf, C,
                           C @ xf + rng.random(mi) + 0.1, dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=3000, eps_abs=1e-8, eps_rel=1e-8,
                            kkt_warm_start=False,
                            adaptive_rho=bool(rng.integers(2)),
                            rho=float(10 ** rng.uniform(-3, 1)))
    plain = qps.solve_proxqp_jit(prob, st)
    dist = solve_prox_block_split(prob, st)
    assert int(plain.info.status) == int(dist.info.status)
    assert np.abs(np.asarray(plain.x) - np.asarray(dist.x)).max() < 1e-8


def test_prox_block_split_row_padding():
    # me/mi not divisible by 8 devices: the solver pads with inert rows and
    # returns duals at the original counts.
    from quadraticprogramsolver_tpu.parallel.prox_consensus import (
        solve_prox_block_split)

    rng = np.random.default_rng(11)
    n, me, mi = 16, 3, 5
    M = rng.standard_normal((n, n))
    P_ = M @ M.T + 0.5 * np.eye(n)
    A = rng.standard_normal((me, n))
    C = rng.standard_normal((mi, n))
    xf = rng.standard_normal(n)
    prob = qps.make_proxqp(P_, rng.standard_normal(n), A, A @ xf, C,
                           C @ xf + rng.random(mi), dtype=np.float64)
    st = qps.ProxQPSettings(max_iterations=2000, eps_abs=1e-8, eps_rel=1e-8,
                            kkt_warm_start=False)
    plain = qps.solve_proxqp_jit(prob, st)
    dist = solve_prox_block_split(prob, st)
    assert bool(dist.info.converged)
    assert dist.y.shape == (me,) and dist.z.shape == (mi,)
    assert np.abs(np.asarray(plain.x) - np.asarray(dist.x)).max() <= 1e-8


def test_graft_entry_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
