"""Fused Pallas ADMM-chunk kernel vs the XLA chunk path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.models import admm, kkt
from quadraticprogramsolver_tpu.ops.fused_admm import fused_admm_chunk

B, N, M = 4, 128, 128


def _fleet():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=B,
                            num_elements=100, seed=0, dtype=np.float32)
    return qps.pad_qp(qp, N, M)


def _setup(qp, settings):
    rho = jnp.full((B,), settings.rho, jnp.float32)
    # The solver applies the f32 sigma floor (settings.sigma_for); direct
    # kernel calls must use the same effective sigma to match it.
    sigma = jnp.asarray(settings.sigma_for(jnp.float32), jnp.float32)
    cache = kkt.cholesky_init(qp, rho, sigma, settings)
    return rho, cache


def test_fused_chunk_matches_xla_chunk():
    st = qps.Settings(rho=0.1, check_interval=25, kkt_refinement_steps=0)
    qp = _fleet()
    rho, cache = _setup(qp, st)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    active = jnp.array([True, True, False, True])

    rho_row = jnp.broadcast_to(rho[:, None], (B, M))
    fx, fz, fy, fxp, fzp, fAx, fATy = fused_admm_chunk(
        cache["M_inv"], qp.A, qp.P, qp.q, qp.l, qp.u, x, z, y, rho_row, active,
        K=st.check_interval, alpha=st.alpha,
        sigma=st.sigma_for(jnp.float32), interpret=True)

    from quadraticprogramsolver_tpu.core.state import SolverState

    state = SolverState(
        x=x, z=z, y=y, rho=rho, rho_cand=rho,
        status=jnp.where(active, 0, 3).astype(jnp.int32),
        iterations=jnp.zeros(B, jnp.int32),
        res_prim=jnp.zeros(B), res_dual=jnp.zeros(B),
        iteration=jnp.zeros((), jnp.int32), kkt_cache=cache)
    st_plain = qps.Settings(rho=0.1, check_interval=25, kkt_refinement_steps=0)
    backend = kkt.get_backend(st_plain.kkt_backend, qp)
    rx, rz, ry, rxp, rzp, _, _ = admm._run_chunk(qp, st_plain, backend, state)

    # Kernel-emitted convergence-check products must equal A x / A'y of the
    # returned iterates (computed for frozen lanes too).
    Ax_ref = jnp.einsum("bmn,bn->bm", qp.A, fx)
    ATy_ref = jnp.einsum("bmn,bm->bn", qp.A, fy)
    assert np.abs(np.asarray(fAx - Ax_ref)).max() <= 1e-4
    assert np.abs(np.asarray(fATy - ATy_ref)).max() <= 1e-4

    for f, r, name in ((fx, rx, "x"), (fz, rz, "z"), (fy, ry, "y"),
                       (fxp, rxp, "xp"), (fzp, rzp, "zp")):
        f, r = np.asarray(f), np.asarray(r)
        scale = np.abs(r).max() + 1.0
        assert np.abs(f - r).max() / scale <= 1e-5, (
            f"{name}: max dev {np.abs(f - r).max()} scale {scale}")

    # Inactive lane must pass through unchanged.
    assert np.array_equal(np.asarray(fx[2]), np.asarray(x[2]))
    assert np.array_equal(np.asarray(fz[2]), np.asarray(z[2]))


def test_factor_precision_plumbing():
    # factor_precision only changes matmul pass counts on TPU; on CPU it
    # must be a pure no-op on results (plumbing/regression guard).
    qp = _fleet()
    base = qps.Settings(max_iterations=2000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.1, kkt_refinement_steps=1)
    lowp = qps.Settings(max_iterations=2000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.1, kkt_refinement_steps=1,
                        factor_precision="default")
    s0 = qps.solve_jit(qp, base)
    s1 = qps.solve_jit(qp, lowp)
    assert (np.asarray(s1.info.status) >= 2).all()
    assert np.abs(np.asarray(s0.x) - np.asarray(s1.x)).max() <= 1e-5


def test_full_solve_with_fused_chunk():
    qp = _fleet()
    base = qps.Settings(max_iterations=2000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.1, adaptive_rho=True, kkt_refinement_steps=0)
    fused = qps.Settings(max_iterations=2000, eps_abs=1e-5, eps_rel=1e-5,
                         rho=0.1, adaptive_rho=True, kkt_refinement_steps=0,
                         fused_chunk=True)
    assert admm._fused_chunk_ok(qp, fused)
    s0 = qps.solve_jit(qp, base)
    s1 = qps.solve_jit(qp, fused)
    # Both paths must solve every lane; the exact flag (2 vs 3) may differ —
    # f32 rounding differences between the fused and XLA chunks can flip
    # which termination test fires first at a given check.
    assert (np.asarray(s0.info.status) >= 2).all()
    assert (np.asarray(s1.info.status) >= 2).all()
    assert (np.asarray(s1.info.status) <= 3).all()
    dev = np.abs(np.asarray(s0.x) - np.asarray(s1.x)).max()
    assert dev <= 5e-4, dev


def test_fused_chunk_lanes_match():
    # Multi-lane interleaved packing must be numerically identical to
    # lanes=1 and preserve per-lane frozen passthrough inside a pack.
    st = qps.Settings(rho=0.1, check_interval=25, kkt_refinement_steps=0)
    qp = _fleet()
    rho, cache = _setup(qp, st)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    active = jnp.array([True, False, True, True])
    rho_row = jnp.broadcast_to(rho[:, None], (B, M))
    args = (cache["M_inv"], qp.A, qp.P, qp.q, qp.l, qp.u, x, z, y, rho_row,
            active)
    kw = dict(K=st.check_interval, alpha=st.alpha,
              sigma=st.sigma_for(jnp.float32), interpret=True)
    o1 = fused_admm_chunk(*args, lanes=1, **kw)
    for lanes in (2, 4):
        oL = fused_admm_chunk(*args, lanes=lanes, **kw)
        for a, b in zip(o1, oL):
            assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 1e-5
        assert np.array_equal(np.asarray(oL[0][1]), np.asarray(x[1]))


def test_fused_fallback_conditions():
    # f64 -> not eligible; unpadded shapes -> not eligible.
    qp64 = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=2,
                              num_elements=16, seed=0, dtype=np.float64)
    st = qps.Settings(fused_chunk=True)
    assert not admm._fused_chunk_ok(qp64, st)
    qp32 = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=2,
                              num_elements=16, seed=0, dtype=np.float32)
    assert not admm._fused_chunk_ok(qp32, st)  # 16 not multiple of 128
    # Solve still works via fallback.
    sol = qps.solve_jit(qp32, qps.Settings(fused_chunk=True, rho=0.1,
                                           eps_abs=1e-5, eps_rel=1e-5))
    assert np.isfinite(np.asarray(sol.x)).all()


def test_fused_chunk_with_refinement_matches_xla():
    # With refine=1 the fused chunk must match the XLA chunk that also
    # refines (same math, so f32 agreement should be tight).
    st = qps.Settings(rho=0.1, check_interval=25, kkt_refinement_steps=1,
                      fused_chunk=True)
    qp = _fleet()
    base = qps.Settings(max_iterations=1000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.1, adaptive_rho=True, kkt_refinement_steps=1)
    fused = qps.Settings(max_iterations=1000, eps_abs=1e-5, eps_rel=1e-5,
                         rho=0.1, adaptive_rho=True, kkt_refinement_steps=1,
                         fused_chunk=True)
    s0 = qps.solve_jit(qp, base)
    s1 = qps.solve_jit(qp, fused)
    assert (np.asarray(s1.info.status) >= 2).all()
    dev = np.abs(np.asarray(s0.x) - np.asarray(s1.x)).max()
    assert dev <= 5e-4, dev


def test_fused_chunk_sigma_free_matches_xla_chunk():
    """sigma_free variant: G'/g operands, 2-dot iteration, same chunk result
    as the XLA sigma-free path."""
    st = qps.Settings(rho=0.1, check_interval=25, kkt_refinement_steps=0,
                      sigma_free_rhs=True, sigma=1e-7)
    qp = _fleet()
    rho, cache = _setup(qp, st)
    assert set(cache) == {"G", "g"}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    active = jnp.array([True, False, True, True])

    rho_row = jnp.broadcast_to(rho[:, None], (B, M))
    fx, fz, fy, fxp, fzp, fAx, fATy = fused_admm_chunk(
        cache["G"], qp.A, None, None, qp.l, qp.u, x, z, y, rho_row, active,
        K=st.check_interval, alpha=st.alpha,
        sigma=st.sigma_for(jnp.float32), sigma_free=True, g=cache["g"],
        interpret=True)

    from quadraticprogramsolver_tpu.core.state import SolverState

    state = SolverState(
        x=x, z=z, y=y, rho=rho, rho_cand=rho,
        status=jnp.where(active, 0, 3).astype(jnp.int32),
        iterations=jnp.zeros(B, jnp.int32),
        res_prim=jnp.zeros(B), res_dual=jnp.zeros(B),
        iteration=jnp.zeros((), jnp.int32), kkt_cache=cache)
    st_xla = qps.Settings(rho=0.1, check_interval=25, kkt_refinement_steps=0,
                          sigma_free_rhs=True, sigma=1e-7, fused_chunk=False)
    backend = kkt.get_backend(st_xla.kkt_backend, qp)
    rx, rz, ry, rxp, rzp, _, _ = admm._run_chunk(qp, st_xla, backend, state)

    for f, r, name in ((fx, rx, "x"), (fz, rz, "z"), (fy, ry, "y"),
                       (fxp, rxp, "xp"), (fzp, rzp, "zp")):
        f, r = np.asarray(f), np.asarray(r)
        scale = np.abs(r).max() + 1.0
        assert np.abs(f - r).max() / scale <= 1e-5, (
            f"{name}: max dev {np.abs(f - r).max()} scale {scale}")


def test_solve_sigma_free_end_to_end_fused():
    """Full solve with sigma_free_rhs + fused_chunk (interpret on CPU) agrees
    with the plain fused solve on a feasible f32 fleet."""
    qp = _fleet()
    base = qps.Settings(rho=0.1, eps_abs=1e-5, eps_rel=1e-5,
                        max_iterations=2000, fused_chunk=True,
                        kkt_refinement_steps=0)
    import dataclasses
    free = dataclasses.replace(base, sigma_free_rhs=True, sigma=1e-7)
    sol_a = qps.solve_jit(qp, base)
    sol_b = qps.solve_jit(qp, free)
    st_a = np.asarray(sol_a.info.status)
    st_b = np.asarray(sol_b.info.status)
    ok = (st_a >= 2) & (st_b >= 2) & (st_a <= 3) & (st_b <= 3)
    assert ok.any()
    dev = np.abs(np.asarray(sol_a.x)[ok] - np.asarray(sol_b.x)[ok]).max()
    assert dev <= 1e-3, dev


def test_fused_factor_matches_gj_sweep():
    """cholesky_init with fused_factor (in-place slab kernels, interpret on
    CPU) produces the same {G, g} cache as the XLA build + gj_solve_sweep."""
    import dataclasses

    st = qps.Settings(rho=0.1, kkt_refinement_steps=0,
                      sigma_free_rhs=True, sigma=1e-7)
    qp = _fleet()
    rho, cache = _setup(qp, st)
    st_f = dataclasses.replace(st, fused_factor=True)
    assert kkt._fused_factor_ok(qp, st_f)
    _, cache_f = _setup(qp, st_f)
    for k in ("G", "g"):
        a, b = np.asarray(cache[k]), np.asarray(cache_f[k])
        scale = np.abs(a).max()
        assert np.abs(a - b).max() <= 1e-5 * scale, (
            k, np.abs(a - b).max(), scale)


def test_fused_factor_end_to_end_solve():
    """Full sigma-free solve with fused_factor + fused_chunk agrees with the
    unfused sigma-free solve."""
    import dataclasses

    qp = _fleet()
    base = qps.Settings(rho=0.1, eps_abs=1e-5, eps_rel=1e-5,
                        max_iterations=2000, kkt_refinement_steps=0,
                        sigma_free_rhs=True, sigma=1e-7)
    fused = dataclasses.replace(base, fused_factor=True, fused_chunk=True)
    sol_a = qps.solve_jit(qp, base)
    sol_b = qps.solve_jit(qp, fused)
    st_a = np.asarray(sol_a.info.status)
    st_b = np.asarray(sol_b.info.status)
    ok = (st_a >= 2) & (st_a <= 3)
    assert ok.any()
    np.testing.assert_array_equal(st_a, st_b)
    dev = np.abs(np.asarray(sol_a.x)[ok] - np.asarray(sol_b.x)[ok]).max()
    assert dev <= 1e-3, dev


def test_fused_chunk_auto_pads_unaligned_dims():
    """solve() with fused_chunk=True on non-128-multiple (n, m) must pad
    internally (inert rows/vars), take the fused path, and slice back a
    solution matching the XLA chunk solve on the unpadded problem — the
    prox family's pad discipline applied to ADMM (round 4)."""
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 3, 100, seed=7,
                               dtype=np.float32)
    assert fleet.n % 128 and fleet.m % 128
    st_x = qps.Settings(max_iterations=1000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                        kkt_refinement_steps=0)
    st_f = dataclasses.replace(st_x, fused_chunk=True)
    sx = qps.solve_jit(fleet, st_x)
    sf = qps.solve_jit(fleet, st_f)
    assert (np.asarray(sf.info.status) >= 2).all()
    assert sf.x.shape == sx.x.shape  # sliced back to the unpadded n
    assert sf.z.shape == sx.z.shape
    scale = np.abs(np.asarray(sx.x)).max() + 1.0
    dev = np.abs(np.asarray(sx.x) - np.asarray(sf.x)).max() / scale
    assert dev <= 1e-4, dev


def test_headline_knob_stack_with_polish_and_autopad():
    """The full round-4 knob stack (slab_cache + chunk_lanes +
    chunk_dot_precision="high") composed with polish AND the auto-pad
    (unaligned n=100 fleet) must solve and beat the unpolished accuracy —
    the combination the pieces are never tested in together."""
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 4, 100, seed=3,
                               dtype=np.float32)
    st = qps.Settings(max_iterations=1000, eps_abs=1e-4, eps_rel=1e-4,
                      rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                      kkt_refinement_steps=0, fused_chunk=True,
                      fused_factor=True, slab_cache=True, chunk_lanes=2,
                      chunk_dot_precision="high")
    pol = dataclasses.replace(st, polish_iterations=2)
    s0 = qps.solve_jit(fleet, st)
    s1 = qps.solve_jit(fleet, pol)
    assert (np.asarray(s0.info.status) >= 2).all()
    assert (np.asarray(s1.info.status) >= 2).all()
    assert s1.x.shape == (4, fleet.n)
    from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference

    for i in range(4):
        ref = solve_qp_reference(
            np.asarray(fleet.P[i], np.float64),
            np.asarray(fleet.q[i], np.float64),
            np.asarray(fleet.A[i], np.float64),
            np.asarray(fleet.l[i], np.float64),
            np.asarray(fleet.u[i], np.float64),
            eps_abs=1e-10, eps_rel=1e-10, rho=0.1, max_iterations=50000)
        if ref.status != 3:
            continue
        d0 = np.abs(np.asarray(s0.x[i], np.float64) - ref.x).max()
        d1 = np.abs(np.asarray(s1.x[i], np.float64) - ref.x).max()
        assert d1 <= max(d0, 1e-6), (i, d0, d1)  # polish never hurts


def test_fused_factor_dot_precision_high():
    """fused_factor_solve(dot_precision="high") — the manual bf16x3 LEVEL
    dots (round 4; the old Precision.HIGH path was Mosaic-rejected) — must
    track the HIGHEST factor to ~f32 roundoff. (On-chip it buys nothing —
    the level stage is HBM-bound, 179.7 vs 180.5 ms at B=4096 — so it
    stays off; this test keeps the implementation honest.)"""
    from quadraticprogramsolver_tpu.ops.fused_factor import fused_factor_solve

    rng = np.random.default_rng(0)
    B, n, m = 2, 256, 128
    Mm = rng.standard_normal((B, n, n)).astype(np.float32) * 0.1
    P = np.einsum("bki,bkj->bij", Mm, Mm) + 0.1 * np.eye(n, dtype=np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32) * 0.3
    q = rng.standard_normal((B, n)).astype(np.float32)
    rho = np.full((B, m), 0.4, np.float32)
    S0 = fused_factor_solve(P, A, q, rho, sigma=1e-6, interpret=True)
    S1 = fused_factor_solve(P, A, q, rho, sigma=1e-6,
                            dot_precision="high", interpret=True)
    G0 = np.asarray(S0[..., : m + 1])
    G1 = np.asarray(S1[..., : m + 1])
    rel = np.abs(G0 - G1).max() / np.abs(G0).max()
    assert rel <= 1e-4, rel


def test_chunk_lanes_end_to_end():
    """Settings.chunk_lanes interleaving must not change the solve (modulo
    pack predication: a frozen lane inside an active pack passes through
    bit-identically), and non-divisible batches fall back to lanes=1."""
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 6, 128, seed=5,
                               dtype=np.float32)
    base = qps.Settings(max_iterations=1000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                        kkt_refinement_steps=0, fused_chunk=True,
                        fused_factor=True)
    s0 = qps.solve_jit(fleet, base)
    for lanes in (2, 4):  # 4 does not divide 6 -> fallback path
        sL = qps.solve_jit(fleet, dataclasses.replace(base, chunk_lanes=lanes))
        np.testing.assert_array_equal(np.asarray(sL.info.status),
                                      np.asarray(s0.info.status))
        np.testing.assert_array_equal(np.asarray(sL.info.iterations),
                                      np.asarray(s0.info.iterations))
        dev = np.abs(np.asarray(sL.x) - np.asarray(s0.x)).max()
        assert dev == 0.0, (lanes, dev)


def test_chunk_dot_precision_high_converges_close():
    """chunk_dot_precision="high" (manual in-kernel bf16x3 iterate dots)
    must converge with the same statuses and land within f32-roundoff
    distance of the HIGHEST solve (NOT bitwise — 3 passes drop the lo*lo
    term); the wrapper rejects it off the sigma-free path."""
    from quadraticprogramsolver_tpu.ops import fused_admm

    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 4, 128, seed=5,
                               dtype=np.float32)
    # eps 1e-4: with the round-4 auto-pad this fleet takes the genuinely
    # fused path, where bf16x3's ~1e-5-relative noise floor stalls
    # sub-1e-4 tolerances (measured; same behavior as the prox knob).
    base = qps.Settings(max_iterations=1000, eps_abs=1e-4, eps_rel=1e-4,
                        rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                        kkt_refinement_steps=0, fused_chunk=True,
                        fused_factor=True)
    s0 = qps.solve_jit(fleet, base)
    s1 = qps.solve_jit(fleet, dataclasses.replace(
        base, chunk_dot_precision="high"))
    # Converged either way; the split noise may flip WHICH exit fires
    # (status 2 fixed-point vs 3 residuals), so no exact-status equality.
    assert (np.asarray(s0.info.status) >= 2).all()
    assert (np.asarray(s1.info.status) >= 2).all()
    dev = np.abs(np.asarray(s1.x) - np.asarray(s0.x)).max()
    scale = np.abs(np.asarray(s0.x)).max()
    assert dev <= 1e-3 * max(scale, 1.0), (dev, scale)

    import pytest

    with pytest.raises(ValueError, match="sigma-free"):
        fused_admm.fused_admm_chunk(
            jnp.zeros((2, 128, 128)), jnp.zeros((2, 128, 128)),
            jnp.zeros((2, 128, 128)), jnp.zeros((2, 128)),
            -jnp.ones((2, 128)), jnp.ones((2, 128)), jnp.zeros((2, 128)),
            jnp.zeros((2, 128)), jnp.zeros((2, 128)), jnp.ones((2, 128)),
            jnp.ones((2,), jnp.int32), K=2, alpha=1.6, sigma=1e-6,
            dot_precision="high", interpret=True)


def test_first_chunk_precision_schedule():
    """Settings.first_chunk_dot_precision: the scheduled solve must still
    converge everywhere and land near the uniform-precision solve (the
    first chunk's noise is corrected by later full-precision chunks; every
    exit iterate comes from a full-precision chunk on families that need
    >= 2 chunks). Validators pin the knob to the fused sigma-free path."""
    import pytest

    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 4, 128, seed=5,
                               dtype=np.float32)
    base = qps.Settings(max_iterations=1000, eps_abs=1e-4, eps_rel=1e-4,
                        rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                        kkt_refinement_steps=0, fused_chunk=True,
                        fused_factor=True)
    s0 = qps.solve_jit(fleet, base)
    s1 = qps.solve_jit(fleet, dataclasses.replace(
        base, first_chunk_dot_precision="default"))
    assert (np.asarray(s0.info.status) >= 2).all()
    assert (np.asarray(s1.info.status) >= 2).all()
    dev = np.abs(np.asarray(s1.x) - np.asarray(s0.x)).max()
    scale = np.abs(np.asarray(s0.x)).max()
    assert dev <= 1e-3 * max(scale, 1.0), (dev, scale)

    with pytest.raises(ValueError, match="first_chunk_dot_precision"):
        qps.Settings(first_chunk_dot_precision="bogus", fused_chunk=True,
                     sigma_free_rhs=True, kkt_refinement_steps=0)
    with pytest.raises(ValueError, match="sigma-free"):
        qps.Settings(first_chunk_dot_precision="default")
    with pytest.raises(ValueError, match="sigma-free"):
        qps.ProxQPSettings(first_chunk_dot_precision="default")


def test_split_cache_matches_slab_high():
    """Settings.split_cache: the pre-split bf16 {Ghi, Glo} cache must
    reproduce the slab_cache + chunk_dot_precision="high" solve exactly —
    the kernel consumes the same bf16 halves either way; only where the
    split happens (init vs in-kernel) differs."""
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 4, 128, seed=5,
                               dtype=np.float32)
    # eps 1e-4: with the round-4 auto-pad this fleet (n=128, m=64 -> padded
    # 128x128) takes the GENUINELY fused path, where the bf16x3 noise
    # floor stalls sub-1e-4 tolerances (same measured behavior as prox).
    slab_high = qps.Settings(max_iterations=1000, eps_abs=1e-4, eps_rel=1e-4,
                             rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                             kkt_refinement_steps=0, fused_chunk=True,
                             fused_factor=True, slab_cache=True,
                             chunk_dot_precision="high")
    split = dataclasses.replace(slab_high, slab_cache=False, split_cache=True)
    s0 = qps.solve_jit(fleet, slab_high)
    s1 = qps.solve_jit(fleet, split)
    assert (np.asarray(s1.info.status) >= 2).all()
    np.testing.assert_array_equal(np.asarray(s1.info.iterations),
                                  np.asarray(s0.info.iterations))
    dev = np.abs(np.asarray(s1.x) - np.asarray(s0.x)).max()
    assert dev == 0.0, dev

    import pytest

    with pytest.raises(ValueError, match="split_cache"):
        qps.Settings(split_cache=True)  # missing the required combination


def test_slab_cache_matches_sliced_cache():
    """Settings.slab_cache: the fused chunk reading G through a block
    window into the factor slab (plus the lazy g column slice) must
    reproduce the sliced-{G, g} solve exactly (interpret mode on CPU)."""
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 4, 128, seed=5,
                               dtype=np.float32)
    base = qps.Settings(max_iterations=1000, eps_abs=1e-5, eps_rel=1e-5,
                        rho=0.4, adaptive_rho=False, sigma_free_rhs=True,
                        kkt_refinement_steps=0, fused_chunk=True,
                        fused_factor=True)
    slab = dataclasses.replace(base, slab_cache=True)
    s0 = qps.solve_jit(fleet, base)
    s1 = qps.solve_jit(fleet, slab)
    assert (np.asarray(s1.info.status) >= 2).all()
    np.testing.assert_array_equal(np.asarray(s1.info.iterations),
                                  np.asarray(s0.info.iterations))
    dev = np.abs(np.asarray(s1.x) - np.asarray(s0.x)).max()
    assert dev == 0.0, dev  # identical program modulo the G copy

    # The validator rejects unsupported combinations.
    import pytest

    with pytest.raises(ValueError, match="slab_cache"):
        qps.Settings(slab_cache=True)  # adaptive_rho on by default
