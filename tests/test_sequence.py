"""Warm-started sequence solving (MPC-style) and checkpoint persistence."""

import jax
import numpy as np

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.frontends.sequence import (
    solve_sequence_jit,
    warm_start_from,
)
from quadraticprogramsolver_tpu.utils.checkpoint import (
    load_qp,
    load_solution,
    save_qp,
    save_solution,
)

SETTINGS = qps.Settings(max_iterations=5000, eps_abs=1e-8, eps_rel=1e-8, rho=0.1,
                        adaptive_rho=True)


def _drifting_sequence(T=5, n=24, seed=2):
    """Same P/A, slowly drifting q and bounds — an MPC-like sequence."""
    data = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, n, seed=seed)
    P, q0, A, l0, u0 = data.dense()
    rng = np.random.default_rng(seed + 1)
    qs = np.stack([q0 + 0.05 * t * rng.standard_normal(n) for t in range(T)])
    ls = np.stack([l0 - 0.01 * t for t in range(T)])
    us = np.stack([u0 + 0.01 * t for t in range(T)])
    import jax.numpy as jnp

    return qps.QP(
        P=jnp.broadcast_to(jnp.asarray(P), (T,) + P.shape),
        q=jnp.asarray(qs), A=jnp.broadcast_to(jnp.asarray(A), (T,) + A.shape),
        l=jnp.asarray(ls), u=jnp.asarray(us))


def test_sequence_matches_independent_solves():
    seq = _drifting_sequence()
    sols = solve_sequence_jit(seq, SETTINGS)
    assert sols.x.shape == (5, 24)
    for t in range(5):
        one = qps.QP(*(leaf[t] for leaf in (seq.P, seq.q, seq.A, seq.l, seq.u)))
        solo = qps.solve_jit(one, SETTINGS)
        dev = np.abs(np.asarray(sols.x[t]) - np.asarray(solo.x)).max()
        assert dev <= 1e-6, (t, dev)


def test_sequence_warm_start_saves_iterations():
    # With a gently drifting q, warm-started ticks must not cost more
    # iterations in total than solving every tick cold.
    T = 6
    data = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 24, seed=2)
    P, q0, A, l0, u0 = data.dense()
    rng = np.random.default_rng(0)
    drift = rng.standard_normal(24)
    import jax.numpy as jnp

    seq = qps.QP(
        P=jnp.broadcast_to(jnp.asarray(P), (T,) + P.shape),
        q=jnp.asarray(np.stack([q0 + 0.002 * t * drift for t in range(T)])),
        A=jnp.broadcast_to(jnp.asarray(A), (T,) + A.shape),
        l=jnp.broadcast_to(jnp.asarray(l0), (T,) + l0.shape),
        u=jnp.broadcast_to(jnp.asarray(u0), (T,) + u0.shape))
    warm = solve_sequence_jit(seq, SETTINGS)
    warm_iters = np.asarray(warm.info.iterations)
    cold_iters = []
    for t in range(T):
        one = qps.QP(*(leaf[t] for leaf in (seq.P, seq.q, seq.A, seq.l, seq.u)))
        cold_iters.append(int(qps.solve_jit(one, SETTINGS).info.iterations))
    assert warm_iters[1:].sum() <= sum(cold_iters[1:]), (warm_iters, cold_iters)
    # carry_rho=False (fresh rho each tick, iterates still carried) must
    # produce the same solutions — it only changes the iteration path.
    no_rho = solve_sequence_jit(seq, SETTINGS, carry_rho=False)
    dev = np.abs(np.asarray(no_rho.x) - np.asarray(warm.x)).max()
    assert dev <= 1e-6, dev


def test_warm_start_from_solution_roundtrip(tmp_path):
    data = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, 20, seed=3)
    qp = qps.make_qp(*data.dense(), dtype=np.float64)
    sol = qps.solve_jit(qp, SETTINGS)

    qp_path = str(tmp_path / "qp.npz")
    sol_path = str(tmp_path / "sol.npz")
    save_qp(qp_path, qp)
    save_solution(sol_path, sol)
    qp2 = load_qp(qp_path)
    sol2 = load_solution(sol_path)
    assert np.array_equal(np.asarray(qp.P), np.asarray(qp2.P))
    assert np.array_equal(np.asarray(sol.x), np.asarray(sol2.x))

    # Restored solution warm-starts a resumed solve to immediate convergence.
    x0, z0, y0 = warm_start_from(sol2)
    warm = qps.solve_jit(qp2, SETTINGS, x0, z0, y0)
    assert int(warm.info.iterations) <= SETTINGS.check_interval
    assert np.abs(np.asarray(warm.x) - np.asarray(sol.x)).max() <= 1e-7
