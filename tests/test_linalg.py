"""Batched linear-algebra primitive tests (ops/linalg.py)."""

import numpy as np
import pytest

from quadraticprogramsolver_tpu.ops import linalg


def _spd(batch, n, seed=0, cond=None):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal(batch + (n, n))
    A = np.einsum("...ij,...kj->...ik", W, W) + n * 0.01 * np.eye(n)
    return A


@pytest.mark.parametrize("n", [16, 64, 96, 128, 256])
def test_spd_inverse_blocked_matches_numpy(n):
    A = _spd((3,), n)
    inv = np.asarray(linalg.spd_inverse(A))
    ref = np.linalg.inv(A)
    scale = np.abs(ref).max()
    assert np.abs(inv - ref).max() / scale <= 1e-9, n
    # Symmetric output.
    assert np.abs(inv - np.swapaxes(inv, -1, -2)).max() <= 1e-12


def test_spd_inverse_odd_size_falls_back():
    A = _spd((), 67)
    inv = np.asarray(linalg.spd_inverse(A))
    assert np.abs(inv @ A - np.eye(67)).max() <= 1e-7


def test_spd_inverse_ill_conditioned():
    # cond ~ 1e6 like the sigma-regularized normal matrix.
    rng = np.random.default_rng(1)
    n = 128
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.logspace(-6, 0, n)
    A = (Q * w) @ Q.T
    inv = np.asarray(linalg.spd_inverse(A))
    err = np.abs(inv @ A - np.eye(n)).max()
    assert err <= 1e-6, err


def test_inf_norm_empty():
    import jax.numpy as jnp

    assert float(linalg.inf_norm(jnp.zeros((3, 0)))[0]) == 0.0


def test_spd_inverse_blocked_accuracy():
    """Blocked-Schur inverse: refinement-recoverable f32 error."""
    import jax.numpy as jnp
    from quadraticprogramsolver_tpu.ops.linalg import spd_inverse

    rng = np.random.default_rng(1)
    n = 256
    W = rng.standard_normal((2, n, n)).astype(np.float32)
    M = np.einsum("bki,bkj->bij", W, W) + n * np.eye(n, dtype=np.float32)
    exact = np.linalg.inv(np.asarray(M, np.float64))
    got = np.asarray(spd_inverse(jnp.asarray(M)))
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 1e-4, rel
    # One refinement step contracts the residual: ||I - got@M|| must be << 1.
    resid = np.abs(np.eye(n) - got @ np.asarray(M, np.float64)).max()
    assert resid < 1e-2, resid


def test_gj_solve_sweep_matches_solve():
    """Blocked Gauss-Jordan multi-RHS solve (no M^{-1}) vs numpy."""
    from quadraticprogramsolver_tpu.ops.spd_kernels import gj_solve_sweep

    M = _spd((5,), 256, seed=3)
    rng = np.random.default_rng(4)
    R = rng.standard_normal((5, 256, 129))
    X = np.asarray(gj_solve_sweep(M, R, pivot_inverse=linalg.spd_inverse))
    ref = np.linalg.solve(M, R)
    scale = np.abs(ref).max()
    assert np.abs(X - ref).max() / scale <= 1e-9


def test_gj_solve_sweep_f32_ill_conditioned():
    """f32 accuracy on a normal-matrix-like conditioning (~1e4)."""
    from quadraticprogramsolver_tpu.ops.spd_kernels import gj_solve_sweep

    rng = np.random.default_rng(5)
    n = 128
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.logspace(-4, 0, n)
    M = ((Q * w) @ Q.T).astype(np.float32)[None].repeat(4, 0)
    R = rng.standard_normal((4, n, 32)).astype(np.float32)
    X = np.asarray(gj_solve_sweep(M, R, pivot_inverse=linalg.spd_inverse))
    ref = np.linalg.solve(np.asarray(M, np.float64), np.asarray(R, np.float64))
    rel = np.abs(X - ref).max() / np.abs(ref).max()
    # cond * eps_f32 ~ 1e4 * 6e-8: same error class as the inverse path.
    assert rel <= 5e-3, rel


def test_spd_solve_dispatcher():
    M = _spd((2,), 64, seed=6)
    rng = np.random.default_rng(7)
    R = rng.standard_normal((2, 64, 5))
    X = np.asarray(linalg.spd_solve(M, R))
    ref = np.linalg.solve(M, R)
    assert np.abs(X - ref).max() / np.abs(ref).max() <= 1e-9
