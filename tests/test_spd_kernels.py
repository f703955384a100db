"""Fused Pallas normal-matrix inverse kernel (interpret-mode parity)."""

import jax.numpy as jnp
import numpy as np

from quadraticprogramsolver_tpu.ops.spd_kernels import pallas_normal_inverse


def test_fused_normal_inverse_matches_dense():
    rng = np.random.default_rng(0)
    B, n, m = 2, 256, 128
    W = rng.standard_normal((B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", W, W) / n + 0.01 * np.eye(n, dtype=np.float32)
    A = (rng.standard_normal((B, m, n)) * (rng.random((B, m, n)) < 0.15)).astype(
        np.float32)
    rho = jnp.asarray(np.full(B, 0.3), jnp.float32)
    Minv = np.asarray(
        pallas_normal_inverse(jnp.asarray(P), jnp.asarray(A), rho,
                              sigma=1e-6, interpret=True), np.float64)
    M = P.astype(np.float64) + 1e-6 * np.eye(n) + 0.3 * np.einsum(
        "bki,bkj->bij", A, A, dtype=np.float64)
    resid = np.abs(np.einsum("bij,bjk->bik", Minv, M) - np.eye(n)).max()
    assert resid <= 5e-5, resid  # f32 kernel on cond~1e4 inputs
    ref = np.linalg.inv(M)
    rel = np.abs(Minv - ref).max() / np.abs(ref).max()
    assert rel <= 1e-5, rel


def test_fused_normal_inverse_per_lane_rho():
    rng = np.random.default_rng(1)
    B, n, m = 3, 128, 128
    W = rng.standard_normal((B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", W, W) / n + 0.1 * np.eye(n, dtype=np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32) * 0.1
    rho = jnp.asarray(np.array([0.1, 1.0, 10.0]), jnp.float32)
    Minv = np.asarray(
        pallas_normal_inverse(jnp.asarray(P), jnp.asarray(A), rho,
                              sigma=1e-6, interpret=True), np.float64)
    for b, r in enumerate([0.1, 1.0, 10.0]):
        M = P[b].astype(np.float64) + 1e-6 * np.eye(n) + r * A[b].T.astype(np.float64) @ A[b]
        assert np.abs(Minv[b] @ M - np.eye(n)).max() <= 5e-5
