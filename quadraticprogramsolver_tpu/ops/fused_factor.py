"""Pallas TPU kernel: fully-fused factor path for the sigma-free direct backend.

The round-2 factor path (the dominant cost of the headline solve — 233 of
357 ms at B=3072, n=512) runs as a pipeline of XLA ops and per-level Pallas
pivot kernels:

    M = P + sigma*I + A' diag(rho) A          (XLA einsum, HBM round trip)
    for each 128-block level j:               (ops/spd_kernels.gj_solve_sweep)
        Dinv_j  = pivot sweep kernel          (Pallas, VPU — reads/writes HBM)
        W, Y updates                          (XLA matmuls — 2 more HBM trips)

Every level round-trips the full working set (shrinking W plus the RHS block
Y) through HBM — ~10 MB per lane against an information floor of ~2.5 MB
(read P, A; write [G g]) — and each stage is a separate dispatch.

This kernel runs the ENTIRE factor per lane group inside VMEM: DMA P and
R = [A' q] in once, build M with one MXU gram product, eliminate the four
pivot levels with inline unrolled scalar sweeps (VPU) and rank-128 MXU
updates, and write out X = M^{-1}[A' q] = [G g] only. The per-lane scalar
sweep cost is DATA-bound, not issue-bound (measured ~57 ns per lane-step in
the standalone kernel = ~64 VPU cycles for the (128,128) rank-1 pass), so
stacking only ``lanes``=2 lanes per program costs the same per lane as the
standalone kernel's 8 — the VMEM budget, not sweep amortization, sets the
lane count. Interleaving the two lanes' level stages (sweep of lane 1
emitted between the MXU updates of lane 0) gives Mosaic's scheduler
independent VPU work to overlap with the matmuls.

Numerics are identical to the unfused path: the same unpivoted symmetric
Gauss-Jordan sweep (fine for SPD), f32 with all dots at HIGHEST.

Replaces (when enabled): cholesky_init's build + spd_solve for the
sigma-free {G, g} cache (models/kkt.py) — the TPU re-design of the
reference's cached-refactorization contract
(/root/reference/LinearSystemSolvers.jl:30-44).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, dims=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=_HI)


def _sweep_block_inplace(W_ref, r0: int, nlanes: int):
    """Unrolled symmetric Gauss-Jordan sweep of ``nlanes`` stacked (NB, NB)
    SPD blocks held in rows [r0, r0 + nlanes*NB) of a VMEM scratch.

    Same formulation as ops/spd_kernels._pivot_sweep_unrolled_kernel (the
    shipped "ref" variant): all slices static, per-step cost dominated by the
    (NB, NB) rank-1 read-modify-write pass. On exit the rows hold the
    NEGATED inverses (sweep convention); callers read -block.
    """
    f32 = jnp.float32
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1)
    for j in range(NB):
        e_j = (lane_idx == j).astype(f32)
        Cd = W_ref[r0:r0 + nlanes * NB, j:j + 1]          # (nlanes*NB, 1)
        for g in range(nlanes):
            base = r0 + g * NB
            r = W_ref[base + j:base + j + 1, :]           # (1, NB)
            dinv = 1.0 / r[0, j]
            blk = slice(base, base + NB)
            W_ref[blk, :] = W_ref[blk, :] - (
                Cd[g * NB:(g + 1) * NB] * dinv) * (r - e_j)
            W_ref[base + j:base + j + 1, :] = r * dinv
            W_ref[base + j:base + j + 1, j:j + 1] = jnp.full((1, 1), -dinv, f32)


def _fused_factor_kernel(P_ref, R_ref, rho_ref, X_ref, W_ref, Y_ref, D_ref,
                         *, n: int, m: int, k_pad: int, sigma: float,
                         lanes: int, interleave: bool):
    """Per grid step: ``lanes`` lanes' full factor solves in VMEM.

    Scratch layout: W_ref (lanes*n, n) — lane i's normal matrix at rows
    [i*n, (i+1)*n); Y_ref (lanes*n, k_pad) — the RHS block being solved;
    D_ref (lanes*NB, NB) — the current level's pivot blocks.
    """
    f32 = jnp.float32
    L = lanes
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)

    # Build M = P + sigma*I + A' diag(rho) A straight into scratch, and seed
    # the RHS buffer. At = R[:, :m] (the first m columns of the packed RHS).
    for i in range(L):
        At = R_ref[i, :, :m]                       # (n, m)
        Atr = At * rho_ref[i]                      # rho_ref[i]: (1, m)
        W_ref[i * n:(i + 1) * n, :] = (
            P_ref[i] + sigma * eye + _dot(Atr, At, ((1,), (1,))))
        Y_ref[i * n:(i + 1) * n, :] = R_ref[i]

    def level_updates(i, j):
        """Lane i's MXU updates for level j (pivot inverse already in D_ref)."""
        Dinv = -D_ref[i * NB:(i + 1) * NB, :]
        s0, s1 = j * NB, (j + 1) * NB
        base = i * n
        C = W_ref[base:base + n, s0:s1]            # (n, NB)
        Yb = Y_ref[base + s0:base + s1, :]         # (NB, k_pad)
        DinvY = _dot(Dinv, Yb)
        Y_ref[base:base + n, :] = Y_ref[base:base + n, :] - _dot(C, DinvY)
        Y_ref[base + s0:base + s1, :] = DinvY
        if s1 < n:
            T = W_ref[base + s0:base + s1, s1:]    # (NB, n - s1)
            DinvT = _dot(Dinv, T)
            W_ref[base:base + n, s1:] = (
                W_ref[base:base + n, s1:] - _dot(C, DinvT))
            W_ref[base + s0:base + s1, s1:] = DinvT

    def load_pivot(i, j):
        s0, s1 = j * NB, (j + 1) * NB
        D_ref[i * NB:(i + 1) * NB, :] = W_ref[i * n + s0:i * n + s1, s0:s1]

    nlev = n // NB
    if interleave and L > 1:
        # Software-pipelined emission: lane i's VPU sweep for level j sits
        # between lane i-1's sweep and lane i-1's MXU updates in program
        # order, giving the scheduler independent VPU/MXU work to overlap.
        for j in range(nlev):
            for i in range(L):
                load_pivot(i, j)
                _sweep_block_inplace(D_ref, i * NB, 1)
            for i in range(L):
                level_updates(i, j)
    else:
        for j in range(nlev):
            for i in range(L):
                load_pivot(i, j)
            _sweep_block_inplace(D_ref, 0, L)
            for i in range(L):
                level_updates(i, j)

    for i in range(L):
        X_ref[i] = Y_ref[i * n:(i + 1) * n, :]


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "lanes", "interleave", "interpret"))
def fused_factor_solve(P, R, rho_row, *, sigma: float, lanes: int = 2,
                       interleave: bool = True, interpret: bool = False):
    """X = (P + sigma*I + A' diag(rho_row) A)^{-1} R, fully fused per lane.

    Args:
      P: (B, n, n) f32, symmetric (positive definite with the sigma shift).
      R: (B, n, k_pad) f32 — packed RHS whose first m columns are A'
         (they double as the gram operand); k_pad a multiple of 128.
      rho_row: (B, m) per-constraint penalties; m = R's A' column count,
         inferred as k_pad - 128 (the last 128 columns carry q + padding).
    Returns:
      X: (B, n, k_pad) f32 with M X = R.
    """
    B, n = P.shape[0], P.shape[-1]
    k_pad = R.shape[-1]
    m = rho_row.shape[-1]
    if n % NB or k_pad % NB or m % NB:
        raise ValueError(f"n, k_pad, m must be multiples of {NB}; "
                         f"got {(n, k_pad, m)}")
    f32 = jnp.float32
    L = lanes
    while B % L:
        L //= 2
    kernel = functools.partial(
        _fused_factor_kernel, n=n, m=m, k_pad=k_pad, sigma=sigma, lanes=L,
        interleave=interleave)
    out = pl.pallas_call(
        kernel,
        grid=(B // L,),
        in_specs=[
            pl.BlockSpec((L, n, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, n, k_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, n, k_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, k_pad), f32),
        scratch_shapes=[
            pltpu.VMEM((L * n, n), f32),
            pltpu.VMEM((L * n, k_pad), f32),
            pltpu.VMEM((L * NB, NB), f32),
        ],
        interpret=interpret,
    )(P.astype(f32), R.astype(f32), rho_row.astype(f32)[:, None, :])
    return out


def pack_rhs(A, q):
    """R = [A' | q | 0-pad] (B, n, m + 128) for :func:`fused_factor_solve`."""
    At = jnp.swapaxes(A, -1, -2)
    B, n, m = At.shape
    cols = jnp.zeros(At.shape[:-1] + (NB,), At.dtype)
    cols = cols.at[..., 0].set(q)
    return jnp.concatenate([At, cols], axis=-1)
