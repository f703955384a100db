"""Pallas TPU kernels: fused factor path for the sigma-free direct backend.

The round-2 factor path (the dominant cost of the headline solve — 233 of
357 ms at B=3072, n=512) runs as a pipeline of XLA ops and per-level Pallas
pivot kernels:

    M = P + sigma*I + A' diag(rho) A          (XLA einsum, HBM round trip)
    for each 128-block level j:               (ops/spd_kernels.gj_solve_sweep)
        Dinv_j  = pivot sweep kernel          (Pallas, VPU)
        W, Y updates                          (4 XLA einsums + padded selects,
                                               2 full HBM round trips/level)

Probed on the chip (benchmarks/fused_factor_probe.py, B=3072, n=512, m=256):
build 51 ms, the rest ~200 ms, of which the pivot kernels are ~90 ms
(VPU-bound) and the XLA level updates ~110 ms against a ~26 ms MXU floor —
the overhead is intermediate materialization and per-level HBM round trips.

Design here (what actually shipped, after measuring alternatives):

* **Augmented slab**: the working state is ONE buffer S_j = [W_trailing | Y]
  (n, width_j + k_pad) per lane — the GJ update for the trailing pivot
  columns and for the RHS block is the same formula, so each level is a
  single fused kernel: S' = S[:, NB:] - C @ (Dinv @ S[pivot rows, NB:]),
  with the pivot rows replaced by Dinv @ S[pivot rows, NB:]. One read + one
  write of the (shrinking) slab per level — no intermediates.
* **Level-0 build kernel**: seeds S_0 = [M | R] straight from P and
  R = [A' q], computing the gram A' diag(rho) A on the MXU in VMEM (the
  separate XLA einsum cost 51 ms, mostly the extra M round trip).
* **Pivot inverses stay in the standalone multi-lane sweep kernel**
  (ops/spd_kernels.pallas_spd_inverse_unrolled): its per-lane-step cost
  depends critically on lane stacking (measured 57 ns/lane-step at lanes=8
  vs 364 ns at lanes=1), so it must run at 8+ lanes — which rules out
  fusing it into the slab kernel (a full per-lane fusion was built and
  measured: 573 ms at lanes=1; lanes>=2 exceeds VMEM at n=512).

Numerics are identical to the unfused path: the same unpivoted symmetric
block Gauss-Jordan (fine for SPD), f32 with all dots at HIGHEST.

Replaces (on TPU): cholesky_init's build + spd_solve for the sigma-free
{G, g} cache (models/kkt.py) — the TPU re-design of the reference's cached
refactorization contract (/root/reference/LinearSystemSolvers.jl:30-44).
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


def _build_slab_kernel(P_ref, R_ref, rho_ref, S_ref, *, n, m, sigma):
    """S_0 = [P + sigma*I + A' diag(rho) A | R] per lane (grid over lanes)."""
    f32 = jnp.float32
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    At = R_ref[0, :, :m]                            # (n, m)
    gram = _dot(At * rho_ref[0], At, ((1,), (1,)))  # A' diag(rho) A
    S_ref[0, :, :n] = P_ref[0] + sigma * eye + gram
    S_ref[0, :, n:] = R_ref[0]


def _slab_level_kernel(S_ref, Dinv_ref, out_ref, *, n, j):
    """One GJ level on the augmented slab (grid over lanes).

    Slab columns [0, NB) are the current pivot columns; the pivot rows are
    [j*NB, (j+1)*NB). Output drops the pivot columns (width shrinks by NB).
    """
    S = S_ref[0]                                   # (n, width)
    Dinv = Dinv_ref[0]                             # (NB, NB)
    C = S[:, :NB]                                  # (n, NB)
    T = S[j * NB:(j + 1) * NB, NB:]                # (NB, width - NB)
    DinvT = _dot(Dinv, T)
    upd = S[:, NB:] - _dot(C, DinvT)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    in_j = (rows >= j * NB) & (rows < (j + 1) * NB)
    pad = [(j * NB, n - (j + 1) * NB), (0, 0)]
    # Pivot rows take the normalized rows exactly (the subtraction there
    # cancels only in exact arithmetic — same discipline as gj_solve_sweep).
    out_ref[0] = jnp.where(in_j, jnp.pad(DinvT, pad), upd)


@functools.partial(
    jax.jit, static_argnames=("sigma", "pivot_lanes", "interpret"))
def fused_factor_solve(P, R, rho_row, *, sigma: float, pivot_lanes: int = 8,
                       interpret: bool = False):
    """X = (P + sigma*I + A' diag(rho_row) A)^{-1} R via fused slab levels.

    Args:
      P: (B, n, n) f32, symmetric (positive definite with the sigma shift).
      R: (B, n, k_pad) f32 — packed RHS whose first m columns are A' (they
         double as the gram operand; see :func:`pack_rhs`).
      rho_row: (B, m) per-constraint penalties.
    Returns:
      X: (B, n, k_pad) f32 with M X = R.
    """
    from .spd_kernels import pallas_spd_inverse_unrolled

    B, n = P.shape[0], P.shape[-1]
    k_pad = R.shape[-1]
    m = rho_row.shape[-1]
    if n % NB or k_pad % NB or m % NB:
        raise ValueError(f"n, k_pad, m must be multiples of {NB}; "
                         f"got {(n, k_pad, m)}")
    f32 = jnp.float32

    lane_mat = lambda r, c: pl.BlockSpec((1, r, c), lambda b: (b, 0, 0),
                                         memory_space=pltpu.VMEM)

    S = pl.pallas_call(
        functools.partial(_build_slab_kernel, n=n, m=m, sigma=sigma),
        grid=(B,),
        in_specs=[lane_mat(n, n), lane_mat(n, k_pad), lane_mat(1, m)],
        out_specs=lane_mat(n, n + k_pad),
        out_shape=jax.ShapeDtypeStruct((B, n, n + k_pad), f32),
        interpret=interpret,
    )(P.astype(f32), R.astype(f32), rho_row.astype(f32)[:, None, :])

    for j in range(n // NB):
        width = S.shape[-1]
        Dinv = pallas_spd_inverse_unrolled(
            S[:, j * NB:(j + 1) * NB, :NB], lanes=pivot_lanes,
            interpret=interpret)
        S = pl.pallas_call(
            functools.partial(_slab_level_kernel, n=n, j=j),
            grid=(B,),
            in_specs=[lane_mat(n, width), lane_mat(NB, NB)],
            out_specs=lane_mat(n, width - NB),
            out_shape=jax.ShapeDtypeStruct((B, n, width - NB), f32),
            interpret=interpret,
        )(S, Dinv)
    return S


def pack_rhs(A, q):
    """R = [A' | q | 0-pad] (B, n, m + 128) for :func:`fused_factor_solve`."""
    At = jnp.swapaxes(A, -1, -2)
    cols = jnp.zeros(At.shape[:-1] + (NB,), At.dtype)
    cols = cols.at[..., 0].set(q)
    return jnp.concatenate([At, cols], axis=-1)
