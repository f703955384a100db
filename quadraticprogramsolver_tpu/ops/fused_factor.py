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

Design (fourth iteration; three measured dead ends below):

* **One constant-width slab S = [R | M], updated in place, eliminated
  right-to-left.** Block Gauss-Jordan elimination order is free for SPD, so
  pivot blocks are processed from M's LAST column block to its first: the
  live region is always columns [0, k_pad + (j+1)*128) — contiguous from
  zero — and each level is ONE full-width block per lane (grid = B). The
  pivot columns sit at the live region's right edge and are read from
  inside the same block (no separate C operand, no pivot-column copy), the
  updated live region is written back to offset 0 of the SAME buffer
  (``input_output_aliases``), and the dead pivot columns at the right are
  simply never touched again. Peak HBM: one slab.
* **Level-0 build kernel**: seeds S = [R | M] straight from P, A and q,
  computing the transpose A', the q column, and the gram A' diag(rho) A
  entirely in VMEM (the separate XLA einsum costs 51 ms, mostly the extra
  M round trip; the round-3 version also materialized R = [A' q] in HBM —
  3 GiB at B=4096, the difference between that fleet fitting and not).
* **Pivot inverses stay in the standalone multi-lane sweep kernel**
  (ops/spd_kernels.pallas_spd_inverse_unrolled): its per-lane-step cost
  depends critically on lane stacking (measured 57 ns/lane-step at lanes=8
  vs 364 ns at lanes=1), so it must run at 8+ lanes.

Measured dead ends (do not redo):
  * Full per-lane fusion (pivot sweep inside the slab kernel): 573 ms at
    lanes=1 — the per-step issue overhead of 512 sequential VPU steps per
    lane dwarfs the saved traffic; lanes>=2 exceeds VMEM at n=512.
  * Shrinking-width slab (a fresh, 128-columns-narrower buffer per level):
    correct and fast at small B, but peak HBM holds two multi-GB slabs plus
    P — RESOURCE_EXHAUSTED at the headline B=3072, n=512.
  * In-place slab with a (lane, trailing-128-column-block) grid: fits, but
    only matches the unfused path (249 vs 261 ms) — 55k tiny grid steps pay
    per-step issue overhead, and the separate pivot-column slab slice costs
    an extra HBM round trip per level.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, dims=((1,), (0,)), precision=_HI):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=precision)


def _build_slab_kernel(P_ref, *refs, n, ms, k_pad, sigma, at_via_dot):
    """S = [A_0' | A_1' | ... | q | 0-pad | P + sigma*I + sum_i A_i' W_i A_i]
    per lane, built straight from the row blocks.

    Round-4 change: the packed RHS R = [A' q] is never materialized in HBM
    (3 GiB at B=4096, n=512 — the difference between the 4096-lane fleet
    fitting in 16 GiB HBM and not). The transposes, the q column, and the
    grams are all computed in VMEM from the resident row blocks. Multiple
    blocks (``ms`` = their row counts) serve the prox-ALM form, whose
    normal matrix is P + rho(A'A + C'C) — passing (A, C) separately also
    avoids materializing their (B, me+mi, n) concatenation.

    ``refs`` = (*A_refs, q_ref, *rho_refs, S_ref); one (1, 1, m_i) rho ref
    per block — separate operands, because an in-kernel lane-offset slice
    of a packed (1, sum(ms)) row gives Mosaic an operand layout its dot
    lowering rejects ("Invalid input layout", measured on-chip round 4).

    ``at_via_dot``: compute A' as A'·I on the MXU (dot_general contracting
    A's row axis with an identity — exact in f32: each output sums exactly
    one nonzero product) instead of a layout transpose, for backends whose
    Mosaic lacks 2-D transpose support.
    """
    f32 = jnp.float32
    A_refs = refs[: len(ms)]
    q_ref = refs[len(ms)]
    rho_refs = refs[len(ms) + 1: 2 * len(ms) + 1]
    S_ref = refs[-1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    gram = sigma * eye
    off = 0
    for A_ref, rho_ref, m in zip(A_refs, rho_refs, ms):
        A = A_ref[0]                                # (m, n)
        if at_via_dot:
            eye_m = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
                     == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
                     ).astype(f32)
            At = _dot(A, eye_m, ((0,), (0,)))       # (n, m) = A'·I
        else:
            At = jnp.swapaxes(A, 0, 1)              # (n, m)
        gram = gram + _dot(At * rho_ref[0], At, ((1,), (1,)))
        S_ref[0, :, off:off + m] = At
        off += m
    # q as a column: row-sum of diag(q) = eye_n * q_row (Mosaic-safe way to
    # turn the (1, n) row into an (n, 1) column without a vector transpose).
    q_col = jnp.sum(eye * q_ref[0], axis=1, keepdims=True)       # (n, 1)
    pad_cols = jax.lax.broadcasted_iota(jnp.int32, (n, k_pad - off), 1)
    S_ref[0, :, off:k_pad] = jnp.where(pad_cols == 0, q_col, 0.0)
    S_ref[0, :, k_pad:] = P_ref[0] + gram


def _slab_level_kernel(S_ref, Dinv_ref, out_ref, *, n, j, w_out, prec):
    """One GJ level on the whole live region (grid over lanes), in place.

    The live region is S[:, :w_out + NB]; its last NB columns are this
    level's pivot columns (M's block column j), its first w_out columns the
    surviving state. Pivot rows take the normalized rows exactly (the
    subtraction there cancels only in exact arithmetic — same discipline as
    gj_solve_sweep).

    ``prec="high"``: manual 3-pass bf16x3 for the two level dots (same
    trick as ops/fused_admm.py — in-kernel dots are MXU-pass-bound and
    Mosaic rejects the built-in HIGH). Only the SMALL operands are split
    (Dinv, the NB pivot rows of T, C, DinvT — never the full live region,
    which enters elementwise), so the VMEM overhead is a few NB-wide
    strips.
    """
    S = S_ref[0]                                   # (n, w_out + NB)
    Dinv = Dinv_ref[0]                             # (NB, NB)
    C = S[:, w_out:]                               # (n, NB) pivot columns
    T = S[:, :w_out]                               # (n, w_out)
    if prec == "high":
        f32, bf16 = jnp.float32, jnp.bfloat16

        def _split(v):
            vh = v.astype(bf16)
            return vh, (v - vh.astype(f32)).astype(bf16)

        def dot3(a_sp, b_sp):
            (ah, al), (bh, bl) = a_sp, b_sp
            d = lambda p, q: _dot(p, q, precision=jax.lax.Precision.DEFAULT)
            return d(ah, bh) + d(ah, bl) + d(al, bh)

        Dinv_sp = _split(Dinv)
        DinvT = dot3(Dinv_sp, _split(T[j * NB:(j + 1) * NB, :]))
        upd = T - dot3(_split(C), _split(DinvT))
    else:
        DinvT = _dot(Dinv, T[j * NB:(j + 1) * NB, :], precision=prec)
        upd = T - _dot(C, DinvT, precision=prec)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    in_j = (rows >= j * NB) & (rows < (j + 1) * NB)
    pad = [(j * NB, n - (j + 1) * NB), (0, 0)]
    out_ref[0] = jnp.where(in_j, jnp.pad(DinvT, pad), upd)


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "pivot_lanes", "pivot_variant",
                     "dot_precision", "at_via_dot", "interpret"))
def fused_factor_solve(P, A, q, rho_row, *, sigma: float,
                       pivot_lanes: int = 8,
                       pivot_variant: str = "v3",
                       dot_precision: str = "highest",
                       at_via_dot: bool = False,
                       interpret: bool = False):
    """Slab S with S[..., :k_pad] = (P + sigma*I + A' diag(rho) A)^{-1} [A' q].

    Args:
      P: (B, n, n) f32, symmetric (positive definite with the sigma shift).
      A: (B, m, n) f32 constraint matrix — or a TUPLE of row blocks
         ((B, m_0, n), (B, m_1, n), ...) treated as their vertical stack
         without ever materializing the concatenation (the prox-ALM form's
         (A, C) pair). q: (B, n) linear term. The RHS R = [A_0' A_1' ... |
         q | 0-pad] (k_pad = sum(m_i) + 128 columns) is assembled inside
         the build kernel — never materialized in HBM.
      rho_row: (B, sum(m_i)) per-constraint penalties, block order.
      dot_precision: MXU passes for the LEVEL-update dots ("highest" = full
         f32 6-pass, "high" = MANUAL 3-pass bf16x3 — Mosaic rejects the
         built-in Precision.HIGH, so the split ah*bh + ah*bl + al*bh is
         written by hand in the level kernel, round 4). The build gram and
         the pivot inverses always run at HIGHEST (they set the
         conditioning).
    Returns:
      The full (B, n, k_pad + n) slab, whose first k_pad columns are the
      solve X = M^{-1}[A' | q | 0]; columns beyond k_pad are dead pivot
      state. Returning the slab (instead of slicing X here) lets callers
      slice exactly the G = X[:, :m] and g = X[:, m] they need — a full-X
      slice is a 3 GiB copy at B=4096 that pushes peak HBM over 16 GiB.
    """
    from .spd_kernels import pallas_spd_inverse_unrolled

    A_blocks = A if isinstance(A, (tuple, list)) else (A,)
    B, n = P.shape[0], P.shape[-1]
    ms = tuple(a.shape[-2] for a in A_blocks)
    m = rho_row.shape[-1]
    if m != sum(ms):
        raise ValueError(f"rho_row has {m} rows, blocks sum to {sum(ms)}")
    k_pad = m + NB
    if n % NB or any(mi % NB for mi in ms):
        raise ValueError(f"n and every block's rows must be multiples of "
                         f"{NB}; got {(n, ms)}")
    f32 = jnp.float32
    wid = k_pad + n
    # "high" stays a STRING sentinel — the level kernel implements it as a
    # manual 3-pass bf16x3 split (Mosaic rejects Precision.HIGH).
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": "high"}[dot_precision]

    lane_mat = lambda r, c: pl.BlockSpec((1, r, c), lambda b: (b, 0, 0),
                                         memory_space=pltpu.VMEM)

    S = pl.pallas_call(
        functools.partial(_build_slab_kernel, n=n, ms=ms, k_pad=k_pad,
                          sigma=sigma, at_via_dot=at_via_dot),
        grid=(B,),
        in_specs=[lane_mat(n, n)] + [lane_mat(mi, n) for mi in ms]
                 + [lane_mat(1, n)] + [lane_mat(1, mi) for mi in ms],
        out_specs=lane_mat(n, wid),
        out_shape=jax.ShapeDtypeStruct((B, n, wid), f32),
        interpret=interpret,
    )(P.astype(f32), *(a.astype(f32) for a in A_blocks),
      q.astype(f32)[:, None, :],
      *(rho_row[..., o:o + mi].astype(f32)[:, None, :]
        for o, mi in zip(np.cumsum((0,) + ms[:-1]), ms)))

    for j in range(n // NB - 1, -1, -1):
        # The pivot-block slice for the inverse sweep is the only state read
        # outside the level kernel (a (B, NB, NB) copy).
        D = jax.lax.slice(S, (0, j * NB, k_pad + j * NB),
                          (B, (j + 1) * NB, k_pad + (j + 1) * NB))
        Dinv = pallas_spd_inverse_unrolled(D, lanes=pivot_lanes,
                                           variant=pivot_variant,
                                           interpret=interpret)
        w_out = k_pad + j * NB
        S = pl.pallas_call(
            functools.partial(_slab_level_kernel, n=n, j=j, w_out=w_out,
                              prec=prec),
            grid=(B,),
            in_specs=[lane_mat(n, w_out + NB), lane_mat(NB, NB)],
            out_specs=lane_mat(n, w_out),
            out_shape=jax.ShapeDtypeStruct((B, n, wid), f32),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(S, Dinv)
    return S
