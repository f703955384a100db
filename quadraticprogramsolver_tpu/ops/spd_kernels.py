"""Pallas TPU kernel: fused normal-matrix build + SPD inversion per lane.

The refactorization path — M = P + sigma*I + rho*A'A followed by M^{-1} — is
the dominant per-solve cost of the batched direct backend (~95% at B=2048,
n=512). Through XLA it runs as ~30 separate batched matmuls, each making a
full HBM round trip (batched matmuls on this chip are HBM-bound, so the
round trips, not FLOPs, set the time).

This kernel does the whole thing per lane inside VMEM: DMA P (n^2) and A
(mn) in once, build M with one MXU gram product, invert it in place with a
blocked **sweep operator** (unpivoted block Gauss-Jordan — numerically fine
for SPD; sweeping every pivot block of [[D, B'], [B, C]] maps it to
[[-D^{-1}, D^{-1}B'], [BD^{-1}, C - BD^{-1}B']], and after all T blocks the
buffer holds -M^{-1}), and write M^{-1} (n^2) out. HBM traffic drops to the
information-theoretic floor (read P, A; write M^{-1}).

The 128x128 pivot-block inverses use the same sweep at scalar granularity —
128 sequential steps of rank-1 VPU updates; everything else is MXU matmuls.
n and m must be multiples of 128 (pad_qp).

Performance status (TPU v5e, B=2048, n=512, m=256) — all variants measured,
none beats XLA yet; the solver keeps ops/linalg.spd_inverse (recursive
blocked Schur, 238 ms):
  * monolithic per-lane kernel: 316 ms. Bisected: gram+IO 44 ms, level
    matmuls +27 ms, scalar sweeps +240 ms — per-sequential-step loop
    overhead (~0.2 us x 512 steps x 2048 serialized lane programs), not
    arithmetic.
  * multi-lane pivot kernel (pallas_spd_inverse_nb, lanes stacked 2D):
    amortizes the loop overhead but replaces it with per-step dot latency
    (the mask + one-hot-matmul extraction round-2 Mosaic forced — it
    rejected rank-3 elementwise layouts, strided value slices, and value
    dynamic_slice); 141 ms for the (B,128,128) pivots alone vs 84 ms XLA
    Cholesky.
Round-2/3 updates: the UNROLLED multi-lane kernels below
(pallas_spd_inverse_unrolled) replaced the fori_loop kernels in the solver
paths, and after a round-3 backend update Mosaic ACCEPTS rank-3 elementwise
layouts — the "v3" variant (one fused (L, nb, nb) update per step, no
per-lane concatenations) is the measured-fastest and the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # pivot block size (MXU tile)
_HI = jax.lax.Precision.HIGHEST


def _sweep_inverse_block(D):
    """Inverse of an SPD (NB, NB) block via NB scalar sweep steps (VPU).

    Row/column/pivot extraction is mask-based (Mosaic has no dynamic_slice
    on values; a cyclic-roll formulation with static slices was measured
    slower — full-matrix rolls cost more than the masked reductions). The
    sequential-step loop overhead (~0.2 us/step) is the kernel's current
    bottleneck; amortizing it by stacking several lanes per program is the
    known next optimization (see module docstring).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)

    def step(j, S):
        row_m = rows == j
        col_m = cols == j
        d = jnp.sum(jnp.where(row_m & col_m, S, 0.0))
        dinv = 1.0 / d
        c = jnp.sum(jnp.where(col_m, S, 0.0), axis=1, keepdims=True)  # (NB, 1)
        r = jnp.sum(jnp.where(row_m, S, 0.0), axis=0, keepdims=True)  # (1, NB)
        S = S - (c * dinv) * r
        S = jnp.where(col_m, c * dinv, S)
        S = jnp.where(row_m, r * dinv, S)
        S = jnp.where(row_m & col_m, -dinv, S)
        return S

    S = jax.lax.fori_loop(0, NB, step, D)
    return -S


def _pivot_sweep_kernel_2d(S_ref, out_ref, *, lanes: int):
    """Scalar sweep inversion of `lanes` stacked (NB, NB) SPD blocks, laid
    out 2D as (lanes*NB, NB) — lane g occupies rows [g*NB, (g+1)*NB).

    Everything stays rank-2 (Mosaic's layout inference rejects the natural
    rank-3 formulation), pivot row/scalar extraction is mask + one-hot
    matmul (no strided value slices, which Mosaic also rejects), and the
    segment broadcast back down each lane block is the constant E matmul.
    """
    L = lanes
    f32 = jnp.float32
    cols_idx = jax.lax.broadcasted_iota(jnp.int32, (L * NB, NB), 1)
    rows_mod = jax.lax.broadcasted_iota(jnp.int32, (L * NB, NB), 0) % NB
    # Constant one-hot segment-broadcast operator: E[i, g] = 1 iff row i
    # belongs to lane g; E @ (L, k) replicates each lane's row down its block
    # (pltpu.repeat tiles rather than element-repeats, so it can't be used).
    E = (jax.lax.broadcasted_iota(jnp.int32, (L * NB, L), 0) // NB
         == jax.lax.broadcasted_iota(jnp.int32, (L * NB, L), 1)).astype(f32)

    def bcast(x_lanes):
        return jax.lax.dot_general(
            E, x_lanes, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_HI)

    def step(j, S):
        col_m = cols_idx == j
        row_m = rows_mod == j
        # Pivot-row extraction via a mask + the same segment-broadcast matmul
        # (Mosaic supports neither strided value slices nor rank-3 layouts):
        # row_sum[i] = row j of lane(i) summed out, then re-broadcast.
        r_full = bcast(jax.lax.dot_general(
            jnp.swapaxes(E, 0, 1), jnp.where(row_m, S, 0.0),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI))                                    # (L*NB, NB)
        c = jnp.sum(jnp.where(col_m, S, 0.0), axis=1, keepdims=True)
        d = jnp.sum(jnp.where(row_m & col_m, S, 0.0), axis=1, keepdims=True)
        dinv = bcast(jax.lax.dot_general(
            jnp.swapaxes(E, 0, 1), d, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_HI))
        dinv = 1.0 / jnp.where(dinv == 0, 1.0, dinv)
        S = S - (c * dinv) * r_full
        S = jnp.where(col_m, c * dinv, S)
        S = jnp.where(row_m, r_full * dinv, S)
        S = jnp.where(row_m & col_m, -dinv, S)
        return S

    out_ref[:] = -jax.lax.fori_loop(0, NB, step, S_ref[:])


@functools.partial(jax.jit, static_argnames=("lanes", "interpret"))
def pallas_spd_inverse_nb(D, *, lanes: int = 8, interpret: bool = False):
    """Batched (B, NB, NB) SPD inverse via the multi-lane 2D sweep kernel."""
    B = D.shape[0]
    if D.shape[-1] != NB or D.shape[-2] != NB:
        raise ValueError(f"blocks must be ({NB}, {NB}); got {D.shape}")
    L = lanes
    while B % L:
        L //= 2
    f32 = jnp.float32
    flat = D.astype(f32).reshape(B * NB, NB)
    out = pl.pallas_call(
        functools.partial(_pivot_sweep_kernel_2d, lanes=L),
        grid=(B // L,),
        in_specs=[pl.BlockSpec((L * NB, NB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L * NB, NB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * NB, NB), f32),
        interpret=interpret,
    )(flat)
    return out.reshape(B, NB, NB)


def spd_inverse_sweep(M, pivot_inverse=None):
    """Flat (non-recursive) blocked sweep inversion at the XLA level.

    One level per NB-sized pivot block: the big rank-NB updates are regular
    batched matmuls (well-shaped for the MXU, unlike the recursion's shrinking
    blocks), and the (B, NB, NB) pivot inversions go to ``pivot_inverse``
    (default: the multi-lane Pallas sweep kernel).
    """
    n = M.shape[-1]
    if pivot_inverse is None:
        pivot_inverse = pallas_spd_inverse_nb
    if n % NB:
        raise ValueError(f"n must be a multiple of {NB}; got {n}")
    W = M
    for k in range(n // NB):
        s = slice(k * NB, (k + 1) * NB)
        Dinv = pivot_inverse(W[..., s, s])
        C = W[..., :, s]
        R = W[..., s, :]
        CDinv = jnp.einsum("...ij,...jk->...ik", C, Dinv)
        W = W - jnp.einsum("...ij,...jk->...ik", CDinv, R)
        W = W.at[..., :, s].set(CDinv)
        W = W.at[..., s, :].set(jnp.einsum("...ij,...jk->...ik", Dinv, R))
        W = W.at[..., s, s].set(-Dinv)
    return -W


# --------------------------------------------------------------------------
# Round-2 pivot kernel: fully-unrolled multi-lane symmetric sweep
# --------------------------------------------------------------------------
#
# The round-1 kernels above lose to XLA because their fori_loop formulation
# forces dynamic row/col extraction through masks and one-hot matmuls (0.5-1
# us per step). Unrolling the NB scalar steps makes every slice STATIC, and
# the Gauss-Jordan sweep preserves symmetry at every step (with the swept
# diagonal negated), so the pivot column is one width-1 lane slice and the
# pivot rows are L cheap (1, NB) sublane slices — no masks, no dots, no
# transposes. Lanes are stacked along sublanes ((L*NB, NB), lane g at rows
# [g*NB, (g+1)*NB)) so each step's rank-1 update is one fused VPU pass over
# all L lanes.


def _pivot_sweep_unrolled_kernel(S_ref, out_ref, W, *, lanes: int, nb: int):
    # W is a VMEM scratch working buffer: read-modify-write chains on out_ref
    # itself produce wrong results when grid == 1 (observed in interpret
    # mode — the output block does not reliably round-trip between the
    # unrolled steps), and scratch is the guide's idiom for in-place work.
    f32 = jnp.float32
    L = lanes
    W[:] = S_ref[:]
    # e_j as a row one-hot, built once per j from a static iota compare.
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    for j in range(nb):
        e_j = (lane_idx == j).astype(f32)                  # (1, nb)
        Cd = W[:, j:j + 1]                                 # (L*nb, 1) column j
        for g in range(L):
            r = W[g * nb + j:g * nb + j + 1, :]            # (1, nb) pivot row
            dinv = 1.0 / r[0, j]
            # Rank-1 update with the column-fix folded in: subtracting e_j
            # from the (scaled) row makes the post-update column j equal
            # C*dinv directly (no separate width-1 lane store needed).
            blk = slice(g * nb, (g + 1) * nb)
            W[blk, :] = W[blk, :] - (Cd[blk] * dinv) * (r - e_j)
            W[g * nb + j:g * nb + j + 1, :] = r * dinv
            W[g * nb + j:g * nb + j + 1, j:j + 1] = jnp.full((1, 1), -dinv, f32)
    out_ref[:] = -W[:]


def _pivot_sweep_value_kernel(S_ref, out_ref, *, lanes: int, nb: int):
    """Value-based variant: one fused rank-1 update per step, no per-block
    ref round-trips. Folding the row fix into the outer product via
    a = (C - e_col_j) * dinv makes row j come out as dinv*r directly; the
    only residue is a constant +2 at each block diagonal (j, j), fixed once
    at the end (later steps never read their own (j, j))."""
    f32 = jnp.float32
    L = lanes
    W = S_ref[:]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    sub_idx = jax.lax.broadcasted_iota(jnp.int32, (L * nb, 1), 0) % nb
    diag_mask = (jnp.broadcast_to(sub_idx, (L * nb, nb))
                 == jnp.broadcast_to(lane_idx, (L * nb, nb))).astype(f32)
    # Jacobi pre-scaling to unit diagonal: without it the folded row-fix
    # computes row j as dinv*r via cancellation of O(diag^2) products and
    # loses ~3 digits when the diagonal is large. With unit diagonal every
    # intermediate is O(1). Row scale from a lane-reduce, per-block column
    # scale from sublane-reduces — no transposes.
    Wd = W * diag_mask
    s_col = jax.lax.rsqrt(jnp.sum(Wd, axis=1, keepdims=True))      # (L*nb, 1)
    s_row = jnp.concatenate(
        [jnp.broadcast_to(
            jax.lax.rsqrt(jnp.sum(Wd[g * nb:(g + 1) * nb, :], axis=0,
                                  keepdims=True)), (nb, nb))
         for g in range(L)], axis=0)                               # (L*nb, nb)
    W = W * s_col * s_row
    for j in range(nb):
        e_row = (lane_idx == j).astype(f32)          # (1, nb)
        e_col = (sub_idx == j).astype(f32)           # (L*nb, 1)
        rs = [W[g * nb + j:g * nb + j + 1, :] for g in range(L)]
        dinv_col = jnp.concatenate(
            [jnp.full((nb, 1), 1.0 / rs[g][0, j], f32) for g in range(L)], axis=0)
        a = (W[:, j:j + 1] - e_col) * dinv_col
        R = jnp.concatenate(
            [jnp.broadcast_to(rs[g], (nb, nb)) for g in range(L)], axis=0)
        W = W - a * (R - e_row)
    # inv(D) = S inv(Dn) S with S = diag(s): same scales on the way out.
    out_ref[:] = (2.0 * diag_mask - W) * s_col * s_row


def _pivot_sweep_v3_kernel(S_ref, out_ref, *, lanes: int, nb: int):
    """Rank-3 (lane, sublane, lane) variant: same math as the value kernel,
    but the per-step row/column/pivot reads are single static slices of a
    (L, nb, nb) view instead of per-lane concatenations — the per-step cost
    becomes ONE fused (L, nb, nb) elementwise update, so it scales with lane
    stacking instead of paying L small-op latencies. (Round-2 Mosaic
    rejected rank-3 elementwise layouts; re-tried after the round-3 backend
    update.)"""
    f32 = jnp.float32
    L = lanes
    W = S_ref[:].reshape(L, nb, nb)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    sub_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    diag_mask = (jnp.broadcast_to(sub_idx, (1, nb, nb))
                 == jnp.broadcast_to(lane_idx, (1, nb, nb))).astype(f32)
    # Jacobi pre-scaling to unit diagonal (same rationale as the value
    # kernel: the folded row-fix loses ~3 digits without it).
    Wd = W * diag_mask
    s_col = jax.lax.rsqrt(jnp.sum(Wd, axis=2, keepdims=True))   # (L, nb, 1)
    s_row = jax.lax.rsqrt(jnp.sum(Wd, axis=1, keepdims=True))   # (L, 1, nb)
    W = W * s_col * s_row
    for j in range(nb):
        e_row = (lane_idx == j).astype(f32)          # (1, 1, nb)
        e_col = (sub_idx == j).astype(f32)           # (1, nb, 1)
        r = W[:, j:j + 1, :]                         # (L, 1, nb) pivot row
        dinv = 1.0 / r[:, :, j:j + 1]                # (L, 1, 1)
        c = W[:, :, j:j + 1]                         # (L, nb, 1) pivot col
        a = (c - e_col) * dinv
        W = W - a * (r - e_row)
    out = (2.0 * diag_mask - W) * s_col * s_row
    out_ref[:] = out.reshape(L * nb, nb)


def _pivot_sweep_rq_kernel(S_ref, out_ref, *, lanes: int, nb: int, q: int):
    """Rank-q composition of the v3 sweep with ANALYTIC in-group corrections.

    q consecutive GJ steps share ONE fused (L, nb, nb) pass
    ``W -= sum_t a_t w_t``; the later steps' factors are corrected from the
    earlier ones' by tiny vector FMAs on the group's own rows/columns
    ((L, 1, nb) + (L, nb, 1) each — q*(q-1) of them per group). Unlike the
    measured-dead panel variant there are NO concats and NO batched MXU
    mini-dots: everything stays fused elementwise, so the only cost moved
    is full passes 128 -> 128/q. Targets the round-3 pivot-endgame finding
    that per-step cost is scheduler/issue-bound (~0.2-0.3 us/step at any
    width): if that floor is per PASS, rank-q divides it.

    Same algebra as v3 (derivation: step j is W <- W - a_j w_j; step k>j
    inside the group needs column/row k of the PARTIALLY UPDATED W, i.e.
    c_k - sum_{u<k} a_u w_u[k] and r_k - sum_{u<k} a_u[k] w_u — the
    corrections below), same Jacobi pre-scale, same folded e-fixes.
    """
    f32 = jnp.float32
    L = lanes
    W = S_ref[:].reshape(L, nb, nb)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    sub_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    diag_mask = (jnp.broadcast_to(sub_idx, (1, nb, nb))
                 == jnp.broadcast_to(lane_idx, (1, nb, nb))).astype(f32)
    Wd = W * diag_mask
    s_col = jax.lax.rsqrt(jnp.sum(Wd, axis=2, keepdims=True))
    s_row = jax.lax.rsqrt(jnp.sum(Wd, axis=1, keepdims=True))
    W = W * s_col * s_row
    for p in range(nb // q):
        a_list, w_list = [], []
        for t in range(q):
            j = p * q + t
            e_row = (lane_idx == j).astype(f32)
            e_col = (sub_idx == j).astype(f32)
            r = W[:, j:j + 1, :]                       # (L, 1, nb)
            c = W[:, :, j:j + 1]                       # (L, nb, 1)
            for a_u, w_u in zip(a_list, w_list):
                r = r - a_u[:, j:j + 1, :] * w_u       # row-j correction
                c = c - a_u * w_u[:, :, j:j + 1]       # col-j correction
            dinv = 1.0 / r[:, :, j:j + 1]              # (L, 1, 1)
            a_list.append((c - e_col) * dinv)
            w_list.append(r - e_row)
        upd = a_list[0] * w_list[0]
        for a_t, w_t in zip(a_list[1:], w_list[1:]):
            upd = upd + a_t * w_t
        W = W - upd                                    # ONE fused full pass
    out = (2.0 * diag_mask - W) * s_col * s_row
    out_ref[:] = out.reshape(L * nb, nb)


def _pivot_sweep_panel_kernel(S_ref, out_ref, *, lanes: int, nb: int,
                              pw: int = 8):
    """Rank-pw panel composition of the v3 sweep.

    The v3 kernel's cost is 128 full-(L, nb, nb) passes whose column
    broadcast caps element throughput at ~330 GF/s. Each sweep step is a
    PURE rank-1 subtraction W -= a_t w_t' (the e-folding makes the row/col
    fixes part of the outer product), so pw consecutive steps compose into
    W -= V U with V = [a_0..a_{pw-1}], U = [w_0'; ..] — ONE batched MXU dot
    and ONE fused full-W pass per panel (nb/pw passes per level instead of
    nb). The a_t/w_t factors are derived on panel-restricted slabs
    Wc = W[:, :, K], Wr = W[:, K, :] (tiny per-step updates), which stay
    consistent with the full W because each t's update is the same rank-1
    restricted to those rows/columns.

    Numerics: identical algebra to v3 (same Jacobi pre-scale, same folded
    fixes), different fusion only.
    """
    f32 = jnp.float32
    L = lanes
    W = S_ref[:].reshape(L, nb, nb)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    sub_idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    diag_mask = (jnp.broadcast_to(sub_idx, (1, nb, nb))
                 == jnp.broadcast_to(lane_idx, (1, nb, nb))).astype(f32)
    Wd = W * diag_mask
    s_col = jax.lax.rsqrt(jnp.sum(Wd, axis=2, keepdims=True))
    s_row = jax.lax.rsqrt(jnp.sum(Wd, axis=1, keepdims=True))
    W = W * s_col * s_row
    for p in range(nb // pw):
        k0 = p * pw
        Wc = W[:, :, k0:k0 + pw]                     # (L, nb, pw)
        Wr = W[:, k0:k0 + pw, :]                     # (L, pw, nb)
        a_list, w_list = [], []
        for t in range(pw):
            j = k0 + t
            e_row = (lane_idx == j).astype(f32)      # (1, 1, nb)
            e_col = (sub_idx == j).astype(f32)       # (1, nb, 1)
            r = Wr[:, t:t + 1, :]                    # (L, 1, nb)
            dinv = 1.0 / r[:, :, j:j + 1]            # (L, 1, 1)
            c = Wc[:, :, t:t + 1]                    # (L, nb, 1)
            a = (c - e_col) * dinv                   # (L, nb, 1)
            w = r - e_row                            # (L, 1, nb)
            a_list.append(a)
            w_list.append(w)
            if t + 1 < pw:
                Wc = Wc - a * w[:, :, k0:k0 + pw]
                Wr = Wr - a[:, k0:k0 + pw, :] * w
        V = jnp.concatenate(a_list, axis=2)          # (L, nb, pw)
        U = jnp.concatenate(w_list, axis=1)          # (L, pw, nb)
        VU = jax.lax.dot_general(
            V, U, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32, precision=_HI)
        W = W - VU
    out = (2.0 * diag_mask - W) * s_col * s_row
    out_ref[:] = out.reshape(L * nb, nb)


def _pivot_sweep_v3p_kernel(S_ref, out_ref, *, lanes: int, hb: int = 64):
    """Paired-half v3 sweep: TWO independent (hb, hb) SPD blocks per
    128-lane tile (problem a in lanes [0, hb), problem b in [hb, 2hb)).

    Why: the v3 sweep is bound by per-step VMEM round trips of the working
    buffer (measured: 128 dependent pure-FMA passes over (L, 128, 128)
    already cost 26.8 ms vs v3's 34.9 at B=3072 — the buffer spills through
    VMEM every step). Pairing halves the buffer AND halves the steps:
    ~4x less per-sweep traffic at full lane occupancy. Used by
    spd_inverse_128_schur to build 128x128 inverses from two paired-64
    sweeps + MXU Schur arithmetic.
    """
    f32 = jnp.float32
    L = lanes
    W = S_ref[:].reshape(L, hb, 2 * hb)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * hb), 2)
    lane_h = lane % hb
    left = (lane < hb).astype(f32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, hb, 1), 1)
    diag_mask = (jnp.broadcast_to(sub, (1, hb, 2 * hb))
                 == jnp.broadcast_to(lane_h, (1, hb, 2 * hb))).astype(f32)
    Wd = W * diag_mask
    # Row scales are per-lane (each lane belongs to one problem); column
    # scales are per-(row, half).
    s_row = jax.lax.rsqrt(jnp.sum(Wd, axis=1, keepdims=True))  # (L, 1, 2hb)
    s_col_l = jax.lax.rsqrt(jnp.sum(Wd[:, :, :hb], axis=2, keepdims=True))
    s_col_r = jax.lax.rsqrt(jnp.sum(Wd[:, :, hb:], axis=2, keepdims=True))
    s_col = s_col_l * left + s_col_r * (1.0 - left)             # (L, hb, 2hb)
    W = W * s_col * s_row
    for j in range(hb):
        e_row = (lane_h == j).astype(f32)            # (1, 1, 2hb) both halves
        e_col = (sub == j).astype(f32)               # (1, hb, 1)
        r = W[:, j:j + 1, :]                         # (L, 1, 2hb)
        a_l = (W[:, :, j:j + 1] - e_col) / r[:, :, j:j + 1]
        a_r = (W[:, :, hb + j:hb + j + 1] - e_col) / r[:, :, hb + j:hb + j + 1]
        a = a_l * left + a_r * (1.0 - left)          # (L, hb, 2hb)
        W = W - a * (r - e_row)
    out = (2.0 * diag_mask - W) * s_col * s_row
    out_ref[:] = out.reshape(L * hb, 2 * hb)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret"))
def pallas_spd_inverse_64p(D, *, lanes: int = 8, interpret: bool = False):
    """Batched (B, 64, 64) SPD inverse via the paired-half v3p sweep.

    B must be even (pairs share a 128-lane tile). Returns f32.
    """
    hb = D.shape[-1]
    B = D.shape[0]
    if D.shape[-2] != hb or hb != 64:
        raise ValueError(f"blocks must be (64, 64); got {D.shape}")
    if B % 2:
        raise ValueError("batch must be even for pairing")
    f32 = jnp.float32
    # Pack pairs side by side: P[p, s, hb*h + l] = D[2p + h, s, l].
    packed = D.astype(f32).reshape(B // 2, 2, hb, hb)
    packed = jnp.swapaxes(packed, 1, 2).reshape(B // 2, hb, 2 * hb)
    L = lanes
    while (B // 2) % L or (B // 2) // L < 2:
        L //= 2
    flat = packed.reshape((B // 2) * hb, 2 * hb)
    out = pl.pallas_call(
        functools.partial(_pivot_sweep_v3p_kernel, lanes=L, hb=hb),
        grid=(B // 2 // L,),
        in_specs=[pl.BlockSpec((L * hb, 2 * hb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L * hb, 2 * hb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((B // 2) * hb, 2 * hb), f32),
        interpret=interpret,
    )(flat)
    out = out.reshape(B // 2, hb, 2, hb)
    return jnp.swapaxes(out, 1, 2).reshape(B, hb, hb)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret"))
def spd_inverse_128_schur(D, *, lanes: int = 8, interpret: bool = False):
    """Batched (B, 128, 128) SPD inverse: 2x2 block-Schur over paired-64
    sweeps (pallas_spd_inverse_64p) + MXU Schur arithmetic.

        D = [[A, B], [B', C]],  S = C - B' A^{-1} B,  W = A^{-1} B
        D^{-1} = [[A^{-1} + W S^{-1} W',  -W S^{-1}],
                  [-S^{-1} W',             S^{-1}]]

    Two sequential paired sweeps (A-batch, then S-batch) at ~1/4 the
    per-sweep VMEM traffic of the direct 128 sweep, plus four batched
    64-sized HIGHEST matmuls.
    """
    B = D.shape[0]
    nb = D.shape[-1]
    if nb != 128 or D.shape[-2] != nb:
        raise ValueError(f"blocks must be (128, 128); got {D.shape}")
    if B % 2:
        return _pivot_fallback(D, lanes=lanes, interpret=interpret)
    f32 = jnp.float32
    D = D.astype(f32)
    h = 64
    A = D[:, :h, :h]
    Bm = D[:, :h, h:]
    C = D[:, h:, h:]
    dot = lambda a, b: jax.lax.dot_general(
        a, b, ((( 2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        precision=_HI)
    dot_tn = lambda a, b: jax.lax.dot_general(     # a' b, contracting rows
        a, b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        precision=_HI)
    inv11 = pallas_spd_inverse_64p(A, lanes=lanes, interpret=interpret)
    W1 = dot(inv11, Bm)                            # A^{-1} B
    S = C - dot_tn(Bm, W1)                         # C - B' A^{-1} B
    invS = pallas_spd_inverse_64p(S, lanes=lanes, interpret=interpret)
    X12 = -dot(W1, invS)                           # -W S^{-1}
    X11 = inv11 - jax.lax.dot_general(             # inv11 + W S^{-1} W'
        X12, W1, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32, precision=_HI)
    top = jnp.concatenate([X11, X12], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(X12, -1, -2), invS], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pivot_fallback(D, *, lanes, interpret):
    return pallas_spd_inverse_unrolled(D, lanes=lanes, variant="v3",
                                       interpret=interpret)


@functools.partial(jax.jit, static_argnames=("lanes", "variant", "interpret"))
def pallas_spd_inverse_unrolled(D, *, lanes: int = 8, variant: str = "v3",
                                interpret: bool = False):
    """Batched (B, nb, nb) SPD inverse via the unrolled multi-lane sweep.

    nb must be a multiple of 128 (lane width); typically 128. Leading axes
    are all treated as batch (flattened internally). Returns f32.

    Variants, measured on chip at (3072, 128, 128), round 3 (the op is the
    factor path's wall — see benchmarks/pivot_inverse_probe.py, which also
    races XLA Cholesky 105 ms / LU 218 ms / blocked-Schur 83 ms /
    Newton-Schulz x24 68.8 ms):
      * "v3" (default): rank-3 layout, one fused (L, nb, nb) update per
        step — 37.7 ms. Lane count is flat (40.7 ms at lanes=32): the
        update is element-throughput-bound at ~330 GF/s (the rank-1
        column broadcast pattern), not latency-bound.
      * "ref": per-lane unrolled updates — 45.4 ms, kept as the
        plain-discipline reference implementation.
      * "value": 2D fused update with per-lane concatenations — 49.7 ms.
    """
    batch_shape, nb = D.shape[:-2], D.shape[-1]
    if D.shape[-2] != nb or nb % 128:
        raise ValueError(f"blocks must be (nb, nb) with nb % 128 == 0; got {D.shape}")
    B = 1
    for s in batch_shape:
        B *= s
    D = D.reshape((B, nb, nb))
    if B < 4:
        # Small batches don't amortize the kernel (and grid=1 pallas
        # interpret runs showed output-corruption anomalies); use the XLA
        # path.
        from .linalg import _spd_inverse_cholesky
        return _spd_inverse_cholesky(D.astype(jnp.float32)).reshape(
            batch_shape + (nb, nb))
    L = lanes
    # Keep grid >= 2: grid=1 interpret-mode runs returned corrupted lane-0
    # blocks for some inputs (root cause in the pallas interpreter's block
    # round-tripping, not the kernel — the identical unjitted call is
    # correct). A 2+ grid also overlaps DMA with compute.
    while B % L or B // L < 2:
        L //= 2
    f32 = jnp.float32
    flat = D.astype(f32).reshape(B * nb, nb)
    if variant == "value":
        kernel = functools.partial(_pivot_sweep_value_kernel, lanes=L, nb=nb)
        scratch = []
    elif variant == "v3":
        kernel = functools.partial(_pivot_sweep_v3_kernel, lanes=L, nb=nb)
        scratch = []
    elif variant == "panel":
        kernel = functools.partial(_pivot_sweep_panel_kernel, lanes=L, nb=nb)
        scratch = []
    elif variant.startswith("r") and variant[1:].isdigit():
        # Rank-q analytic composition ("r2", "r4", ...): 128/q fused full
        # passes per sweep (see _pivot_sweep_rq_kernel).
        q = int(variant[1:])
        if nb % q:
            raise ValueError(f"rank-q variant needs nb % q == 0; got {nb}, {q}")
        kernel = functools.partial(_pivot_sweep_rq_kernel, lanes=L, nb=nb, q=q)
        scratch = []
    else:
        kernel = functools.partial(_pivot_sweep_unrolled_kernel, lanes=L, nb=nb)
        scratch = [pltpu.VMEM((L * nb, nb), f32)]
    out = pl.pallas_call(
        kernel,
        grid=(B // L,),
        in_specs=[pl.BlockSpec((L * nb, nb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L * nb, nb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nb, nb), f32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(flat)
    return out.reshape(batch_shape + (nb, nb))


def spd_inverse_sweep_fused(M, pivot_inverse=None, nb: int = 128):
    """Flat blocked sweep with a ONE-matmul fused update per pivot block.

    The naive flat sweep (spd_inverse_sweep above) spends most of its time in
    three `.at[].set` full-array copies per step. This version assembles each
    step's result in ONE fused elementwise pass: the rank-nb update
    W - (C Dinv) R for the out-of-block entries, with the block row/col/diag
    (Dinv R, C Dinv, -Dinv) selected in via padded `where` branches that XLA
    fuses into the matmul epilogue. Every output entry comes from exactly one
    branch — no large-term cancellation (a boundary-modified single-matmul
    formulation was tried and loses ~2 f32 digits to cancellation on the
    swept row/col entries).
    """
    n = M.shape[-1]
    if pivot_inverse is None:
        pivot_inverse = pallas_spd_inverse_unrolled
    if n % nb:
        raise ValueError(f"n must be a multiple of {nb}; got {n}")
    dt = M.dtype
    idx = jnp.arange(n)
    W = M
    for k in range(n // nb):
        s = slice(k * nb, (k + 1) * nb)
        in_k = (idx >= k * nb) & (idx < (k + 1) * nb)
        row_m = in_k[:, None]            # (n, 1) -> broadcast over cols
        col_m = in_k[None, :]            # (1, n) -> broadcast over rows
        D = W[..., s, s]
        Dinv = pivot_inverse(D).astype(dt)
        C = W[..., :, s]                 # (B, n, nb)
        R = W[..., s, :]                 # (B, nb, n)
        CDinv = jnp.einsum("...ij,...jk->...ik", C, Dinv)
        DinvR = jnp.einsum("...ij,...jk->...ik", Dinv, R)
        upd = W - jnp.einsum("...ij,...jk->...ik", CDinv, R)
        # Padded-select assembly: XLA fuses the pads+wheres into the matmul
        # epilogue (a concatenate-based assembly was measured slower — the
        # concats materialize copies).
        pad_c = [(0, 0)] * (W.ndim - 2) + [(0, 0), (k * nb, n - (k + 1) * nb)]
        pad_r = [(0, 0)] * (W.ndim - 2) + [(k * nb, n - (k + 1) * nb), (0, 0)]
        pad_d = [(0, 0)] * (W.ndim - 2) + [(k * nb, n - (k + 1) * nb),
                                           (k * nb, n - (k + 1) * nb)]
        W = jnp.where(
            row_m & col_m, jnp.pad(-Dinv, pad_d),
            jnp.where(col_m, jnp.pad(CDinv, pad_c),
                      jnp.where(row_m, jnp.pad(DinvR, pad_r), upd)))
    return -W


def gj_solve_sweep(M, R, pivot_inverse=None, nb: int = 128):
    """Batched M^{-1} R via blocked Gauss-Jordan WITHOUT materializing M^{-1}.

    M: (*B, n, n) SPD, R: (*B, n, k) -> X with M X = R. One level per
    nb-sized pivot block; level j eliminates pivot-block columns from ALL
    rows (full Gauss-Jordan, so no sequential backward substitution — the
    same reason the inverse path uses the sweep), updating only the trailing
    pivot columns and the RHS block:

        Dinv = inv(W[s, s])                  (multi-lane Pallas pivot kernel)
        Y    = select(rows s -> Dinv @ Y[s], else Y - W[:, s] @ (Dinv @ Y[s]))
        W[:, s'] (s' > s) updated the same way.

    Versus inverse-then-multiply this skips the n^2 inverse columns entirely:
    for k <= n the MXU work is ~n^2(n/2 + k) vs n^3 + n^2 k macs. Numerics
    match the unpivoted sweep (fine for SPD). Used by the sigma-free-RHS
    direct backend (models/kkt.py) where only M^{-1}[A' q] is needed.
    """
    n = M.shape[-1]
    if pivot_inverse is None:
        pivot_inverse = pallas_spd_inverse_unrolled
    if n % nb:
        raise ValueError(f"n must be a multiple of {nb}; got {n}")
    # W holds only the not-yet-processed pivot columns (all n rows) and
    # SHRINKS by nb columns per level: processed columns are never read
    # again, and keeping them would force a full-matrix copy per level
    # (a column-slice .at[].set on (B, n, n) round-trips the whole array
    # through HBM — measured ~5 ms per level at (2048, 512, 512) f32).
    W = jnp.asarray(M)
    Y = jnp.asarray(R)
    dt = W.dtype
    idx = jnp.arange(n)
    for j in range(n // nb):
        s = slice(j * nb, (j + 1) * nb)
        in_j = (idx >= j * nb) & (idx < (j + 1) * nb)
        row_m = in_j[:, None]
        Dinv = pivot_inverse(W[..., s, :nb]).astype(dt)
        C = W[..., :, :nb]                                   # (B, n, nb)
        DinvYb = jnp.einsum("...ij,...jk->...ik", Dinv, Y[..., s, :])
        pad_y = [(0, 0)] * (Y.ndim - 2) + [(j * nb, n - (j + 1) * nb), (0, 0)]
        # Rows in s take the normalized pivot rows; others the elimination
        # update (in-s rows of the update cancel only in exact arithmetic).
        Y = jnp.where(
            row_m, jnp.pad(DinvYb, pad_y),
            Y - jnp.einsum("...ij,...jk->...ik", C, DinvYb))
        if (j + 1) * nb < n:
            DinvT = jnp.einsum("...ij,...jk->...ik", Dinv, W[..., s, nb:])
            pad_t = [(0, 0)] * (W.ndim - 2) + [(j * nb, n - (j + 1) * nb), (0, 0)]
            W = jnp.where(
                row_m, jnp.pad(DinvT, pad_t),
                W[..., :, nb:] - jnp.einsum("...ij,...jk->...ik", C, DinvT))
    return Y


def _normal_inverse_kernel(rho_ref, P_ref, A_ref, out_ref, W_ref,
                           *, sigma: float, n: int, m: int):
    f32 = jnp.float32
    rho = rho_ref[pl.program_id(0)]
    A = A_ref[0]
    # M = P + sigma*I + rho*A'A, built straight into the VMEM scratch.
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    AtA = jax.lax.dot_general(
        A, A, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=_HI)
    W_ref[:] = P_ref[0] + sigma * eye + rho * AtA

    # Static unroll over pivot blocks: offsets become compile-time constants,
    # so all big-slice reads/writes are static (no dynamic lane shifts).
    for k in range(n // NB):
        off = k * NB
        D = W_ref[off:off + NB, off:off + NB]
        Dinv = _sweep_inverse_block(D)
        C = W_ref[:, off:off + NB]                         # (n, NB) original
        R = W_ref[off:off + NB, :]                         # (NB, n) original
        CDinv = jax.lax.dot_general(
            C, Dinv, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI)
        DinvR = jax.lax.dot_general(
            Dinv, R, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI)
        W_ref[:] = W_ref[:] - jax.lax.dot_general(
            CDinv, R, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI)
        W_ref[:, off:off + NB] = CDinv
        W_ref[off:off + NB, :] = DinvR
        W_ref[off:off + NB, off:off + NB] = -Dinv
    out_ref[0] = -W_ref[:]


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def pallas_normal_inverse(P, A, rho, *, sigma: float, interpret: bool = False):
    """(P + sigma*I + rho*A'A)^{-1} per lane, fused in VMEM.

    P: (B, n, n), A: (B, m, n), rho: (B,). n, m multiples of 128.
    """
    B, n = P.shape[0], P.shape[-1]
    m = A.shape[-2]
    if n % NB or m % NB:
        raise ValueError(f"n, m must be multiples of {NB}; got {(n, m)}")
    f32 = jnp.float32
    kernel = functools.partial(_normal_inverse_kernel, sigma=sigma, n=n, m=m)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n, n), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, n), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, n), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, n), f32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, n), f32),
        interpret=interpret,
    )(rho.astype(f32), P.astype(f32), A.astype(f32))
    return out
