"""Probe: row-routed SpMV — tall lane-shuffles + one-hot MXU block-sum.

    python benchmarks/row_routed_probe.py [--n 100000]

ROUND-4 FINAL VERDICT — the fill math closes the routing question:
packing the real n=1e5 matrix produced R=520,812 rows = 66.7x nnz in
slots (78.5x after layer padding). The reason is structural, not a
packing defect: a (128-wide source window x 128-row output block) cell at
this density (~1e-4) holds ~1.6 nnz against >= 128 routed slots, so ANY
128-lane-granular routing format has ~1-2% fill — and with the tall
shuffle measured at <= 0.27 ns/slot, 67-86M slots cost 17-22 ms: exactly
BCOO's 17.1 ms. Corollary: the gather-based BCOO matvec is ALREADY at
this hardware's lane-granular data-movement floor for uniform-random
sparsity ("9-14 ns per nnz" is really ~100 wasted slots/nnz at
~0.1-0.25 ns/slot). Routing wins only when sparsity is BLOCK-CLUSTERED
(banded, FEM-like patterns with >= 128 nnz per cell): fill -> 1 gives
~0.3-0.5 ns/nnz, a 30-50x matvec. Revisit this probe for such workloads;
for BASELINE config 4 (uniform random), the 22.2 s BCOO solve stands as
the honest floor. (The probe's kernel also needs a win_per_step >= 8
X-block to satisfy Mosaic's sublane divisibility — unfixed, since the
slot count already decides the outcome.)

Second-generation routing design (round 4), built on two measured facts
from benchmarks/routed_spmv_probe.py:
  * tall SAME-WIDTH (R, 128) take_along_axis shuffles cost <= 0.27 ns/slot
    (G=1024 tall micro — still relay-floored, i.e. effectively free), while
    anything wider than 128 lanes crashes the Mosaic compiler;
  * the first-generation (block, chunk)-tile packing could not beat the
    gather because assembling each tile's SOURCE from a 12544-wide x
    needed exactly the wide shuffle that crashes.

This design never assembles sources at all:

  1. x lives as the grid X[a, l] = x[a*128 + l]  ((n/128, 128), 400 KB).
  2. Every nnz (r, c) belongs to a ROW (a, b, t): source window a = c//128,
     output block b = r//128, layer t (collision counter). Rows are grouped
     BY SOURCE WINDOW, so the shuffle source is just X's rows broadcast
     layer-many times — a reshape/broadcast, no data-dependent movement.
  3. One tall (R, 128) take_along_axis routes each nnz's value x[c] to its
     OUTPUT lane k = r%128; multiply by the nnz values V.
  4. Rows are summed into their output blocks by a ONE-HOT matmul on the
     MXU: y_blocks = Ssum @ Routed with Ssum (n_blocks, R) in {0,1}. The
     products are split hi/lo into two bf16 passes (bf16 one-hot entries
     are exact; the split recovers ~f32 accuracy) because this backend's
     f32-HIGHEST 6-pass matmul would cost more than the whole pipeline.

Slot count = R * 128 where R ~ #nonempty (source-window, output-block)
pairs padded per-window — ~16x nnz at n=1e5 density (vs 86x for the
first-generation tiles): the fill is set by nnz per (a, b) pair, and the
probe prints it.

Measures end-to-end matvec vs XLA BCOO/ELL with exact checks vs scipy.
Ref: /root/reference/SolveQuadraticProgram.m:249-250 (the PCG matvec).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def hard_sync(x) -> float:
    return float(np.asarray(x.ravel()[0]))


def pack_row_routed(Acsr):
    """Pack a scipy CSR matrix into row-routed form.

    Returns (idx, V, a_of_row, Ssum_cols, R, L_max, n_win, n_blk):
      * rows are (window a, layer j) pairs, laid out a-major so the shuffle
        source is X broadcast L_max times per window;
      * idx/V: (n_win * L_max, 128) int32/f32 — lane k of row (a, j) holds
        the source lane l and value of the nnz routed there (V=0 empty);
      * b_of_row: (n_win * L_max,) int32 output block of each row
        (arbitrary for all-empty rows).
    Within one window, the nnz of ONE (a, b) pair occupy one layer each
    per output-lane collision; layers are assigned greedily per (a, b).
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(Acsr)
    m, n = A.shape
    n_blk = -(-m // 128)
    n_win = -(-n // 128)
    r_idx = np.repeat(np.arange(m), np.diff(A.indptr))
    c_idx = A.indices
    a_arr = c_idx // 128
    l_arr = c_idx % 128
    b_arr = r_idx // 128
    k_arr = r_idx % 128

    # Layer within (a, b): occurrence index per (a, b, k) gives collision
    # layers; the row id is (a, b, layer) — enumerate rows per window.
    key_abk = ((a_arr.astype(np.int64) * n_blk + b_arr) * 128 + k_arr)
    order = np.argsort(key_abk, kind="stable")
    ks = key_abk[order]
    first = np.r_[True, ks[1:] != ks[:-1]]
    gs = np.maximum.accumulate(np.where(first, np.arange(len(ks)), 0))
    occ = np.arange(len(ks)) - gs                       # layer within (a,b,k)
    # Row key = (a, b, layer): map each to a dense per-window row index.
    ab_layer = ((a_arr[order].astype(np.int64) * n_blk + b_arr[order])
                * 64 + occ)
    uniq, row_of = np.unique(ab_layer, return_inverse=True)
    # Per-window row counts -> L_max and a-major row ids.
    a_of_uniq = (uniq // 64) // n_blk
    b_of_uniq = (uniq // 64) % n_blk
    counts = np.bincount(a_of_uniq, minlength=n_win)
    L_max = int(counts.max()) if counts.size else 1
    # slot index of each unique row within its window (0..count-1)
    slot = np.zeros(len(uniq), np.int64)
    start = 0
    for a in range(n_win):
        c = counts[a]
        slot[start:start + c] = np.arange(c)
        start += c
    row_id_of_uniq = a_of_uniq * L_max + slot
    R = n_win * L_max
    idx = np.zeros((R, 128), np.int32)
    V = np.zeros((R, 128), np.float32)
    rows_full = row_id_of_uniq[row_of]                  # per sorted nnz
    idx[rows_full, k_arr[order]] = l_arr[order]
    V[rows_full, k_arr[order]] = A.data[order]
    b_of_row = np.zeros(R, np.int32)
    b_of_row[row_id_of_uniq] = b_of_uniq
    return idx, V, b_of_row, R, L_max, n_win, n_blk


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--chain", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quadraticprogramsolver_tpu.core.sparse_problem import _to_ell
    from quadraticprogramsolver_tpu.problems.generator import (
        generate_large_sparse_qp,
    )

    log(f"device: {jax.devices()[0]}")
    n = args.n
    data = generate_large_sparse_qp(n, seed=0)
    Pcsr = data.P.tocsr()
    nnz = Pcsr.nnz
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(n).astype(np.float32)
    y_ref = Pcsr @ x_np.astype(np.float64)
    log(f"P: {n}x{n}, nnz={nnz}")

    t0 = time.perf_counter()
    idx, V, b_of_row, R, L_max, n_win, n_blk = pack_row_routed(Pcsr)
    slots = R * 128
    log(f"packed in {time.perf_counter()-t0:.1f}s: R={R} rows "
        f"(L_max={L_max}/window), slots={slots/1e6:.1f}M "
        f"({slots/nnz:.1f}x nnz), idx+V bytes={(idx.nbytes+V.nbytes)/1e6:.0f}MB")

    idx_j = jnp.asarray(idx)
    V_j = jnp.asarray(V)
    # One-hot block-sum matrix, bf16 (exact for 0/1 entries).
    Ssum = np.zeros((n_blk, R), np.float32)
    Ssum[b_of_row, np.arange(R)] = 1.0
    # Empty rows carry V=0 so their (arbitrary) block assignment is inert.
    Ssum_j = jnp.asarray(Ssum, jnp.bfloat16)
    log(f"Ssum: {n_blk}x{R} bf16 = {Ssum_j.size * 2 / 1e6:.0f}MB")

    n_pad = n_win * 128

    # --- Pallas kernel: broadcast-source tall shuffle + V multiply.
    GR = 1568  # rows per grid step (multiple of L_max granularity not needed)

    R_pad = -(-R // GR) * GR
    if R_pad != R:
        idx_j = jnp.pad(idx_j, [(0, R_pad - R), (0, 0)])
        V_j = jnp.pad(V_j, [(0, R_pad - R), (0, 0)])
        Ssum_j = jnp.pad(Ssum_j, [(0, 0), (0, R_pad - R)])

    # Row -> window map is a-major: window(row) = row // L_max. Inside the
    # kernel the source block is assembled by broadcasting each X row
    # across its layers — X stays VMEM-resident, rows are selected by a
    # STATIC reshape pattern only when L_max divides GR... general case:
    # compute source row content as X[row // L_max] via a one-hot matmul
    # in-kernel would defeat the point, so instead the HOST pre-broadcasts
    # nothing and the kernel uses the fact that consecutive GR rows span
    # GR // L_max whole windows when L_max | GR. We pad L_max to a
    # divisor-friendly value instead.
    def route_kernel(X_ref, idx_ref, V_ref, o_ref, *, L):
        Xw = X_ref[...]                      # (GR // L, 128) windows chunk
        src = jnp.repeat(Xw, L, axis=0)      # (GR, 128) broadcast layers
        g = jnp.take_along_axis(src, idx_ref[...], axis=1)
        o_ref[...] = V_ref[...] * g

    # Make L_max divide GR by padding layers per window.
    L_pad = L_max
    while GR % L_pad:
        L_pad += 1
    if L_pad != L_max:
        # Repack rows at L_pad spacing (pad layers with zeros).
        idx2 = np.zeros((n_win * L_pad, 128), np.int32)
        V2 = np.zeros((n_win * L_pad, 128), np.float32)
        b2 = np.zeros(n_win * L_pad, np.int32)
        old = np.arange(n_win * L_max)
        new = (old // L_max) * L_pad + (old % L_max)
        idx2[new] = idx
        V2[new] = V
        b2[new] = b_of_row
        R2 = n_win * L_pad
        R_pad = -(-R2 // GR) * GR
        idx_j = jnp.asarray(np.pad(idx2, [(0, R_pad - R2), (0, 0)]))
        V_j = jnp.asarray(np.pad(V2, [(0, R_pad - R2), (0, 0)]))
        Ssum = np.zeros((n_blk, R_pad), np.float32)
        Ssum[b2, np.arange(R2)] = 1.0
        Ssum_j = jnp.asarray(Ssum, jnp.bfloat16)
        log(f"layer-padded L {L_max} -> {L_pad}: R={R_pad} "
            f"({R_pad * 128 / nnz:.1f}x nnz), Ssum {Ssum_j.size*2/1e6:.0f}MB")
    win_per_step = GR // L_pad

    @jax.jit
    def routed(v_flat):
        X = jnp.pad(v_flat[:n], (0, n_pad - n)).reshape(n_win, 128)
        Xp = jnp.pad(X, [(0, (-(-idx_j.shape[0] // GR) * win_per_step)
                         - n_win), (0, 0)])
        routed_rows = pl.pallas_call(
            functools.partial(route_kernel, L=L_pad),
            grid=(idx_j.shape[0] // GR,),
            in_specs=[
                pl.BlockSpec((win_per_step, 128), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GR, 128), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GR, 128), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((GR, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((idx_j.shape[0], 128),
                                           jnp.float32),
        )(Xp, idx_j, V_j)
        # Block-sum on the MXU: bf16 hi/lo split recovers ~f32 accuracy
        # (one-hot Ssum entries are bf16-exact; accumulation is f32).
        hi = routed_rows.astype(jnp.bfloat16)
        lo = (routed_rows - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y_blk = (jax.lax.dot_general(
                     Ssum_j, hi, (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(
                     Ssum_j, lo, (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32))
        return y_blk.reshape(-1)[: Pcsr.shape[0]]

    # Baselines.
    vals_np, cols_np = _to_ell(Pcsr, np.float32)
    vals_j = jnp.asarray(vals_np)
    cols_j = jnp.asarray(cols_np)
    x_pad = jnp.asarray(np.pad(x_np, (0, n_pad - n)))

    from jax.experimental import sparse as jsparse

    Pb = jsparse.BCOO.from_scipy_sparse(Pcsr)

    def time_chained(name, fn, x0):
        @jax.jit
        def chained(v):
            w = v
            out = None
            for _ in range(args.chain):
                out = fn(w)
                w = jnp.zeros_like(v).at[: out.shape[0]].set(out)[: v.shape[0]]
            return out

        try:
            t0 = time.perf_counter()
            out = chained(x0)
            hard_sync(out)
            comp = time.perf_counter() - t0
            dt = None
            for _ in range(3):
                t0 = time.perf_counter()
                hard_sync(chained(x0))
                t = time.perf_counter() - t0
                dt = t if dt is None else min(dt, t)
            dt /= args.chain
            log(f"{name:24s}: {dt*1e3:8.2f} ms/matvec "
                f"({dt/nnz*1e9:5.1f} ns/nnz, compile {comp:.0f}s)")
            return dt, np.asarray(out)
        except Exception as e:
            log(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None, None

    time_chained("xla ell",
                 lambda v: jnp.sum(vals_j * v[cols_j], axis=-1), x_pad)
    time_chained("xla bcoo", lambda v: Pb @ v[:n], x_pad)
    dt_r, _ = time_chained("row-routed", routed, x_pad)

    # Exact check, single matvec.
    got = np.asarray(jax.jit(routed)(x_pad))
    scale = np.abs(y_ref).max()
    err = np.abs(got - y_ref).max() / scale
    log(f"exact: max|routed - scipy|/scale = {err:.2e} "
        f"(bf16x2 block-sum; bar ~1e-6)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
