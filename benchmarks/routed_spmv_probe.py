"""Probe: routing-based SpMV ("route-tile" format) vs gather-based BCOO/ELL.

    python benchmarks/routed_spmv_probe.py [--n 100000] [--s 8]

Round-3 conclusion (ROADMAP, sparse_budget.py + ell_kernel_probe.py): the
n=1e5 large-sparse solve is MATVEC-bound and XLA's gather costs ~9-14 ns
per gathered ELEMENT on this chip. Sub-15 s for BASELINE config 4 needs a
format whose per-nnz cost is a dense lane-shuffle SLOT, not a gather.

Route-tile format (VERDICT r3 next-round #4):

  * x lives VMEM-resident as X[s, j] = x[j*S + s]  (S sublane rows).
  * Output rows get one lane each, in groups of W lanes. A group owns T
    shuffle levels; level slot (s, l) holds at most ONE nnz (r, c) with
    r = the group's row at lane l and c%S = s, stored as its j = c//S
    index (idxJ) and value (V).
  * Kernel, per level:  g = take_along_axis(X, idxJ_t, axis=1)   (S, W)
                        acc += sum(V_t * g, axis=0)              (W,)
    i.e. one dynamic lane shuffle + one FMA + a cross-sublane reduction —
    the ROADMAP sketch's third routing step is absorbed by the reduction
    (the lane position within a row IS the output row).

ROUND-4 MEASURED PLATFORM VERDICT — blocked by the backend, twice over:

  1. Mosaic's gather lowering REQUIRES idx.shape == src.shape
     (lowering.py:2493 `assert indices_aval.shape == in_aval.shape + (1,)`)
     — take_along_axis is a same-width shuffle, it cannot select 128
     outputs from a 12544-wide row. The format above is still expressible
     by making every level FULL-WIDTH (one (S, W) shuffle serves W lanes =
     W output rows at once; slot count is unchanged), which is what this
     probe implements. But:
  2. Square shuffles wider than 128 lanes CRASH the remote Mosaic
     compiler: (8, 256) up to (8, 12544), (16, 6272), (32, 3136), and
     (128, 784) all die with `HTTP 500: tpu_compile_helper subprocess
     exit code 1` (not a clean NotImplementedError — a compiler fault).
     Only (S, 128) compiles and runs (verified, ~1e-7 exact).
  3. The 128-wide-only fallback — tiles keyed by (output-block, x-chunk)
     pairs so every source lies in one 128-lane window — explodes on
     random sparsity: with ~10 nnz/row spread over n/128 chunks, nearly
     every nnz lands in its own (block, chunk) pair (this probe prints
     the measured tile count; at n=1e5 it is ~0.9 tiles/nnz), so the
     shuffle processes ~1000 slots per useful nnz. Strictly worse than
     the gather it was meant to replace.

Until the backend accepts wide same-width shuffles (re-run this probe
after Mosaic updates — the micro section reports exactly which widths
compile), gather-based BCOO remains the best available SpMV on this
hardware, and the ~22 s config-4 floor stands.

Ref: /root/reference/SolveQuadraticProgram.m:249-250 (the PCG regime whose
matvec this is).
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


def pack_route_levels(Acsr, S: int, W: int):
    """Greedy packing of a scipy CSR matrix into full-width route levels.

    Output rows are assigned one lane each in groups of W lanes; level slot
    (g, t, s, l) holds the j-index/value of the nnz (r, c) with
    r = g*W + l, c = j*S + s — at most one per (g, t, s, l).
    Returns (idxJ, V, T, n_groups) with idxJ/V of shape (n_groups, T, S, W).
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(Acsr)
    m, n = A.shape
    ng = -(-m // W)
    r_idx = np.repeat(np.arange(m), np.diff(A.indptr))
    c_idx = A.indices
    g_arr = r_idx // W
    l_arr = r_idx % W
    s_arr = c_idx % S
    j_arr = c_idx // S
    key = (g_arr.astype(np.int64) * S + s_arr) * W + l_arr
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    first = np.r_[True, key_sorted[1:] != key_sorted[:-1]]
    group_start = np.maximum.accumulate(np.where(first, np.arange(len(key)), 0))
    occ = np.arange(len(key)) - group_start
    T = int(occ.max()) + 1 if len(occ) else 1
    idxJ = np.zeros((ng, T, S, W), np.int32)
    V = np.zeros((ng, T, S, W), np.float32)
    idxJ[g_arr[order], occ, s_arr[order], l_arr[order]] = j_arr[order]
    V[g_arr[order], occ, s_arr[order], l_arr[order]] = A.data[order]
    return idxJ, V, T, ng


def chunk_tile_census(Acsr, S: int):
    """Count the tiles a 128-wide-only routing would need: every tile is
    keyed by (output 128-row block, source 128-lane x-chunk) and holds at
    most one nnz per (c%S, r%128). Returns (n_tiles, nnz)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(Acsr)
    r_idx = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    c_idx = A.indices
    chunk = (c_idx // S) // 128          # which 128-lane window of X
    key = (r_idx.astype(np.int64) // 128) * 10**9 + chunk
    # Within one (block, chunk) pair, slot collisions on (c%S, r%128) add
    # tiles; count max multiplicity per (block, chunk, s, r%128).
    key2 = (key * S + (c_idx % S)) * 128 + (r_idx % 128)
    _, counts = np.unique(key2, return_counts=True)
    pairs, pair_max = np.unique(key, return_counts=False), None
    # tiles per (block, chunk) = max multiplicity over its slots
    order = np.argsort(key2, kind="stable")
    ks = key2[order]
    first = np.r_[True, ks[1:] != ks[:-1]]
    gs = np.maximum.accumulate(np.where(first, np.arange(len(ks)), 0))
    occ = np.arange(len(ks)) - gs
    pair_of_slot = key[order]
    # max occ per pair + 1:
    import collections
    tiles = {}
    for p, o in zip(pair_of_slot, occ):
        if tiles.get(p, -1) < o:
            tiles[p] = o
    n_tiles = int(sum(v + 1 for v in tiles.values()))
    return n_tiles, A.nnz


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--s", type=int, nargs="+", default=[8])
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--skip-micro", action="store_true")
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

    # ------------------------------------------------------------------
    # 1. Which same-width shuffles does the backend accept, and how fast?
    # ------------------------------------------------------------------
    if not args.skip_micro:
        log("\nsquare take_along_axis(axis=1) micro (idx.shape == src.shape"
            " — the only form Mosaic's gather lowering accepts):")
        # The G=64 tall row measures ~26 ms — the RELAY dispatch floor, an
        # upper bound only; G=1024 (103M slots, ~820 MB streamed) resolves
        # the true per-slot cost.
        for (S, W, G) in ((8, 128, 512), (32, 128, 512), (784, 128, 64),
                          (784, 128, 1024),
                          (8, 256, 96), (8, 1024, 96), (8, 12544, 8),
                          (16, 6272, 8)):
            X = jnp.asarray(rng.standard_normal((S, W)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, W, (G, S, W)).astype(np.int32))
            Vv = jnp.asarray(rng.standard_normal((G, S, W)).astype(np.float32))

            def kern(X_ref, idx_ref, V_ref, o_ref):
                g = jnp.take_along_axis(X_ref[...], idx_ref[0], axis=1)
                o_ref[0] = jnp.sum(V_ref[0] * g, axis=0, keepdims=True)

            @jax.jit
            def run(X, idx, Vv):
                return pl.pallas_call(
                    kern,
                    grid=(G,),
                    in_specs=[
                        pl.BlockSpec((S, W), lambda g: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, S, W), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, S, W), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, 1, W), lambda g: (g, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((G, 1, W), jnp.float32),
                )(X, idx, Vv)

            try:
                t0 = time.perf_counter()
                hard_sync(run(X, idx, Vv))
                comp = time.perf_counter() - t0
                dt = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    hard_sync(run(X, idx, Vv))
                    t = time.perf_counter() - t0
                    dt = t if dt is None else min(dt, t)
                slots = G * S * W
                hbm = idx.nbytes + Vv.nbytes
                got = np.asarray(run(X, idx, Vv))[0, 0]
                i0, v0 = np.asarray(idx[0]), np.asarray(Vv[0])
                want = (v0 * np.asarray(X)[np.arange(S)[:, None], i0]).sum(0)
                log(f"  S={S:<4} W={W:<6} G={G:<4}: {dt*1e3:7.2f} ms  "
                    f"{dt/slots*1e9:6.2f} ns/slot  "
                    f"({hbm/dt/1e9:5.0f} GB/s streamed; err "
                    f"{np.abs(got-want).max():.1e}; compile {comp:.0f}s)")
            except Exception as e:
                log(f"  S={S:<4} W={W:<6} G={G:<4}: FAILED "
                    f"{type(e).__name__}: {str(e)[:160]}")

    # ------------------------------------------------------------------
    # 2. Baselines: XLA ELL + BCOO
    # ------------------------------------------------------------------
    vals_np, cols_np = _to_ell(Pcsr, np.float32)
    vals_j = jnp.asarray(vals_np)
    cols_j = jnp.asarray(cols_np)
    n_pad = -(-n // 512) * 512
    x_pad = jnp.asarray(np.pad(x_np, (0, n_pad - n)))

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
            log(f"{name:28s}: {dt*1e3:8.2f} ms/matvec "
                f"({dt/nnz*1e9:5.1f} ns/nnz, compile {comp:.0f}s)")
            return dt, np.asarray(out)
        except Exception as e:
            log(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None, None

    time_chained("xla ell",
                 lambda v: jnp.sum(vals_j * v[cols_j], axis=-1), x_pad)

    from jax.experimental import sparse as jsparse

    Pb = jsparse.BCOO.from_scipy_sparse(Pcsr)
    time_chained("xla bcoo", lambda v: Pb @ v[:n], x_pad)

    # ------------------------------------------------------------------
    # 3. Routed matvec — full-width levels (compiles only if the backend
    #    accepts wide same-width shuffles; see module docstring #2).
    # ------------------------------------------------------------------
    for S in args.s:
        W = 12544 if n >= 12544 else -(-n // 128) * 128
        idxJ, V, T, ng = pack_route_levels(Pcsr, S, W)
        Wsrc = -(-(-(-n // S)) // 128) * 128  # X row width, lane-padded
        slots = ng * T * S * W
        log(f"\nrouted S={S} W={W}: T={T}, groups={ng}, "
            f"slots={slots/1e6:.1f}M, fill={nnz/slots:.1%}, "
            f"tiles bytes={(idxJ.nbytes + V.nbytes)/1e6:.0f}MB")
        if Wsrc != W:
            # Source row width must equal the shuffle width (same-shape
            # constraint) — pad X rows to W and clamp indices.
            Wsrc = W
        idxJ_j = jnp.asarray(np.minimum(idxJ, Wsrc - 1))
        V_j = jnp.asarray(V)

        def route_kernel(X_ref, idx_ref, V_ref, o_ref, *, T=T):
            X = X_ref[...]
            acc = jnp.zeros((1, X.shape[-1]), jnp.float32)
            for t in range(T):
                g = jnp.take_along_axis(X, idx_ref[0, t], axis=1)
                acc = acc + jnp.sum(V_ref[0, t] * g, axis=0, keepdims=True)
            o_ref[0] = acc

        @jax.jit
        def routed(v_flat, S=S, W=W, T=T, ng=ng, idxJ_j=idxJ_j, V_j=V_j):
            Xd = jnp.pad(v_flat[:n], (0, S * W - n)).reshape(W, S).T
            out = pl.pallas_call(
                functools.partial(route_kernel, T=T),
                grid=(ng,),
                in_specs=[
                    pl.BlockSpec((S, W), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, T, S, W), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, T, S, W), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ng, 1, W), jnp.float32),
            )(Xd, idxJ_j, V_j)
            return out.reshape(-1)[:n]

        dt_r, _ = time_chained(f"routed (S={S}, W={W}, T={T})", routed, x_pad)
        if dt_r is not None:
            got = np.asarray(jax.jit(routed)(x_pad))
            scale = np.abs(y_ref).max()
            log(f"  exact: max|routed - scipy|/scale = "
                f"{np.abs(got - y_ref).max()/scale:.2e}")

    # ------------------------------------------------------------------
    # 4. The 128-wide-only fallback's packing census (docstring #3).
    # ------------------------------------------------------------------
    for S in args.s:
        n_tiles, _ = chunk_tile_census(Pcsr, S)
        log(f"\n128-wide-only fallback, S={S}: {n_tiles} (block,chunk) "
            f"tiles for {nnz} nnz = {n_tiles/nnz:.2f} tiles/nnz; at "
            f"S*128 = {S*128} slots/tile the shuffles process "
            f"{n_tiles*S*128/nnz:.0f} slots per useful nnz — "
            f"strictly worse than the gather it replaces.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
