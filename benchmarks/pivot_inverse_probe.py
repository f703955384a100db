"""Shootout: batched (B, 128, 128) SPD inverse — the factor path's new wall.

    python benchmarks/pivot_inverse_probe.py [--batch 3072]

Round-3 finding (fused_factor_probe): with the in-place slab kernels, the
GJ level updates + build run near roofline (~30 ms total at B=3072, n=512)
and the four pivot-inverse calls are ~186 of 213 ms — the multi-lane VPU
sweep runs at ~7% of VPU peak (46.5 ms/level vs a ~3 ms flop roofline, and
~0.5 ms of HBM traffic). This probe races every candidate for that op:

  1. the shipped Pallas multi-lane sweep (lanes 8),
  2. XLA Cholesky + cho_solve vs identity,
  3. XLA LU (jnp.linalg.inv),
  4. the recursive blocked-Schur inverse (ops/linalg.spd_inverse_blocked,
     all-MXU),
  5. Newton-Schulz iterations (all-MXU, quadratic once contracting) seeded
     by the Jacobi-scaled transpose init.

Accuracy is checked per candidate against a f64 host inverse on a lane
subsample — candidates must hit ~1e-5 relative to be usable (the pivot
inverse seeds every downstream GJ level).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def hard_sync(x) -> float:
    return float(np.asarray(x.ravel()[0]))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=3072)
    p.add_argument("--nb", type=int, default=128)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quadraticprogramsolver_tpu.ops.linalg import (
        _spd_inverse_cholesky,
        spd_inverse_blocked,
        sym,
    )
    from quadraticprogramsolver_tpu.ops.spd_kernels import (
        pallas_spd_inverse_unrolled,
        spd_inverse_128_schur,
    )

    B, nb = args.batch, args.nb
    log(f"device: {jax.devices()[0]}  B={B} nb={nb}")

    # Pivot-like blocks: gram + diagonal shift (the conditioning the GJ
    # levels actually see after the sigma/rho shifts).
    key = jax.random.PRNGKey(0)
    Dm = jax.random.normal(key, (B, nb, nb), jnp.float32)
    D = jnp.einsum("bki,bkj->bij", Dm, Dm, precision="highest") / nb \
        + 0.05 * jnp.eye(nb, dtype=jnp.float32)
    hard_sync(D)

    idx = np.array([0, B // 2, B - 1])
    Dref = np.linalg.inv(np.asarray(D[idx], np.float64))
    scale = np.abs(Dref).max()

    def newton_schulz(D, iters):
        # X0 = D' / (||D||_1 ||D||_inf) guarantees ||I - X0 D|| < 1; the
        # Jacobi pre-scale tightens the start for diagonally-dominant blocks.
        d = jnp.abs(D).sum(axis=-1).max(axis=-1)  # inf-norm (symmetric: =1-norm)
        X = jnp.swapaxes(D, -1, -2) / (d * d)[..., None, None]
        eye = jnp.eye(nb, dtype=D.dtype)
        for _ in range(iters):
            DX = jnp.einsum("bij,bjk->bik", D, X, precision="highest")
            X = jnp.einsum("bij,bjk->bik", X, 2.0 * eye - DX,
                           precision="highest")
        return X

    cands = [
        ("pallas sweep lanes=8",
         jax.jit(lambda D: pallas_spd_inverse_unrolled(D, lanes=8))),
    ] + [
        (f"pallas v3 lanes={L}",
         jax.jit(lambda D, L=L: pallas_spd_inverse_unrolled(
             D, lanes=L, variant="v3")))
        for L in (8, 32)
    ] + [
        # Round-4 rank-q analytic composition: 128/q fused full passes.
        # If the ~0.25 us/step pivot floor is per PASS (scheduler-bound,
        # the round-3 endgame hypothesis), rq divides it by q at the cost
        # of q*(q-1) tiny vector FMAs per group.
        (f"pallas r{q} lanes={L}",
         jax.jit(lambda D, L=L, q=q: pallas_spd_inverse_unrolled(
             D, lanes=L, variant=f"r{q}")))
        for q in (2, 4, 8) for L in (8,)
    ] + [
        (f"schur64 (2x paired-64 sweeps) lanes={L}",
         jax.jit(lambda D, L=L: spd_inverse_128_schur(D, lanes=L)))
        for L in (8, 16)
    ] + [
        ("xla cholesky+cho_solve", jax.jit(_spd_inverse_cholesky)),
        ("xla lu (linalg.inv)", jax.jit(jnp.linalg.inv)),
        ("blocked-Schur (MXU)", jax.jit(lambda D: spd_inverse_blocked(D))),
        ("newton-schulz x16 (MXU)", jax.jit(lambda D: newton_schulz(D, 16))),
        ("newton-schulz x24 (MXU)", jax.jit(lambda D: newton_schulz(D, 24))),
    ]
    with jax.default_matmul_precision("highest"):
        for name, fn in cands:
            try:
                t0 = time.perf_counter()
                out = fn(D)
                hard_sync(out)
                log(f"  [{name}] compile+run {time.perf_counter()-t0:.1f}s")
                dt = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    hard_sync(fn(D))
                    t = time.perf_counter() - t0
                    dt = t if dt is None else min(dt, t)
                err = np.abs(np.asarray(out[idx], np.float64) - Dref).max()
                log(f"{name:28s}: {dt*1e3:8.1f} ms   rel_err "
                    f"{err/scale:.2e}")
                del out
            except Exception as e:
                log(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:160]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
