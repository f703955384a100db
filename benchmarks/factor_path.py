"""Factor-path microbenchmark: normal-matrix build + SPD inverse on TPU.

    python benchmarks/factor_path.py [--batch 2048] [--n 512] [--m 256]

Compares the XLA recursive blocked-Schur inverse against the fused flat
sweep (Pallas multi-lane pivot kernel + one-matmul rank-128 updates,
ops/spd_kernels.spd_inverse_sweep_fused) — the two candidates for the
factor-path piece the headline bench is bottlenecked on (ROADMAP: ~46 ms
build + ~237 ms inverse of a 385 ms solve at B=2048, n=512). Reports each
inverse's accuracy via the residual ||I - M_inv M||_inf at "highest".

Round-2 measurements (TPU v5e, B=2048, n=512):
    pivot kernel (2048 lanes of 128x128):  42 ms wall (~15 ms on-chip)
    XLA blocked-Schur recursion:          235 ms
    fused sweep (ref pivot variant):      151 ms   <- shipped default
    fused sweep (value pivot variant):    160 ms
    bf16x2-split matmul variants: slower everywhere + accuracy loss
    (removed; see git history for the mm_split implementation).
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--m", type=int, default=256)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quadraticprogramsolver_tpu.ops.linalg import (
        add_scaled_identity, spd_inverse_blocked, sym)
    from quadraticprogramsolver_tpu.ops.spd_kernels import (
        pallas_spd_inverse_unrolled, spd_inverse_sweep_fused)

    B, n, m = args.batch, args.n, args.m
    log(f"device: {jax.devices()[0]}  B={B} n={n} m={m}")

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        Mm = jax.random.normal(k1, (B, n, n), jnp.float32) * (
            jax.random.uniform(jax.random.fold_in(k1, 1), (B, n, n)) < 0.15)
        P = jnp.einsum("bki,bkj->bij", Mm, Mm,
                       precision="highest") + 1e-2 * jnp.eye(n, dtype=jnp.float32)
        A = jax.random.normal(k2, (B, m, n), jnp.float32) * (
            jax.random.uniform(jax.random.fold_in(k2, 1), (B, m, n)) < 0.15)
        rho = jnp.full((B, m), 0.3, jnp.float32)
        return P, A, rho

    P, A, rho = make_inputs(key)
    hard_sync(P)

    def build(P, A, rho):
        AtWA = jnp.einsum("...ki,...k,...kj->...ij", A, rho, A)
        return add_scaled_identity(sym(P + AtWA), 1e-6)

    with jax.default_matmul_precision("highest"):
        fns = {
            "build": jax.jit(build),
            "inv_blocked": jax.jit(spd_inverse_blocked),
            "inv_sweep_ref": jax.jit(lambda M: spd_inverse_sweep_fused(
                M, functools.partial(pallas_spd_inverse_unrolled, variant="ref"))),
        }

        M = fns["build"](P, A, rho)
        hard_sync(M)

        results = {}
        for name, fn in fns.items():
            arg = (P, A, rho) if name == "build" else (M,)
            out = fn(*arg)
            hard_sync(out)  # compile + warm
            dt = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(*arg)
                hard_sync(out)
                t = time.perf_counter() - t0
                dt = t if dt is None else min(dt, t)
            results[name] = dt
            log(f"{name:14s}: {dt*1e3:8.1f} ms")

        @jax.jit
        def resid(Minv, M):
            R = jnp.einsum("bij,bjk->bik", Minv, M) - jnp.eye(n, dtype=jnp.float32)
            return jnp.max(jnp.abs(R))

        for name in ("inv_blocked", "inv_sweep_ref"):
            Minv = fns[name](M)
            r = float(np.asarray(resid(Minv, M)))
            log(f"{name:14s}: ||I - Minv M||_inf = {r:.3e}")

    log(f"factor total: blocked {1e3*(results['build']+results['inv_blocked']):.1f} ms"
        f" -> sweep {1e3*(results['build']+results['inv_sweep_ref']):.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
