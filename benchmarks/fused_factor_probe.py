"""Probe: factor-path breakdown + the fused single-kernel factor (round 3).

    python benchmarks/fused_factor_probe.py [--batch 3072] [--n 512] [--m 256]

Measures, on the real chip:
  1. the shipped factor path (build einsum + gj_solve_sweep) and its pieces,
  2. the new fully-fused factor kernel (ops/fused_factor.py) at lanes {1, 2}
     x interleave {on, off},
  3. accuracy of each against a f64 host solve on a lane subsample.

HBM discipline: at B=3072, n=512 each (B, n, n) f32 array is 3 GB — phases
free their intermediates (del + sync) before the next allocates.
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


def time_fn(name, fn, *fnargs, reps=3):
    try:
        t0 = time.perf_counter()
        out = fn(*fnargs)
        hard_sync(out)
        log(f"  [{name}] first call (compile+run): {time.perf_counter()-t0:.1f}s")
        dt = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*fnargs)
            hard_sync(out)
            t = time.perf_counter() - t0
            dt = t if dt is None else min(dt, t)
        log(f"{name:36s}: {dt*1e3:8.1f} ms")
        return dt, out
    except Exception as e:
        log(f"{name:36s}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None, None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=3072)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--m", type=int, default=256)
    p.add_argument("--skip-breakdown", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quadraticprogramsolver_tpu.ops.fused_factor import fused_factor_solve
    from quadraticprogramsolver_tpu.ops.linalg import add_scaled_identity
    from quadraticprogramsolver_tpu.ops.spd_kernels import (
        gj_solve_sweep, pallas_spd_inverse_unrolled)

    B, n, m = args.batch, args.n, args.m
    log(f"device: {jax.devices()[0]}  B={B} n={n} m={m}")
    sigma = 1e-6
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_inputs(key):
        k1, k2, k3 = jax.random.split(key, 3)
        Mm = jax.random.normal(k1, (B, n, n), jnp.float32) * (
            jax.random.uniform(jax.random.fold_in(k1, 1), (B, n, n)) < 0.15)
        P = jnp.einsum("bki,bkj->bij", Mm, Mm,
                       precision="highest") + 1e-2 * jnp.eye(n, dtype=jnp.float32)
        A = jax.random.normal(k2, (B, m, n), jnp.float32) * (
            jax.random.uniform(jax.random.fold_in(k2, 1), (B, m, n)) < 0.15)
        q = jax.random.normal(k3, (B, n), jnp.float32)
        rho = jnp.full((B, m), 0.4, jnp.float32)
        return P, A, q, rho

    P, A, q, rho = make_inputs(key)
    hard_sync(P)
    log("inputs ready")

    k_rhs = m + 1  # [A' q]
    k_pad = -(-k_rhs // 128) * 128

    def build(P, A, rho):
        AtWA = jnp.einsum("...ki,...k,...kj->...ij", A, rho, A)
        return add_scaled_identity(P + AtWA, sigma)

    def current_path(P, A, q, rho):
        M = build(P, A, rho)
        At = jnp.swapaxes(A, -1, -2)
        R = jnp.concatenate([At, q[..., :, None]], axis=-1)
        Rp = jnp.pad(R, [(0, 0), (0, 0), (0, k_pad - k_rhs)])
        return gj_solve_sweep(M, Rp)[..., :k_rhs]

    nsub = 64
    with jax.default_matmul_precision("highest"):
        # --- phase 1: current path end-to-end; keep only a subsample.
        dt_cur, X_cur = time_fn(
            "current (build+gj_solve)", jax.jit(current_path), P, A, q, rho)
        X64 = np.asarray(X_cur[:nsub]) if X_cur is not None else None
        del X_cur

        # --- phase 2: fused in-place-slab variants (build kernel + one
        # in-place GJ level kernel per level; pivots in the multi-lane
        # sweep). Round 4: the build kernel assembles [A' q] in VMEM — R is
        # never in HBM at all (the old pack_rhs intermediate cost 2.4 GB at
        # B=3072 and made B=4096 impossible). at_via_dot probes the MXU
        # transpose fallback vs Mosaic's native 2-D transpose.
        # dot=high is a measured dead end: Mosaic rejects Precision.HIGH
        # inside kernels (NotImplementedError: Unsupported dot precision).
        for pivot_lanes, dprec, via_dot in (
                (8, "highest", False), (8, "highest", True),
                (16, "highest", False), (32, "highest", False)):
            name = (f"fused slab (pivot_lanes={pivot_lanes}, dot={dprec}"
                    f"{', at_via_dot' if via_dot else ''})")
            dt_f, Xf = time_fn(
                name,
                jax.jit(lambda P, A, q, rho, pl_=pivot_lanes, dp=dprec,
                        vd=via_dot:
                        fused_factor_solve(P, A, q, rho,
                                           sigma=sigma, pivot_lanes=pl_,
                                           dot_precision=dp, at_via_dot=vd)),
                P, A, q, rho)
            if Xf is not None and X64 is not None:
                d = np.abs(np.asarray(Xf[:nsub, :, :k_rhs]) - X64).max()
                log(f"    max|fused - current| ({nsub} lanes) = {d:.3e}")
            del Xf

        if not args.skip_breakdown:
            # --- phase 3: standalone pivot-kernel cost per level, on a
            # synthetic SPD block batch (slicing D out of a live (B, n, n) M
            # here OOMs HBM — M + P + A + sweep internals exceed 16 GB; the
            # kernel's cost does not depend on the values).
            kd = jax.random.PRNGKey(7)
            Dm = jax.random.normal(kd, (B, 128, 128), jnp.float32)
            D = jnp.einsum("bki,bkj->bij", Dm, Dm,
                           precision="highest") + 10.0 * jnp.eye(
                               128, dtype=jnp.float32)
            hard_sync(D)
            del Dm
            for lanes in (8, 16, 32):
                for variant in ("ref", "value"):
                    time_fn(
                        f"  pivot x1 level (lanes={lanes}, {variant})",
                        lambda D, lanes=lanes, v=variant:
                            pallas_spd_inverse_unrolled(D, lanes=lanes,
                                                        variant=v), D)
            del D

    # accuracy vs f64 host on a few lanes
    if X64 is not None:
        idx = np.array([0, 7, nsub - 1])
        Pn = np.asarray(P[idx], np.float64)
        An = np.asarray(A[idx], np.float64)
        qn = np.asarray(q[idx], np.float64)
        rn = np.asarray(rho[idx], np.float64)
        Mref = Pn + sigma * np.eye(n) + np.einsum("bki,bk,bkj->bij", An, rn, An)
        Rref = np.concatenate([np.swapaxes(An, 1, 2), qn[:, :, None]], axis=2)
        Xref = np.linalg.solve(Mref, Rref)
        cur = X64[idx]
        log(f"accuracy current vs f64: {np.abs(cur - Xref).max():.3e} "
            f"(scale {np.abs(Xref).max():.1e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
