"""Probe: Pallas ELL matvec with the dense vector resident in VMEM.

    python benchmarks/ell_kernel_probe.py [--n 100000]

Round-3 finding (sparse_budget.py): the n=1e5 solve's wall is the sparse
matvec itself — XLA's gather-based ELL/BCOO matvecs run at ~20-40 ns/nnz,
~25-50x off HBM roofline, and each outer ADMM iteration spends ~6
matvec-equivalents. The dense operand x is only 400 KB at n=1e5 — it fits
VMEM whole — so a Pallas kernel that streams (vals, cols) row blocks while
keeping x resident should approach the stream bandwidth of the nnz data.

This probe measures (chained x16 inside one jit to bury the ~27 ms relay
dispatch):
  1. the shipped XLA ELL matvec (jnp.sum(vals * v[cols], axis=-1)),
  2. the Pallas row-block kernel at a few block sizes,
and checks exact agreement.
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

    data = generate_large_sparse_qp(args.n, seed=0)
    vals_np, cols_np = _to_ell(data.P.tocsr(), np.float32)
    rows, k = vals_np.shape
    n = args.n
    log(f"P: rows={rows} k={k} nnz={data.P.nnz} "
        f"(ELL fill {data.P.nnz / (rows * k):.2f}) on {jax.devices()[0]}")

    # Pad rows to a block multiple and n to a lane multiple.
    RB = 2048
    rows_pad = -(-rows // RB) * RB
    kp = -(-k // 128) * 128
    vals = np.zeros((rows_pad, kp), np.float32)
    cols = np.zeros((rows_pad, kp), np.int32)
    vals[:rows, :k] = vals_np
    cols[:rows, :k] = cols_np
    n_pad = -(-n // 512) * 512
    vals_j = jnp.asarray(vals)
    cols_j = jnp.asarray(cols)
    rng = np.random.default_rng(0)
    v = jnp.asarray(np.pad(rng.standard_normal(n).astype(np.float32),
                           (0, n_pad - n)))

    def xla_matvec(vals, cols, v):
        return jnp.sum(vals * v[cols], axis=-1)

    def kernel(vals_ref, cols_ref, v_ref, out_ref):
        x = v_ref[0]                                   # (n_pad,) resident
        g = x[cols_ref[...]]                           # (RB, kp) gather
        out_ref[...] = jnp.sum(vals_ref[...] * g, axis=-1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=("rb",))
    def pallas_matvec(vals, cols, v, rb=RB):
        return pl.pallas_call(
            kernel,
            grid=(rows_pad // rb,),
            in_specs=[
                pl.BlockSpec((rb, kp), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, kp), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, 1), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
        )(vals, cols, v[None, :])[:, 0]

    def time_chained(name, fn):
        @jax.jit
        def chained(v):
            out = v[:rows_pad] * 0.0
            w = v
            for _ in range(args.chain):
                out = fn(vals_j, cols_j, w)
                # feed back so the chain is dependent (pad back to n_pad)
                w = jnp.pad(out, (0, n_pad - rows_pad)) if rows_pad < n_pad \
                    else out[:n_pad]
            return out

        try:
            t0 = time.perf_counter()
            out = chained(v)
            hard_sync(out)
            log(f"  [{name}] compile+run {time.perf_counter()-t0:.1f}s")
            dt = None
            for _ in range(3):
                t0 = time.perf_counter()
                hard_sync(chained(v))
                t = time.perf_counter() - t0
                dt = t if dt is None else min(dt, t)
            dt /= args.chain
            log(f"{name:24s}: {dt*1e3:8.2f} ms/matvec "
                f"({dt / data.P.nnz * 1e9:.1f} ns/nnz)")
            return out
        except Exception as e:
            log(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None

    ref = time_chained("xla ell", xla_matvec)
    out = time_chained("pallas ell (RB=2048)", pallas_matvec)
    if ref is not None and out is not None:
        d = np.abs(np.asarray(ref) - np.asarray(out)).max()
        log(f"max |pallas - xla| = {d:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
