"""Factor-precision sweep: trade factor matmul passes for in-kernel refinement.

    python benchmarks/factor_precision.py [--batch 2048]

The normal-matrix build + SPD inverse at "highest" (6 bf16 MXU passes) is the
dominant setup cost of the headline solve (~179 ms of ~295 at B=2048/n=512).
With Settings.factor_precision="default" (one pass) the cached M^{-1} becomes
an approximate inverse; kkt_refinement_steps>=1 restores solve accuracy
because the refinement residual uses the true M (P, A at in-kernel HIGHEST).
This sweep measures throughput + oracle accuracy for the candidate configs.
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
    p.add_argument("--batch", type=int, default=2048)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import quadraticprogramsolver_tpu as qps
    from bench import N, M, SEED, device_random_qp_fleet
    from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference

    B = args.batch
    log(f"device: {jax.devices()[0]}  B={B} n={N} m={M}")
    qp = device_random_qp_fleet(B, N, M, SEED)
    hard_sync(qp.P)

    base = qps.Settings(
        max_iterations=2000, eps_abs=1e-4, eps_rel=1e-4, rho=0.3,
        adaptive_rho=True, check_interval=25, kkt_refinement_steps=0,
        fused_chunk=True)

    configs = [
        ("highest refine=0 (shipped)", dict()),
        ("default refine=1", dict(factor_precision="default",
                                  kkt_refinement_steps=1)),
        ("default refine=2", dict(factor_precision="default",
                                  kkt_refinement_steps=2)),
        # ("high" bf16x3 omitted: measured pathologically slow on this
        # backend — see ROADMAP "Platform issues".)
    ]

    for name, kw in configs:
        st = dataclasses.replace(base, **kw)
        try:
            sol = qps.solve_jit(qp, st)
            hard_sync(sol.x)
            dt = None
            for _ in range(3):
                t0 = time.perf_counter()
                sol = qps.solve_jit(qp, st)
                hard_sync(sol.x)
                t = time.perf_counter() - t0
                dt = t if dt is None else min(dt, t)
        except Exception as e:
            log(f"{name:28s}: FAILED {type(e).__name__}: {e}")
            continue
        status = np.asarray(sol.info.status)
        iters = np.asarray(sol.info.iterations)
        solved = int(((status == 2) | (status == 3)).sum())
        x = np.asarray(sol.x)
        conv = np.where((status == 2) | (status == 3))[0]
        worst = conv[np.argsort(iters[conv])[-8:]]
        spread = conv[:: max(1, len(conv) // 8)][:8]
        devs = []
        for i in sorted(set(worst.tolist()) | set(spread.tolist())):
            ref = solve_qp_reference(
                np.asarray(qp.P[i], np.float64), np.asarray(qp.q[i], np.float64),
                np.asarray(qp.A[i], np.float64), np.asarray(qp.l[i], np.float64),
                np.asarray(qp.u[i], np.float64),
                eps_abs=1e-6, eps_rel=1e-6, rho=0.1, max_iterations=20000)
            if ref.status == 3:
                devs.append(np.abs(x[i] - ref.x).max())
        log(f"{name:28s}: {dt*1e3:7.1f} ms, {solved}/{B} solved, "
            f"p50={np.median(iters):.0f} max={iters.max()}, "
            f"{solved/dt:7.0f} solves/s, audit {max(devs):.2e} ({len(devs)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
