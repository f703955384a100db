"""Large sparse QP via matrix-free PCG — BASELINE.md config 4 (n=1e5 scale).

    python benchmarks/large_sparse.py [--n 100000]

Solves one n-variable sparse QP (ELL-format SparseQP — gather-based matvecs,
never materializing the normal matrix; BCOO is ~1000x slower on this TPU
backend) with the matrix-free Jacobi-PCG KKT backend under the ADMM core,
then verifies KKT optimality host-side and prints timing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--eps", type=float, default=1e-4)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--no-scaling", action="store_true",
                   help="skip the host-side Ruiz pre-scaling")
    p.add_argument("--cg-rel", type=float, default=1e-4,
                   help="relative inner CG tolerance (0 = fixed abstol)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import quadraticprogramsolver_tpu as qps
    from quadraticprogramsolver_tpu.problems.generator import generate_large_sparse_qp
    from quadraticprogramsolver_tpu.utils.oracle import kkt_optimality

    t0 = time.perf_counter()
    data = generate_large_sparse_qp(args.n, seed=0)
    print(f"generated n={args.n} m={data.m} nnz(P)={data.P.nnz} "
          f"nnz(A)={data.A.nnz} in {time.perf_counter()-t0:.1f}s "
          f"(device {jax.devices()[0]})")

    scaling = None
    if not args.no_scaling:
        # Host-side Ruiz pre-scaling (OSQP §5.1): the ELL container stores
        # the scaled problem; termination still runs on unscaled residuals
        # (solve(scaling=...)). On badly-scaled sparse instances this cuts
        # iterations by orders of magnitude (tests/test_scaling.py).
        from quadraticprogramsolver_tpu.models.scaling import (
            equilibrate_sparse_host)

        t0 = time.perf_counter()
        Ps, qs, As, ls, us, scaling = equilibrate_sparse_host(
            data.P, data.q, data.A, data.l, data.u, 10)
        print(f"ruiz pre-scaling (10 sweeps) in {time.perf_counter()-t0:.1f}s")
        sqp = qps.make_sparse_qp(Ps, qs, As, ls, us, dtype=np.float32)
    else:
        sqp = qps.make_sparse_qp(data.P, data.q, data.A, data.l, data.u,
                                 dtype=np.float32)
    st = qps.Settings(max_iterations=args.iters, eps_abs=args.eps,
                      eps_rel=args.eps, rho=0.1, adaptive_rho=True,
                      cg_eps=1e-6, cg_max_iterations=200,
                      cg_rel_eps=args.cg_rel)

    from quadraticprogramsolver_tpu.models.admm import solve_segmented

    # Segmented: bounded device programs (the remote worker faults on
    # multi-minute single programs). At n=1e5 any adaptive-rho program
    # faults/hangs the worker outright (bisected: rho-static identical
    # program is stable), so rho adaptation runs on the HOST between
    # segments — same candidate + hysteresis rule at segment cadence.
    kw = dict(segment_iterations=100, host_rho_adaptation=args.n >= 100_000,
              scaling=scaling)
    sol = solve_segmented(sqp, st, **kw)
    float(np.asarray(sol.x.ravel()[0]))
    times = []
    for _ in range(1):
        t0 = time.perf_counter()
        sol = solve_segmented(sqp, st, **kw)
        float(np.asarray(sol.x.ravel()[0]))
        times.append(time.perf_counter() - t0)
    print(f"solve: {min(times)*1e3:.0f} ms, status "
          f"{qps.Status(int(sol.info.status)).name}, "
          f"iterations {int(sol.info.iterations)}, "
          f"res_prim {float(sol.info.res_prim):.2e}, "
          f"res_dual {float(sol.info.res_dual):.2e}")

    rep = kkt_optimality(data.P, data.q, data.A, data.l, data.u,
                         np.asarray(sol.x), np.asarray(sol.z),
                         np.asarray(sol.y))
    print(f"KKT: prim {rep.res_prim:.2e} dual {rep.res_dual:.2e} "
          f"comp {rep.res_comp:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
