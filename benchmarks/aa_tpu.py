"""TPU measurement: Anderson acceleration on the headline fleet configs.

Runs the bench.py fleet config (B=2048, n=512 random_qp, on-device
generation) and a slow-converging inequality fleet with anderson_memory in
{0, 8}, printing solve time and iteration profiles. Run on the real chip:

    python benchmarks/aa_tpu.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_config(label, qp, st):
    import quadraticprogramsolver_tpu as qps
    from bench import hard_sync

    batch = qp.q.shape[0]
    for mem in (0, 8):
        s = dataclasses.replace(st, anderson_memory=mem)
        sol = qps.solve_jit(qp, s)
        hard_sync(sol.x)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            sol = qps.solve_jit(qp, s)
            hard_sync(sol.x)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        iters = np.asarray(sol.info.iterations)
        status = np.asarray(sol.info.status)
        solved = int(((status == 2) | (status == 3)).sum())
        print(f"{label} mem={mem}: {best*1e3:.1f} ms, {solved/best:.0f} solves/s, "
              f"solved {solved}/{batch}, iters p50={int(np.median(iters))} "
              f"max={int(iters.max())}", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import quadraticprogramsolver_tpu as qps
    from bench import M, N, SEED, device_random_qp_fleet, hard_sync

    print("device:", jax.devices()[0].device_kind, flush=True)

    # 1. The exact bench.py config.
    bench_st = qps.Settings(max_iterations=2000, eps_abs=1e-4, eps_rel=1e-4,
                            rho=0.4, adaptive_rho=True, check_interval=13,
                            kkt_refinement_steps=0, fused_chunk=True)
    t0 = time.time()
    qp = device_random_qp_fleet(2048, N, M, SEED)
    hard_sync(qp.P)
    print(f"bench fleet generated in {time.time()-t0:.0f}s", flush=True)
    run_config("bench-config random_qp B=2048 n=512", qp, bench_st)
    del qp

    # 2. A slow-converging family (inequality_qp, m=2n fits the fused-chunk
    #    VMEM budget) where iteration counts dominate.
    t0 = time.time()
    fleet = qps.generate_batch(qps.ProblemClass.INEQUALITY_QP, 256, 128,
                               num_constraints=256, seed=0, dtype=np.float32)
    print(f"inequality fleet generated in {time.time()-t0:.0f}s", flush=True)
    slow_st = qps.Settings(max_iterations=4000, eps_abs=1e-4, eps_rel=1e-4,
                           rho=0.1, adaptive_rho=True, check_interval=25,
                           kkt_refinement_steps=0, fused_chunk=True)
    run_config("inequality_qp B=256 n=128", fleet, slow_st)


if __name__ == "__main__":
    main()
