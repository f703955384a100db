"""Headline benchmark: batched 500-var QPs solved per second per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "solves/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): >= 1000 batched 500-var QPs solved/sec/chip at 1e-4
accuracy. vs_baseline = value / 1000.

Protocol (diagnostics go to stderr, never stdout):
  * fleet of B random_qp instances (n=500, m=250 — the OSQP-paper n/2 ratio,
    GenerateQuadraticProgram.jl:28), float32, dense batched canonical form
  * solve with the Cholesky-normal-equations backend at eps=1e-4, adaptive
    rho — one jitted call per fleet, timed after a warmup compile
  * accuracy audit: a subsample is re-solved by the host f64 oracle and the
    max |x - x_ref|_inf is reported on stderr (target <= 1e-4, matching the
    RunTests.jl discipline at looser eps)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 1000.0
N = 500
M = 250
SEED = 1234


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax

    import quadraticprogramsolver_tpu as qps

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    settings = qps.Settings(
        max_iterations=2000,
        eps_abs=1e-4,
        eps_rel=1e-4,
        rho=0.1,
        adaptive_rho=True,
        check_interval=25,
    )

    # Pick the largest fleet that fits; throughput generally grows with B.
    best = None
    for batch in (256, 1024, 2048):
        try:
            qp = qps.generate_batch(
                qps.ProblemClass.RANDOM_QP, batch=batch, num_elements=N,
                num_constraints=M, seed=SEED, dtype=np.float32)
            qp = jax.device_put(qp, dev)

            sol = qps.solve_jit(qp, settings)  # compile + warmup
            sol.x.block_until_ready()

            t0 = time.perf_counter()
            sol = qps.solve_jit(qp, settings)
            sol.x.block_until_ready()
            dt = time.perf_counter() - t0

            status = np.asarray(sol.info.status)
            iters = np.asarray(sol.info.iterations)
            solved = (status >= 2).sum()
            rate = solved / dt
            log(
                f"B={batch}: {dt*1e3:.1f} ms, solved {solved}/{batch}, "
                f"iters p50={np.median(iters):.0f} max={iters.max()}, "
                f"{rate:.0f} solves/s")
            if best is None or rate > best[0]:
                best = (rate, batch, dt, sol, qp)
        except Exception as e:  # OOM at larger fleets is expected
            log(f"B={batch}: failed ({type(e).__name__}: {e})")
            break

    if best is None:
        log("no configuration ran")
        print(json.dumps({
            "metric": "batched 500-var QPs solved/sec/chip at 1e-4",
            "value": 0.0, "unit": "solves/sec/chip", "vs_baseline": 0.0}))
        return

    rate, batch, dt, sol, qp = best

    # Accuracy audit on a subsample vs the host f64 oracle.
    from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference

    x = np.asarray(sol.x)
    devs = []
    for i in range(0, batch, max(1, batch // 4)):
        P = np.asarray(qp.P[i], np.float64)
        ref = solve_qp_reference(
            P, np.asarray(qp.q[i], np.float64), np.asarray(qp.A[i], np.float64),
            np.asarray(qp.l[i], np.float64), np.asarray(qp.u[i], np.float64),
            eps_abs=1e-8, eps_rel=1e-8, rho=0.1, max_iterations=20000)
        if ref.status == 3:
            devs.append(np.abs(x[i] - ref.x).max())
    if devs:
        log(f"accuracy audit: max|x-x_ref|_inf over {len(devs)} samples = {max(devs):.2e}")

    print(json.dumps({
        "metric": "batched 500-var QPs solved/sec/chip at 1e-4",
        "value": round(float(rate), 2),
        "unit": "solves/sec/chip",
        "vs_baseline": round(float(rate) / BASELINE_SOLVES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
