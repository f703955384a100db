"""Headline benchmark: batched 500-var QPs solved per second per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "solves/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): >= 1000 batched 500-var QPs solved/sec/chip at 1e-4
accuracy. vs_baseline = value / 1000.

Protocol (diagnostics on stderr, never stdout):
  * fleet of B random_qp instances (n=500, m=250 — the OSQP-paper n/2 ratio)
    with the reference generator's distributions (GenerateQuadraticProgram.jl:10-36)
    synthesized *on device* (host generation of thousands of dense 500^2
    instances would dominate wall time; the distribution is identical)
  * solve with the Cholesky-normal-equations backend at eps=1e-4, adaptive
    rho — one jitted call per fleet, timed after a warmup compile
  * accuracy audit: a subsample is re-solved by the host f64 oracle; max
    |x - x_ref|_inf goes to stderr (target <= 1e-4, RunTests.jl discipline)
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


def device_random_qp_fleet(batch: int, n: int, m: int, seed: int):
    """On-device batched random_qp family (GenerateQuadraticProgram.jl:10-36):
    P = (M'M + 1e-2 I) with M ~ sparse(0.15) normal, q ~ N(0,1),
    A ~ sparse(0.15) normal, l = -U(0,1), u = U(0,1), then 15% of rows get
    l=u (equality) and 15% get u=1.0 (the reference's vI[vI] quirk)."""
    import jax
    import jax.numpy as jnp

    import quadraticprogramsolver_tpu as qps

    density, alpha = 0.15, 1e-2

    @jax.jit
    def build(key):
        ks = jax.random.split(key, 8)
        Mm = jax.random.normal(ks[0], (batch, n, n), jnp.float32)
        Mm = Mm * (jax.random.uniform(ks[1], (batch, n, n)) < density)
        with jax.default_matmul_precision("highest"):
            P = jnp.einsum("bki,bkj->bij", Mm, Mm) + alpha * jnp.eye(n)
        q = jax.random.normal(ks[2], (batch, n), jnp.float32)
        A = jax.random.normal(ks[3], (batch, m, n), jnp.float32)
        A = A * (jax.random.uniform(ks[4], (batch, m, n)) < density)
        l = -jax.random.uniform(ks[5], (batch, m))
        u = jax.random.uniform(ks[6], (batch, m))
        mask_eq = jax.random.uniform(ks[7], (batch, m)) <= 0.15
        l = jnp.where(mask_eq, u, l)
        key2 = jax.random.fold_in(key, 99)
        mask_u1 = jax.random.uniform(key2, (batch, m)) <= 0.15
        u = jnp.where(mask_u1, 1.0, u)
        return qps.QP(P=P, q=q, A=A, l=l, u=u)

    return build(jax.random.PRNGKey(seed))


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

    best = None
    for batch in (256, 1024, 2048):
        try:
            qp = device_random_qp_fleet(batch, N, M, SEED)
            jax.block_until_ready(qp.P)

            sol = qps.solve_jit(qp, settings)  # compile + warmup
            sol.x.block_until_ready()

            t0 = time.perf_counter()
            sol = qps.solve_jit(qp, settings)
            sol.x.block_until_ready()
            dt = time.perf_counter() - t0

            status = np.asarray(sol.info.status)
            iters = np.asarray(sol.info.iterations)
            solved = int((status >= 2).sum())
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
    for i in (0, batch // 2):
        ref = solve_qp_reference(
            np.asarray(qp.P[i], np.float64), np.asarray(qp.q[i], np.float64),
            np.asarray(qp.A[i], np.float64), np.asarray(qp.l[i], np.float64),
            np.asarray(qp.u[i], np.float64),
            eps_abs=1e-6, eps_rel=1e-6, rho=0.1, max_iterations=20000)
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
