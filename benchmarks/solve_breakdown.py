"""Headline-solve stage breakdown via differential timing.

    python benchmarks/solve_breakdown.py [--batch 2048] [--n 512] [--m 256]

Times the full bench.py solve at max_iterations in {0, 25, 50, 100} plus the
isolated factor stages. Differences isolate per-chunk cost (chunk kernel +
convergence check) from the setup (normal-matrix build + inverse + init
products) and the fixed dispatch/materialization overhead of the remote-TPU
relay (~27 ms per dispatch).
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


def timeit(fn, *args, reps=3):
    out = fn(*args)
    hard_sync(out if hasattr(out, "ravel") else out[0])
    dt = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out if hasattr(out, "ravel") else out[0])
        t = time.perf_counter() - t0
        dt = t if dt is None else min(dt, t)
    return dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--m", type=int, default=256)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import quadraticprogramsolver_tpu as qps
    from bench import device_random_qp_fleet
    from quadraticprogramsolver_tpu.models import kkt

    B, n, m = args.batch, args.n, args.m
    log(f"device: {jax.devices()[0]}  B={B} n={n} m={m}")

    qp = device_random_qp_fleet(B, n, m, 1234)
    hard_sync(qp.P)

    base = qps.Settings(
        max_iterations=2000, eps_abs=1e-4, eps_rel=1e-4, rho=0.3,
        adaptive_rho=True, check_interval=25, kkt_refinement_steps=0,
        fused_chunk=True)

    # Isolated factor stages (what backend.init does internally).
    import jax.numpy as jnp

    rho = jnp.full((B,), 0.3, jnp.float32)
    sigma = jnp.asarray(base.sigma_for(jnp.float32), jnp.float32)

    with jax.default_matmul_precision(base.matmul_precision):
        init_jit = jax.jit(
            lambda qp, rho: kkt.cholesky_init(qp, rho, sigma, base))
        cache = init_jit(qp, rho)
        t_init = timeit(lambda: init_jit(qp, rho)["M_inv"])
        log(f"backend.init (build+inverse):        {t_init*1e3:8.1f} ms")

    def solve_at(iters, label, **kw):
        st = dataclasses.replace(base, max_iterations=iters, **kw)
        t = timeit(lambda: qps.solve_jit(qp, st).x)
        log(f"solve max_iterations={iters:<4d}{label:24s}{t*1e3:8.1f} ms")
        return t

    force = dict(eps_abs=1e-12, eps_rel=1e-12, adaptive_rho=False)
    t25f = solve_at(25, " (forced 1 chunk)", **force)
    t25f_nc = solve_at(25, " (forced, no certs)", check_infeasibility=False,
                       **force)
    t50f = solve_at(50, " (forced 2 chunks)", **force)
    t100f = solve_at(100, " (forced 4 chunks)", **force)
    t100a = solve_at(100, " (forced, adaptive)", eps_abs=1e-12, eps_rel=1e-12)
    t_real = solve_at(2000, " (real bench config)")

    log("")
    marginal = (t100f - t50f) / 2
    setup = t50f - 2 * marginal
    log(f"chunk+check steady ((t100-t50)/2):    {marginal*1e3:8.1f} ms")
    log(f"setup+final+dispatch (t50 - 2*marg):  {setup*1e3:8.1f} ms")
    log(f"  of which factor (init):             {t_init*1e3:8.1f} ms")
    log(f"  non-factor overhead:                {(setup-t_init)*1e3:8.1f} ms")
    log(f"certificates cost at 1 chunk:         {(t25f-t25f_nc)*1e3:8.1f} ms")
    log(f"adaptive-rho surcharge at 4 chunks:   {(t100a-t100f)*1e3:8.1f} ms")
    log(f"real-config solve:                    {t_real*1e3:8.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
