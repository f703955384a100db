"""ProxQP-family fleet throughput (second solver family, VERDICT item 7).

    python benchmarks/proxqp_fleet.py [--batch 512] [--n 512] [--rho ...]

Generates a fleet of random split-form QPs on device (dense P, A eq rows,
C ineq rows — the shape of ProxQP001.jl's demo, :65-100), solves with the
prox-ALM at eps 1e-4, reports solves/s plus a factor/iterate time split.
Diagnostics on stderr.
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


def hard_sync(x):
    return float(np.asarray(x.ravel()[0]))


def device_fleet(batch, n, me, mi, seed):
    import jax
    import jax.numpy as jnp

    import quadraticprogramsolver_tpu as qps

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def gen(key, batch, rows, cols):
        return jax.random.normal(key, (batch, rows, cols), jnp.float32)

    key = jax.random.PRNGKey(seed)
    M = gen(key, batch, n, n)

    @jax.jit
    def gram(M):
        return (jnp.einsum("bki,bkj->bij", M, M, precision="highest") / n
                + jnp.eye(M.shape[-1], dtype=jnp.float32))

    P = gram(M)
    A = gen(jax.random.fold_in(key, 1), batch, me, n)
    C = gen(jax.random.fold_in(key, 2), batch, mi, n)
    assert A.shape == (batch, me, n) and C.shape == (batch, mi, n)

    @jax.jit
    def vecs(key, A, C):
        xf = jax.random.normal(key, (batch, n), jnp.float32)
        q = jax.random.normal(jax.random.fold_in(key, 1), (batch, n), jnp.float32)
        b = jnp.einsum("bij,bj->bi", A, xf)
        d = jnp.einsum("bij,bj->bi", C, xf) + 1.0
        return q, b, d

    q, b, d = vecs(jax.random.fold_in(key, 3), A, C)
    from quadraticprogramsolver_tpu.core.problem import ProxQPProblem

    return ProxQPProblem(P=P, q=q, A=A, b=b, C=C, d=d)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--me", type=int, default=128)
    p.add_argument("--mi", type=int, default=128)
    p.add_argument("--rho", type=float, default=0.1)
    p.add_argument("--sweep-rho", action="store_true")
    p.add_argument("--refine", type=int, default=1)
    p.add_argument("--ci", type=int, default=50)
    p.add_argument("--no-adapt", action="store_true")
    p.add_argument("--eps", type=float, default=1e-4,
                   help="solver tolerance; the audit bar stays 1e-4 (tighten "
                        "eps below the bar to pass the audit at large B)")
    p.add_argument("--sigma-free", action="store_true",
                   help="exact-ALM column cache {Ga, Gc, g} instead of the "
                        "explicit M^{-1} (ProxQPSettings.sigma_free_rhs) — "
                        "the config that fits B=4096 in HBM; forces refine=0")
    p.add_argument("--lanes", type=int, default=1,
                   help="ProxQPSettings.chunk_lanes — lanes interleaved per "
                        "grid step of the fused chunk kernel")
    p.add_argument("--dot-high", action="store_true",
                   help="ProxQPSettings.chunk_dot_precision='high' — manual "
                        "3-pass bf16x3 iterate dots (needs --sigma-free; "
                        "pair with --lanes 2)")
    p.add_argument("--first-default", action="store_true",
                   help="first_chunk_dot_precision='default' — 1-pass bf16 "
                        "dots for the first chunk only (precision schedule)")
    p.add_argument("--headline", action="store_true",
                   help="the promoted round-5 headline stack in one flag: "
                        "B=4096 n=512, sigma-free, lanes=2, bf16x3 dots + "
                        "first-chunk schedule, static rho=0.0125, ci=25, "
                        "eps 5e-5 (12,887 solves/s, audit 4.2e-5)")
    args = p.parse_args(argv)
    if args.headline:
        args.batch, args.n = 4096, 512
        args.sigma_free = args.dot_high = args.first_default = True
        args.no_adapt = True
        args.lanes, args.rho, args.ci, args.eps = 2, 0.0125, 25, 5e-5
    if args.sigma_free:
        args.refine = 0

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import quadraticprogramsolver_tpu as qps
    from quadraticprogramsolver_tpu.models import proxqp

    on_tpu = jax.default_backend() == "tpu"
    log(f"device: {jax.devices()[0]}")
    prob = device_fleet(args.batch, args.n, args.me, args.mi, seed=0)
    hard_sync(prob.P)
    log(f"fleet B={args.batch} n={args.n} me={args.me} mi={args.mi} generated")

    rhos = (0.03, 0.1, 0.3, 1.0) if args.sweep_rho else (args.rho,)
    best = None
    for rho in rhos:
        st = qps.ProxQPSettings(
            max_iterations=2000, eps_abs=args.eps, eps_rel=args.eps, rho=rho,
            adaptive_rho=not args.no_adapt, kkt_warm_start=False,
            kkt_refinement_steps=args.refine, check_interval=args.ci,
            sigma_free_rhs=args.sigma_free,
            fused_chunk=on_tpu, chunk_lanes=args.lanes,
            chunk_dot_precision="high" if args.dot_high else "highest",
            first_chunk_dot_precision=("default" if args.first_default
                                       else None))
        sol = proxqp.solve_jit(prob, st)   # compile + warmup
        hard_sync(sol.x)
        dt = None
        for _ in range(3):
            t0 = time.perf_counter()
            sol = proxqp.solve_jit(prob, st)
            hard_sync(sol.x)
            t = time.perf_counter() - t0
            dt = t if dt is None else min(dt, t)
        conv = int(np.asarray(sol.info.converged).sum())
        iters = np.asarray(sol.info.iterations)
        log(f"rho={rho}: {dt*1e3:.0f} ms, {conv}/{args.batch} converged, "
            f"p50 iters {np.median(iters):.0f} max {iters.max()}, "
            f"{conv/dt:.0f} solves/s")
        if best is None or conv / dt > best[0]:
            best = (conv / dt, sol)
            best_rho = rho

    # Accuracy audit: re-solve a few lanes through the independent f64 oracle
    # on the lowered box form (equalities become l=u=b rows).
    from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference

    box = prob.to_box_qp()
    sol = best[1]
    x = np.asarray(sol.x)
    conv_mask = np.asarray(sol.info.converged)
    iters_all = np.asarray(sol.info.iterations)
    # Audit lanes: 4 evenly spaced + the 4 WORST-iteration converged lanes
    # (stragglers are where fleet configs hide inaccuracy — same discipline
    # as bench.py's 16-lane audit).
    spaced = np.linspace(0, args.batch - 1, 4).astype(int)
    conv_idx = np.nonzero(conv_mask)[0]
    worst = conv_idx[np.argsort(iters_all[conv_idx])[-4:]] if conv_idx.size else []
    lanes = sorted(set(spaced.tolist()) | set(np.asarray(worst).tolist()))
    devs = []
    y_all = np.asarray(sol.y)
    z_all = np.asarray(sol.z)
    s_all = np.asarray(sol.s)
    dev_rp = np.asarray(sol.info.res_prim)
    dev_rd = np.asarray(sol.info.res_dual)
    worst_true = (0.0, 0.0)  # (f64 res_prim, f64 res_dual) at audited lanes
    for i in lanes:
        if not conv_mask[i]:
            continue
        # True f64 KKT residuals of the RETURNED iterates vs the residuals
        # the DEVICE reported at exit: if the device number is honest, any
        # audit miss is a residual->solution conditioning gap (remedy:
        # tighten eps); if the device number is optimistic, the f32/bf16
        # check products are misreporting (a accuracy bug). Diagnostic for
        # the r4 adaptive-rho audit failure.
        P64 = np.asarray(prob.P[i], np.float64)
        A64 = np.asarray(prob.A[i], np.float64)
        C64 = np.asarray(prob.C[i], np.float64)
        xi = np.asarray(x[i], np.float64)
        rp64 = max(np.abs(A64 @ xi - np.asarray(prob.b[i], np.float64)).max(),
                   np.abs(C64 @ xi - np.asarray(prob.d[i], np.float64)
                          + np.asarray(s_all[i], np.float64)).max())
        rd64 = np.abs(P64 @ xi + np.asarray(prob.q[i], np.float64)
                      + A64.T @ np.asarray(y_all[i], np.float64)
                      + C64.T @ np.asarray(z_all[i], np.float64)).max()
        # Complementarity |z.s|: NOT part of the PIQP 13a-c exit tests — if
        # it is large at exit while rp/rd are small, the solution sits off
        # the active set (the candidate mechanism for an audit miss at
        # small iteration counts).
        comp64 = np.abs(np.asarray(z_all[i], np.float64)
                        * np.asarray(s_all[i], np.float64)).max()
        log(f"  lane {i}: device (rp, rd) = ({dev_rp[i]:.2e}, {dev_rd[i]:.2e})"
            f"  f64 (rp, rd, z.s) = ({rp64:.2e}, {rd64:.2e}, {comp64:.2e})")
        worst_true = (max(worst_true[0], rp64), max(worst_true[1], rd64))
        ref = solve_qp_reference(
            np.asarray(box.P[i], np.float64), np.asarray(box.q[i], np.float64),
            np.asarray(box.A[i], np.float64), np.asarray(box.l[i], np.float64),
            np.asarray(box.u[i], np.float64),
            eps_abs=1e-7, eps_rel=1e-7, rho=0.1, max_iterations=50_000)
        if ref.status == 3:
            devs.append(np.abs(x[i] - ref.x).max())
    audit = max(devs) if devs else float("nan")
    log(f"accuracy audit: max|x-x_ref|_inf over {len(devs)} lanes "
        f"(incl. worst stragglers) = {audit:.2e}; worst f64 residuals at "
        f"audited lanes: rp {worst_true[0]:.2e}, rd {worst_true[1]:.2e}")
    import json
    result = {
        "benchmark": "proxqp_fleet", "batch": args.batch, "n": args.n,
        "me": args.me, "mi": args.mi, "eps": args.eps, "rho": best_rho,
        "refine": args.refine, "check_interval": args.ci,
        "adaptive_rho": not args.no_adapt, "chunk_lanes": args.lanes,
        "chunk_dot_precision": "high" if args.dot_high else "highest",
        "iters_p50": float(np.median(iters_all)),
        "iters_max": int(iters_all.max()),
        "converged": int(conv_mask.sum()),
        "solves_per_s": best[0], "audit_inf": audit,
        "audit_lanes": len(devs), "audit_pass_1e-4": bool(audit <= 1e-4),
        "audit_f64_res_prim": worst_true[0], "audit_f64_res_dual": worst_true[1]}
    print(json.dumps(result))
    # Headline-config artifact (schema-guarded JSONL — VERDICT r3 weak #6:
    # the 4174/s configuration must be recoverable from a committed file).
    try:
        from quadraticprogramsolver_tpu.bench.harness import (
            append_headline_record)

        rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results", "proxqp_fleet.jsonl")
        append_headline_record(rec, result)
        log(f"headline record appended to {rec}")
    except Exception as e:
        log(f"headline record NOT written: {type(e).__name__}: {e}")

    # Stage split: factor (M build + inverse / sigma-free cache) vs one
    # chunk of iterations. The timing program reduces to one scalar so the
    # factor's output never doubles as a live HBM buffer (bench.py lesson).
    import jax.numpy as jnp

    sigma = jnp.asarray(1e-6, jnp.float32)
    rho_v = jnp.full((args.batch,), rhos[-1], jnp.float32)
    st_f = st

    @jax.jit
    def factor_only(prob, rho_v):
        with jax.default_matmul_precision("highest"):
            if args.sigma_free:
                cache = proxqp._build_sigma_free_cache(prob, rho_v, st_f)
                return sum(v.ravel()[0] for v in cache.values())
            return proxqp._build_M_inv(prob, rho_v, sigma).ravel()[0]

    hard_sync(factor_only(prob, rho_v))
    t0 = time.perf_counter(); hard_sync(factor_only(prob, rho_v)); tf = time.perf_counter() - t0
    log(f"factor ({'sigma-free cache' if args.sigma_free else 'M build + inverse'}): {tf*1e3:.0f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
