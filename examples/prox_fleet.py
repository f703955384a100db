"""Example: a sharded fleet of split-form QPs on the prox-ALM family.

The second solver family (`/root/reference/ProxQP.jl:118-173`) at its
measured best: a fleet of dense `min 0.5 x'Px + q'x s.t. Ax=b, Cx<=d`
problems solved batched on the MXU and sharded over the device mesh
(parallel/mesh.solve_prox_fleet). On TPU the promoted round-5 recipe
(sigma-free column cache, 2-lane fused chunk with bf16x3 dots + the
first-chunk precision schedule, static rho from the recorded selection
recipe) runs 12,887 solves/s at B=4096, n=512 — see
benchmarks/results/proxqp_fleet.jsonl for the full rho sweep and
README's playbook for the recipe.

Routing note (measured round 5): equality-heavy split problems belong on
THIS family — lowering them to box form and running the box headline stack
converges 0/4096 lanes at typical rho (scalar-rho ADMM degrades on hard
equality rows; prox-ALM handles them exactly).

    python examples/prox_fleet.py           # CPU mesh (small shapes)
    JAX_PLATFORMS=axon python examples/prox_fleet.py   # real TPU
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    import quadraticprogramsolver_tpu as qps
    from quadraticprogramsolver_tpu.parallel.mesh import (
        make_fleet_mesh, solve_prox_fleet)

    on_tpu = jax.default_backend() == "tpu"
    B, n, me, mi = (4096, 512, 128, 128) if on_tpu else (32, 64, 8, 16)

    # Random strictly-feasible fleet (the shape of ProxQP001.jl's demo).
    rng = np.random.default_rng(0)
    if on_tpu:
        # Generate on device (host->device through the relay is ~8 MB/s).
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "benchmarks"))
        from proxqp_fleet import device_fleet

        prob = device_fleet(B, n, me, mi, seed=0)
    else:
        import jax as _j

        probs = []
        for s in range(B):
            r = np.random.default_rng(s)
            M = r.standard_normal((n, n))
            P = (M @ M.T / n + np.eye(n)).astype(np.float32)
            A = r.standard_normal((me, n)).astype(np.float32)
            C = r.standard_normal((mi, n)).astype(np.float32)
            xf = r.standard_normal(n).astype(np.float32)
            probs.append(qps.make_proxqp(
                P, r.standard_normal(n).astype(np.float32), A, A @ xf, C,
                C @ xf + 1.0, dtype=np.float32))
        prob = _j.tree.map(lambda *xs: np.stack(xs), *probs)

    st = qps.ProxQPSettings(
        max_iterations=2000, eps_abs=5e-5, eps_rel=5e-5,
        rho=0.0125, adaptive_rho=False,       # recorded selection recipe
        check_interval=25,
        kkt_warm_start=False, sigma_free_rhs=True, kkt_refinement_steps=0,
        fused_chunk=on_tpu, chunk_lanes=2 if on_tpu else 1,
        chunk_dot_precision="high" if on_tpu else "highest",
        first_chunk_dot_precision="default" if on_tpu else None,
    ) if on_tpu else qps.ProxQPSettings(
        max_iterations=2000, eps_abs=1e-6, eps_rel=1e-6, kkt_warm_start=False)

    mesh = make_fleet_mesh()

    def hard_sync(x):
        # Slice ON DEVICE before the host transfer: np.asarray(x) first
        # would pull the whole array through the ~8 MB/s relay.
        return float(np.asarray(x.ravel()[0]))

    # Shard ONCE (solve_prox_fleet would re-device_put the multi-GiB fleet
    # inside every call — a measured ~250 ms copy at this shape); repeated
    # solves then go straight to the jitted SPMD program.
    from quadraticprogramsolver_tpu.parallel.mesh import shard_fleet

    prob = shard_fleet(prob, mesh)
    sol = qps.solve_proxqp_jit(prob, st)
    hard_sync(sol.x)
    dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        sol = qps.solve_proxqp_jit(prob, st)
        hard_sync(sol.x)
        t = time.perf_counter() - t0
        dt = t if dt is None else min(dt, t)

    conv = int(np.asarray(sol.info.converged).sum())
    iters = np.asarray(sol.info.iterations)
    print(f"mesh: {mesh.devices.size} device(s); fleet B={B}, n={n}, "
          f"eq={me}, ineq={mi}")
    print(f"solved {conv}/{B} in {dt*1e3:.0f} ms ({conv/dt:.0f} solves/s), "
          f"iters p50={np.median(iters):.0f} max={iters.max()}")
    # Feasibility spot check on one lane.
    i = 0
    x = np.asarray(sol.x[i], np.float64)
    eq = np.abs(np.asarray(prob.A[i], np.float64) @ x
                - np.asarray(prob.b[i], np.float64)).max()
    ineq = (np.asarray(prob.C[i], np.float64) @ x
            - np.asarray(prob.d[i], np.float64)).max()
    print(f"lane 0 feasibility: |Ax-b|_inf = {eq:.2e}, max(Cx-d) = {ineq:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
