"""Regenerate the golden problem+solution fixtures (run from repo root).

The reference round-trips problems as .mat files so a case reproduces across
implementations (SolveQuadraticProgramUnitTest.m:47-49, 83-85; Julia side
MAT.jl :46-55). These .npz fixtures pin (P, q, A, l, u) and the f64 oracle
solution for a spread of generator classes so any future implementation (or
refactor) can be checked against frozen bits rather than a re-run generator.

    python tests/golden/make_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.utils.oracle import solve_qp_reference

HERE = os.path.dirname(os.path.abspath(__file__))

# (class, n, seed) — probed feasible seeds (the generator emits genuinely
# infeasible instances on some seeds; see CLAUDE.md).
CASES = [
    ("RANDOM_QP", 30),
    ("INEQUALITY_QP", 25),
    ("EQUALITY_QP", 24),
    ("PORTFOLIO", 30),
    ("LASSO", 12),
    ("SVM", 16),
]


def main():
    from quadraticprogramsolver_tpu.utils.oracle import kkt_optimality

    for cls, n in CASES:
        for seed in range(20):
            data = qps.generate_random_qp(qps.ProblemClass[cls], n, seed=seed)
            ref = solve_qp_reference(data.P, data.q, data.A, data.l, data.u,
                                     eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
                                     max_iterations=20_000)
            if ref.status in (4, 5):
                print(f"  {cls} seed {seed}: infeasible ({ref.status}), skip")
                continue
            # Acceptance is the direct KKT check at 1e-6, regardless of the
            # termination flag: lasso/huber/SVM (+-inf bounds, singular P)
            # park at MAX_ITERATIONS with KKT-tight iterates because the
            # eps-relative tests never fire on their residual plateaus.
            rep = kkt_optimality(data.P, data.q, data.A, data.l, data.u,
                                 ref.x, ref.z, ref.y)
            if max(rep.res_prim, rep.res_dual) <= 1e-6:
                break
            print(f"  {cls} seed {seed}: status {ref.status}, "
                  f"kkt {rep.res_prim:.1e}/{rep.res_dual:.1e}, skip")
        else:
            raise RuntimeError(f"no feasible seed for {cls}")
        P, q, A, l, u = data.dense()
        path = os.path.join(HERE, f"{cls.lower()}_n{n}_s{seed}.npz")
        np.savez_compressed(path, P=P, q=q, A=A, l=l, u=u,
                            x=ref.x, z=ref.z, y=ref.y)
        print(f"wrote {path}: n={n} m={A.shape[0]} seed={seed}")


if __name__ == "__main__":
    main()
