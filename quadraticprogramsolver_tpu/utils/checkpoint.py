"""Solution / problem persistence.

Reference analogue: problems exported/imported as .mat to reproduce a case
across MATLAB/Julia (`SolveQuadraticProgramUnitTest.m:83-85`, `...jl:46-55`).
Here both problems and solutions are flat pytrees of arrays, so persistence
is one .npz per object; a restored Solution warm-starts a new solve (the
solver-state-as-checkpoint design of SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np

from ..core.problem import QP
from ..core.state import SolveInfo, Solution


def save_qp(path: str, qp: QP) -> None:
    np.savez(path, P=np.asarray(qp.P), q=np.asarray(qp.q), A=np.asarray(qp.A),
             l=np.asarray(qp.l), u=np.asarray(qp.u))


def load_qp(path: str) -> QP:
    import jax.numpy as jnp

    d = np.load(path)
    return QP(*(jnp.asarray(d[k]) for k in ("P", "q", "A", "l", "u")))


def save_solution(path: str, sol: Solution) -> None:
    np.savez(
        path,
        x=np.asarray(sol.x), z=np.asarray(sol.z), y=np.asarray(sol.y),
        status=np.asarray(sol.info.status),
        iterations=np.asarray(sol.info.iterations),
        res_prim=np.asarray(sol.info.res_prim),
        res_dual=np.asarray(sol.info.res_dual),
        rho=np.asarray(sol.info.rho),
        objective=np.asarray(sol.info.objective),
    )


def load_solution(path: str) -> Solution:
    import jax.numpy as jnp

    d = np.load(path)
    info = SolveInfo(
        status=jnp.asarray(d["status"]), iterations=jnp.asarray(d["iterations"]),
        res_prim=jnp.asarray(d["res_prim"]), res_dual=jnp.asarray(d["res_dual"]),
        rho=jnp.asarray(d["rho"]), objective=jnp.asarray(d["objective"]))
    return Solution(x=jnp.asarray(d["x"]), z=jnp.asarray(d["z"]),
                    y=jnp.asarray(d["y"]), info=info)
