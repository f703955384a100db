"""Solver state and result pytrees.

The reference returns only a convergence flag plus the mutated ``vX``
(`/root/reference/SolveQuadraticProgram.jl:73`); its ProxQP front-end returns a
report Dict (`/root/reference/ProxQP.jl:127`). Here every solve returns a
structured :class:`SolveInfo` per batched instance — device-resident status
codes instead of host-side control flow, so a fleet of QPs reports
convergence without synchronizing with the host.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

from .pytree import pytree_dataclass as _pytree_dataclass


class Status(enum.IntEnum):
    """Per-instance convergence flag.

    Values 1-3 match the reference enum `ConvergenceFlag`
    (`SolveQuadraticProgram.jl:12`, `SolveQuadraticProgram.m:114-117`):
    1 = iteration budget exhausted, 2 = ADMM fixed point, 3 = primal+dual.
    RUNNING (0) is internal to the batched loop. 4/5 are certificate-based
    infeasibility detections (OSQP paper §3.4) — absent in the reference
    (its README To-Do) but load-bearing here because the reference's own
    generator emits infeasible instances.
    """

    RUNNING = 0
    MAX_ITERATIONS = 1
    SOLVED_ADMM = 2
    SOLVED = 3
    PRIMAL_INFEASIBLE = 4
    DUAL_INFEASIBLE = 5


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SolverState:
    """Batched ADMM iterate. All per-instance leaves share batch shape *B.

    x, xx: (*B, n) primal iterate / KKT tilde-x
    z, y:  (*B, m) split variable / dual
    rho:       (*B,) current per-instance penalty (factor matches this value)
    rho_cand:  (*B,) adaptive-rho candidate from the last convergence check
    status:    (*B,) int32 Status
    iterations:(*B,) int32 iteration count when the lane stopped
    res_prim/res_dual: (*B,) last measured residual inf-norms
    iteration: () int32 global iteration counter
    kkt_cache: backend-specific factor cache pytree (e.g. cached M^-1)
    """

    x: jax.Array
    z: jax.Array
    y: jax.Array
    rho: jax.Array
    rho_cand: jax.Array
    status: jax.Array
    iterations: jax.Array
    res_prim: jax.Array
    res_dual: jax.Array
    iteration: jax.Array
    kkt_cache: object
    #: Optional per-check trace dict (res_prim/res_dual/rho, shape
    #: (num_checks, *B)); None unless Settings.record_history.
    history: object = None
    #: Optional dict of the convergence-check matvec products at the current
    #: iterate ({"Px": (*B, n), "Ax": (*B, m), "ATy": (*B, n)}); carried so
    #: the infeasibility certificates can form delta products by linearity
    #: (P dx = Px - Px_prev) instead of re-running three matvecs per check.
    #: None unless Settings.check_infeasibility.
    products: object = None
    #: Optional Anderson-acceleration carry (ring buffers of iterate /
    #: residual differences, see models/anderson.py). None unless
    #: Settings.anderson_memory > 0.
    aa: object = None


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SolveInfo:
    """Per-instance solve diagnostics (batched)."""

    status: jax.Array        # (*B,) int32, see Status
    iterations: jax.Array    # (*B,) int32
    res_prim: jax.Array      # (*B,) primal residual inf-norm at last check
    res_dual: jax.Array      # (*B,) dual residual inf-norm at last check
    rho: jax.Array           # (*B,) final penalty parameter
    objective: jax.Array     # (*B,) 0.5 x'Px + q'x at the returned x
    #: Optional residual trace: dict with res_prim/res_dual/rho of shape
    #: (num_checks, *B) (inf past the stopping check). The reference's
    #: residual printout (ProxQP.jl:272, commented) as device-side data.
    history: object = None

    @property
    def solved(self) -> jax.Array:
        return (self.status == Status.SOLVED_ADMM) | (self.status == Status.SOLVED)

    @property
    def infeasible(self) -> jax.Array:
        return self.status >= Status.PRIMAL_INFEASIBLE


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Full primal/dual solution of a batched solve."""

    x: jax.Array             # (*B, n)
    z: jax.Array             # (*B, m)
    y: jax.Array             # (*B, m) duals for l <= Ax <= u
    info: SolveInfo


def all_done(status: jax.Array) -> jax.Array:
    """True when no lane is still running."""
    return jnp.all(status != Status.RUNNING)
