"""Block-split distributed solve of one large QP (model-parallel analogue).

The reference is single-process; SURVEY.md §2 designates constraint-block
splitting with collective reductions as the TPU framework's model-parallel
axis. This module runs the *exact* OSQP iteration of models/admm.py with the
constraint rows of A (and z, y, l, u) sharded over a mesh axis, under
`shard_map` with explicit ICI collectives:

  * KKT normal matrix:  M = P + sigma*I + rho * psum_d(A_d' A_d)
  * KKT right-hand side: sigma*x - q + psum_d(A_d'(rho*z_d - y_d))
  * dual residual:       ||Px + q + psum_d(A_d' y_d)||_inf
  * primal residual / norms: local inf-norms reduced with pmax

x stays replicated; every device computes the identical x-update, so the
distributed iterates match the single-device solver exactly (tested to
~machine precision in tests/test_consensus.py). Scaling story: per-device
work drops with the number of constraint-row shards, while the per-iteration
communication is two n-vector psums + a handful of scalar pmaxes — exactly
the "reduce residual norms and Schur terms via collectives" design of
SURVEY.md §2. Math per iteration: SolveQuadraticProgram.jl:45-71, residuals
:79-112.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import QP
from ..core.settings import RHO_MAX, RHO_MIN, Settings
from ..core.state import SolveInfo, Solution, Status
from ..ops.linalg import add_scaled_identity, inf_norm, matvec, matvec_t, spd_inverse, sym

BLOCK_AXIS = "blocks"


def pad_rows_for_mesh(qp: QP, n_shards: int) -> QP:
    """Pad constraint rows to a multiple of the mesh axis with inactive rows."""
    if qp.batch_shape:
        raise ValueError("block-split solve takes a single (unbatched) QP")
    m = qp.m
    m_pad = -(-m // n_shards) * n_shards
    if m_pad == m:
        return qp
    from ..core.problem import pad_qp

    return pad_qp(qp, qp.n, m_pad)


def solve_block_split(qp: QP, settings: Settings = Settings(),
                      mesh: Mesh | None = None) -> Solution:
    """Solve one large dense QP with constraint rows sharded over the mesh."""
    if settings.polish_iterations:
        raise NotImplementedError("polish not supported in block-split mode yet")
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (BLOCK_AXIS,))
    axis = mesh.axis_names[0]  # accept any 1-D mesh, whatever its axis name
    n_shards = mesh.shape[axis]
    qp = pad_rows_for_mesh(qp, n_shards)

    rep = P()
    row = P(axis)
    in_specs = (rep, rep, P(axis, None), row, row)
    out_specs = (rep, row, row, rep, rep, rep, rep, rep)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def run(Pm, q, A, l, u):
        dt = Pm.dtype
        n = Pm.shape[-1]
        m_loc = A.shape[-2]
        sigma = jnp.asarray(settings.sigma, dt)
        alpha = jnp.asarray(settings.alpha, dt)
        alpha1 = jnp.asarray(1.0 - settings.alpha, dt)
        eps_admm = jnp.asarray(settings.eps_admm, dt)

        def psum(v):
            return jax.lax.psum(v, axis)

        def pmax(v):
            return jax.lax.pmax(v, axis)

        def factor(rho):
            AtA = psum(jnp.einsum("ki,kj->ij", A, A))
            M = add_scaled_identity(sym(Pm) + rho * sym(AtA), sigma)
            return spd_inverse(M)

        def kkt_solve(M_inv, rho, x, z, y):
            b = sigma * x - q + psum(matvec_t(A, rho * z - y))
            xx = matvec(M_inv, b)
            for _ in range(settings.kkt_refinement_steps):
                Mxx = (matvec(Pm, xx) + sigma * xx
                       + rho * psum(matvec_t(A, matvec(A, xx))))
                xx = xx + matvec(M_inv, b - Mxx)
            return xx, matvec(A, xx)

        rho0 = jnp.asarray(settings.rho, dt)
        # z/y are row-sharded state: mark them varying over the mesh axis so
        # loop-carry types match after the first (l/u-dependent) update.
        z0 = jax.lax.pcast(jnp.zeros(m_loc, dt), axis, to='varying')
        y0 = jax.lax.pcast(jnp.zeros(m_loc, dt), axis, to='varying')
        state0 = (
            jnp.zeros(n, dt), z0, y0,  # x z y
            rho0, rho0, factor(rho0),
            jnp.zeros((), jnp.int32),                      # status
            jnp.zeros((), jnp.int32),                      # iteration
            jnp.full((), jnp.inf, dt), jnp.full((), jnp.inf, dt),  # residuals
        )
        max_total = settings.num_checks * settings.check_interval

        def cond(st):
            return (st[7] < max_total) & (st[6] == Status.RUNNING)

        def body(st):
            x, z, y, rho, rho_cand, M_inv, status, it, rp, rd = st
            if settings.adaptive_rho:
                f = settings.rho_factor
                trip = (rho_cand * f < rho) | (rho_cand > f * rho)
                rho = jnp.where(trip, rho_cand, rho)
                M_inv = jax.lax.cond(trip, lambda _: factor(rho), lambda mi: mi, M_inv)

            def step(_, carry):
                x, z, y, xp, zp = carry
                xx, zz = kkt_solve(M_inv, rho, x, z, y)
                xp, zp = x, z
                x = alpha * xx + alpha1 * xp
                z = jnp.clip(alpha * zz + alpha1 * zp + y / rho, l, u)
                y = y + rho * (alpha * zz + alpha1 * zp - z)
                return x, z, y, xp, zp

            x, z, y, xp, zp = jax.lax.fori_loop(
                0, settings.check_interval, step, (x, z, y, x, z))
            it = it + settings.check_interval

            Ax = matvec(A, x)
            Px = matvec(Pm, x)
            ATy = psum(matvec_t(A, y))
            res_prim = pmax(inf_norm(Ax - z))
            res_dual = inf_norm(Px + q + ATy)
            max_prim = jnp.maximum(pmax(inf_norm(Ax)), pmax(inf_norm(z)))
            max_dual = jnp.maximum(
                jnp.maximum(inf_norm(Px), inf_norm(ATy)), inf_norm(q))

            if settings.adaptive_rho:
                den = res_dual * max_prim
                cand = jnp.clip(
                    rho * jnp.sqrt(res_prim * max_dual / jnp.where(den == 0, 1.0, den)),
                    RHO_MIN, RHO_MAX).astype(dt)
                ok = jnp.isfinite(cand) & (den != 0) & (cand > 0)
                rho_cand = jnp.where(ok, cand, rho_cand)

            solved = ((res_prim < settings.eps_abs + settings.eps_rel * max_prim)
                      & (res_dual < settings.eps_abs + settings.eps_rel * max_dual))
            fp = ((pmax(inf_norm(x - xp)) <= eps_admm)
                  & (pmax(inf_norm(z - zp)) <= eps_admm))
            status = jnp.where(solved, Status.SOLVED, status)
            status = jnp.where(fp, Status.SOLVED_ADMM, status).astype(jnp.int32)
            return (x, z, y, rho, rho_cand, M_inv, status, it, res_prim, res_dual)

        x, z, y, rho, _, _, status, it, rp, rd = jax.lax.while_loop(cond, body, state0)
        status = jnp.where(status == Status.RUNNING,
                           Status.MAX_ITERATIONS, status).astype(jnp.int32)
        return x, z, y, status, it, rp, rd, rho

    sharding = lambda spec: NamedSharding(mesh, spec)
    Pm = jax.device_put(qp.P, sharding(P(None, None)))
    q = jax.device_put(qp.q, sharding(P(None)))
    A = jax.device_put(qp.A, sharding(P(axis, None)))
    l = jax.device_put(qp.l, sharding(P(axis)))
    u = jax.device_put(qp.u, sharding(P(axis)))

    # Full-f32 matmul accumulation on TPU (see models/admm.py rationale);
    # the context is trace-time, so wrapping the first (tracing) call suffices.
    with jax.default_matmul_precision("highest"):
        x, z, y, status, it, rp, rd, rho = run(Pm, q, A, l, u)
    info = SolveInfo(
        status=status, iterations=it, res_prim=rp, res_dual=rd, rho=rho,
        objective=qp.objective(x))
    return Solution(x=x, z=z, y=y, info=info)
