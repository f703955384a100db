"""Block-split distributed solve (model-parallel axis), optionally combined
with fleet sharding (data-parallel axis) on a 2-D mesh.

The reference is single-process; SURVEY.md §2 designates constraint-block
splitting with collective reductions as the TPU framework's model-parallel
axis, and BASELINE.md config 5 is the combined case: an MPC/scenario fleet
sharded over one mesh axis with each problem's constraint rows split over
the other. This module runs the *exact* OSQP iteration of models/admm.py
under `shard_map` with explicit ICI collectives:

  * KKT normal matrix:  M = P + sigma*I + rho * psum_blocks(A_d' A_d)
  * KKT right-hand side: sigma*x - q + psum_blocks(A_d'(rho*z_d - y_d))
  * dual residual:       ||Px + q + psum_blocks(A_d' y_d)||_inf
  * primal residual / norms: per-lane inf-norms reduced with pmax

x stays replicated across the block axis; every block shard computes the
identical x-update, so the distributed iterates match the single-device
solver exactly (tested to ~1e-9). Per-iteration communication is two
n-vector psums + a handful of per-lane pmaxes, riding ICI.

Math per iteration: SolveQuadraticProgram.jl:45-71, residuals :79-112.
Limitations vs the single-device solver: no polish, no vector-rho, no
infeasibility certificates (flags 1-3 only).
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
FLEET_AXIS = "qp"


def pad_rows_for_mesh(qp: QP, n_shards: int) -> QP:
    """Pad constraint rows to a multiple of the block-mesh axis with
    inactive rows."""
    from ..core.problem import pad_qp

    m_pad = -(-qp.m // n_shards) * n_shards
    return qp if m_pad == qp.m else pad_qp(qp, qp.n, m_pad)


def solve_block_split(qp: QP, settings: Settings = Settings(),
                      mesh: Mesh | None = None) -> Solution:
    """Solve one large dense QP with constraint rows sharded over a 1-D mesh."""
    if qp.batch_shape:
        raise ValueError(
            "solve_block_split takes a single (unbatched) QP; use "
            "solve_fleet_block_split for a fleet on a 2-D mesh")
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (BLOCK_AXIS,))
    batched = jax.tree.map(lambda x: x[None], qp)
    sol = _solve_impl(batched, settings, mesh, fleet_axis=None,
                      block_axis=mesh.axis_names[0])
    return jax.tree.map(lambda x: x[0], sol)


def solve_fleet_block_split(qp: QP, settings: Settings = Settings(),
                            mesh: Mesh | None = None) -> Solution:
    """BASELINE config 5: fleet axis sharded over mesh axis 0 (data
    parallel), constraint rows split over mesh axis 1 (model parallel)."""
    if len(qp.batch_shape) != 1:
        raise ValueError("expected one fleet axis; got batch shape "
                         f"{qp.batch_shape}")
    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs.reshape(-1, 1), (FLEET_AXIS, BLOCK_AXIS))
    fa, ba = mesh.axis_names
    if qp.batch_shape[0] % mesh.shape[fa]:
        raise ValueError(
            f"fleet size {qp.batch_shape[0]} not divisible by mesh axis "
            f"{mesh.shape[fa]}")
    return _solve_impl(qp, settings, mesh, fleet_axis=fa, block_axis=ba)


def _solve_impl(qp: QP, settings: Settings, mesh: Mesh,
                fleet_axis: str | None, block_axis: str) -> Solution:
    if settings.polish_iterations:
        raise NotImplementedError("polish not supported in block-split mode")
    if settings.rho_eq_scale != 1.0:
        raise NotImplementedError("vector-rho not supported in block-split mode")
    n_shards = mesh.shape[block_axis]
    m_orig = qp.m
    qp = pad_rows_for_mesh(qp, n_shards)

    fa = fleet_axis  # None => fleet axis unsharded (replicated batch of 1)
    rep = P(fa)
    row = P(fa, block_axis)
    in_specs = (P(fa), rep, P(fa, block_axis, None), row, row)
    out_specs = (rep, row, row, rep, rep, rep, rep, rep)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def run(Pm, q, A, l, u):
        dt = Pm.dtype
        Bb = Pm.shape[0]
        m_loc = A.shape[-2]
        sigma = jnp.asarray(settings.sigma, dt)
        alpha = jnp.asarray(settings.alpha, dt)
        alpha1 = jnp.asarray(1.0 - settings.alpha, dt)

        def psum(v):
            return jax.lax.psum(v, block_axis)

        def pmax(v):
            return jax.lax.pmax(v, block_axis)

        def factor(rho):
            AtA = psum(jnp.einsum("bki,bkj->bij", A, A))
            M = add_scaled_identity(
                sym(Pm) + rho[:, None, None] * sym(AtA), sigma)
            return spd_inverse(M)

        def kkt_solve(M_inv, rho, x, z, y):
            b = sigma * x - q + psum(matvec_t(A, rho[:, None] * z - y))
            xx = matvec(M_inv, b)
            for _ in range(settings.kkt_refinement_steps):
                Mxx = (matvec(Pm, xx) + sigma * xx
                       + rho[:, None] * psum(matvec_t(A, matvec(A, xx))))
                xx = xx + matvec(M_inv, b - Mxx)
            return xx, matvec(A, xx)

        # Loop-carried state must be pre-marked varying over the axes its
        # updates depend on (fleet-sharded inputs make everything vary over
        # the fleet axis; z/y additionally vary over the block axis).
        fleet_axes = (fleet_axis,) if fleet_axis else ()

        def mark(v, axes):
            for a in axes:
                v = jax.lax.pcast(v, a, to="varying")
            return v

        rho0 = mark(jnp.full((Bb,), settings.rho, dt), fleet_axes)
        z0 = mark(jnp.zeros((Bb, m_loc), dt), fleet_axes + (block_axis,))
        y0 = mark(jnp.zeros((Bb, m_loc), dt), fleet_axes + (block_axis,))
        state0 = (
            mark(jnp.zeros((Bb, Pm.shape[-1]), dt), fleet_axes), z0, y0,
            rho0, rho0, factor(rho0),
            mark(jnp.zeros((Bb,), jnp.int32), fleet_axes),   # status
            mark(jnp.zeros((Bb,), jnp.int32), fleet_axes),   # per-lane iters
            jnp.zeros((), jnp.int32),                        # global iteration
            mark(jnp.full((Bb,), jnp.inf, dt), fleet_axes),
            mark(jnp.full((Bb,), jnp.inf, dt), fleet_axes),
        )
        max_total = settings.num_checks * settings.check_interval

        def cond(st):
            return (st[8] < max_total) & jnp.any(st[6] == Status.RUNNING)

        def body(st):
            x, z, y, rho, rho_cand, M_inv, status, iters, it, rp, rd = st
            if settings.adaptive_rho:
                f = settings.rho_factor
                trip = ((status == Status.RUNNING)
                        & ((rho_cand * f < rho) | (rho_cand > f * rho)))
                rho = jnp.where(trip, rho_cand, rho)
                M_inv = jax.lax.cond(
                    jnp.any(trip), lambda _: factor(rho), lambda mi: mi, M_inv)

            active = (status == Status.RUNNING)[:, None]
            rho_col = rho[:, None]

            def step(_, carry):
                x, z, y, xp, zp = carry
                xx, zz = kkt_solve(M_inv, rho, x, z, y)
                xp, zp = x, z
                x_new = alpha * xx + alpha1 * xp
                z_new = jnp.clip(alpha * zz + alpha1 * zp + y / rho_col, l, u)
                y_new = y + rho_col * (alpha * zz + alpha1 * zp - z_new)
                x = jnp.where(active, x_new, xp)
                z = jnp.where(active, z_new, zp)
                y = jnp.where(active, y_new, y)
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
            act = status == Status.RUNNING

            if settings.adaptive_rho:
                den = res_dual * max_prim
                cand = jnp.clip(
                    rho * jnp.sqrt(res_prim * max_dual
                                   / jnp.where(den == 0, 1.0, den)),
                    RHO_MIN, RHO_MAX).astype(dt)
                ok = jnp.isfinite(cand) & (den != 0) & (cand > 0)
                rho_cand = jnp.where(act & ok, cand, rho_cand)

            solved = ((res_prim < settings.eps_abs + settings.eps_rel * max_prim)
                      & (res_dual < settings.eps_abs + settings.eps_rel * max_dual))
            ulp = jnp.asarray(8 * jnp.finfo(dt).eps, dt)
            eps_admm = jnp.asarray(settings.eps_admm, dt)
            fp = ((pmax(inf_norm(x - xp))
                   <= eps_admm + ulp * jnp.maximum(inf_norm(x), 1.0))
                  & (pmax(inf_norm(z - zp))
                     <= eps_admm + ulp * jnp.maximum(pmax(inf_norm(z)), 1.0)))
            status = jnp.where(act & solved, Status.SOLVED, status)
            status = jnp.where(act & fp, Status.SOLVED_ADMM, status)
            status = status.astype(jnp.int32)
            newly = act & (status != Status.RUNNING)
            iters = jnp.where(newly, it, iters)
            rp = jnp.where(act, res_prim, rp)
            rd = jnp.where(act, res_dual, rd)
            return (x, z, y, rho, rho_cand, M_inv, status, iters, it, rp, rd)

        (x, z, y, rho, _, _, status, iters, it, rp, rd) = jax.lax.while_loop(
            cond, body, state0)
        exhausted = status == Status.RUNNING
        status = jnp.where(exhausted, Status.MAX_ITERATIONS, status).astype(jnp.int32)
        iters = jnp.where(exhausted, it, iters)
        return x, z, y, status, iters, rp, rd, rho

    sharding = lambda spec: NamedSharding(mesh, spec)
    Pm = jax.device_put(qp.P, sharding(P(fa, None, None)))
    q = jax.device_put(qp.q, sharding(P(fa, None)))
    A = jax.device_put(qp.A, sharding(P(fa, block_axis, None)))
    l = jax.device_put(qp.l, sharding(P(fa, block_axis)))
    u = jax.device_put(qp.u, sharding(P(fa, block_axis)))

    # Full-f32 matmul accumulation on TPU (see models/admm.py rationale);
    # the context is trace-time, so wrapping the first (tracing) call suffices.
    with jax.default_matmul_precision("highest"):
        x, z, y, status, iters, rp, rd, rho = run(Pm, q, A, l, u)
    # Return duals/splits at the caller's constraint count, not the
    # mesh-padded one (padded rows carry z = y = 0 and never bind).
    z = z[..., :m_orig]
    y = y[..., :m_orig]
    info = SolveInfo(
        status=status, iterations=iters, res_prim=rp, res_dual=rd, rho=rho,
        objective=qp.objective(x))
    return Solution(x=x, z=z, y=y, info=info)
