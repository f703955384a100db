"""Pallas TPU kernel: fused ADMM iteration chunk.

The hot loop of the batched OSQP solver is HBM-bandwidth-bound: every
iteration re-reads each lane's cached inverse M^{-1} (n^2) and constraint
matrix A (2mn) from HBM for a handful of matvecs (profiled ~400 GB/s, ~7
dispatches/iteration via XLA). This kernel fuses an entire check-interval
chunk: per lane, M^{-1} and A are DMA'd into VMEM **once** and all K
iterations run on-chip, cutting HBM traffic per chunk by ~K*2.5x and letting
the MXU do the (1,n)x(n,n) products from VMEM.

Per-lane iteration (identical math to models/admm.py, i.e.
SolveQuadraticProgram.jl:54-61):

    rhs = sigma*x - q + A'(rho*z - y)
    xx  = M^{-1} rhs          (M^{-1} symmetric -> rhs @ M^{-1} on the MXU)
    zz  = A xx
    x   = alpha*xx + (1-alpha)*x
    z   = clip(alpha*zz + (1-alpha)*z + y/rho, l, u)
    y   = y + rho*(alpha*zz + (1-alpha)*z_prev - z)

Converged lanes skip the whole chunk via @pl.when (per-lane predication the
XLA path can only emulate with where-masking).

**Multi-lane interleaving** (``lanes`` > 1): a single lane's iteration is a
chain of dependent (1, n)-row dots — the MXU sits mostly idle between them
(measured ~6 TFLOP/s effective at lanes=1). Packing `lanes` independent
lanes per grid step and emitting their dot chains stage-interleaved gives
the scheduler independent work to overlap. VMEM per program scales with
`lanes`; a pair/quad is predicated off only when ALL its lanes are frozen.

Shapes must be padded so n and m are multiples of 128 (lane width) — use
core.problem.pad_qp. VMEM per lane: (n^2 + mn + small) * 4 bytes; with
double buffering this caps lanes*n around 1024 for f32 (larger problems
take the CG path anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_kernel(active_all_ref,                   # scalar-prefetch (B,) SMEM
                  *refs, K: int, alpha: float, sigma: float, refine: int,
                  lanes: int, sigma_free: bool = False,
                  dot_precision: str = "highest", split: bool = False):
    # P is only an operand (and only DMA'd) when refinement is on.
    g_ref = Glo_ref = None
    if split:
        # Pre-split cache (Settings.split_cache): the G operand arrives as
        # TWO bf16 halves (half the HBM read and VMEM residency of the f32
        # G — what lets lanes=4 fit with the bf16x3 dots). Implies
        # sigma_free and dot_precision="high".
        (Minv_ref, Glo_ref, A_ref, g_ref, l_ref, u_ref, rho_ref,
         x_ref, z_ref, y_ref,
         xo_ref, zo_ref, yo_ref, xpo_ref, zpo_ref, Axo_ref, ATyo_ref) = refs
        P_ref = q_ref = None
    elif sigma_free:
        # Sigma-free RHS: the first matrix is G = M^{-1}A' (kept (n, m) — the
        # dot contracts its last axis) and the per-lane x-update is
        # xx = G(rho z - y) - g — two dots per iteration instead of three
        # (see Settings.sigma_free_rhs). q is not an operand (it lives in g).
        (Minv_ref, A_ref, g_ref, l_ref, u_ref, rho_ref,
         x_ref, z_ref, y_ref,
         xo_ref, zo_ref, yo_ref, xpo_ref, zpo_ref, Axo_ref, ATyo_ref) = refs
        P_ref = q_ref = None
    elif refine > 0:
        (Minv_ref, A_ref, P_ref, q_ref, l_ref, u_ref, rho_ref,
         x_ref, z_ref, y_ref,
         xo_ref, zo_ref, yo_ref, xpo_ref, zpo_ref, Axo_ref, ATyo_ref) = refs
    else:
        (Minv_ref, A_ref, q_ref, l_ref, u_ref, rho_ref,
         x_ref, z_ref, y_ref,
         xo_ref, zo_ref, yo_ref, xpo_ref, zpo_ref, Axo_ref, ATyo_ref) = refs
        P_ref = None
    f32 = jnp.float32
    b = pl.program_id(0)
    L = lanes
    act = [active_all_ref[b * L + i] != 0 for i in range(L)]
    any_active = act[0]
    for a in act[1:]:
        any_active = jnp.logical_or(any_active, a)
    al = jnp.asarray(alpha, f32)
    al1 = jnp.asarray(1.0 - alpha, f32)
    sg = jnp.asarray(sigma, f32)

    # Precision pinned: the ambient default_matmul_precision may be
    # HIGH (bf16x3), which Mosaic's dot lowering does not implement — but
    # the 3-pass split CAN be written by hand (dot_precision="high"
    # below), and the chunk is MXU-pass-bound: measured on-chip at
    # B=4096/lanes=4/K=12, HIGHEST (6 passes) 98.9 ms, DEFAULT (1 pass)
    # 43.1 ms. "default" (one bf16 pass) is exposed for probes only — at
    # the 1e-4 bar iterates stall around the bf16 matvec error.
    hi = (jax.lax.Precision.DEFAULT if dot_precision == "default"
          else jax.lax.Precision.HIGHEST)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=f32,
            precision=hi)

    # Manual bf16x3: a*b ~= ah*bh + ah*bl + al*bh with x = xh + xl split
    # into two bf16 halves (the lo*lo term is ~2^-32 relative, dropped).
    # Three 1-pass MXU dots instead of HIGHEST's six; ~f32 accuracy for
    # the well-conditioned iterate matvecs. The matrix halves are split
    # ONCE per grid step (loop-invariant); only the (1, len) vector is
    # split per iteration.
    bf16 = jnp.bfloat16

    def _split(v):
        vh = v.astype(bf16)
        return vh, (v - vh.astype(f32)).astype(bf16)

    def _dot1(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)

    def dot3(v, mat_split, dims):
        vh, vl = _split(v)
        mh, ml = mat_split
        return (_dot1(vh, mh, dims) + _dot1(vh, ml, dims)
                + _dot1(vl, mh, dims))

    @pl.when(jnp.logical_not(any_active))
    def _():
        xo_ref[:] = x_ref[:]
        zo_ref[:] = z_ref[:]
        yo_ref[:] = y_ref[:]
        xpo_ref[:] = x_ref[:]
        zpo_ref[:] = z_ref[:]

    @pl.when(any_active)
    def _():
        A = [A_ref[i] for i in range(L)]
        # G (n, m) when sigma_free; unused when split (bf16 halves instead)
        Minv = None if split else [Minv_ref[i] for i in range(L)]
        q = None if sigma_free else [q_ref[i] for i in range(L)]
        g = [g_ref[i] for i in range(L)] if sigma_free else None
        lo = [l_ref[i] for i in range(L)]
        up = [u_ref[i] for i in range(L)]
        rho = [rho_ref[i] for i in range(L)]   # (1, m) per-constraint penalties
        rho_inv = [1.0 / r for r in rho]
        high = dot_precision == "high" or split
        if split:  # G arrives pre-split (bf16 halves straight from HBM)
            G_sp = [(Minv_ref[i], Glo_ref[i]) for i in range(L)]
            A_sp = [_split(A[i]) for i in range(L)]
        elif high:  # loop-invariant bf16 halves, split once per grid step
            G_sp = [_split(Minv[i]) for i in range(L)]
            A_sp = [_split(A[i]) for i in range(L)]

        def body(_, carry):
            x, z, y = carry[0], carry[1], carry[2]
            # Stage-interleaved across lanes: each stage emits L independent
            # dots back-to-back so the MXU pipeline stays fed.
            t = [rho[i] * z[i] - y[i] for i in range(L)]               # (1, m)
            if sigma_free and high:
                xx = [dot3(t[i], G_sp[i], ((1,), (1,))) - g[i]
                      for i in range(L)]                               # (1, n)
            elif sigma_free:
                xx = [dot(t[i], Minv[i], ((1,), (1,))) - g[i]
                      for i in range(L)]                               # (1, n)
            else:
                rhs = [sg * x[i] - q[i] + dot(t[i], A[i], ((1,), (0,)))
                       for i in range(L)]                              # (1, n)
                xx = [dot(rhs[i], Minv[i], ((1,), (0,))) for i in range(L)]
            for _r in range(refine):
                # r = rhs - M xx with M = P + sigma*I + A'(rho o (A .))
                Axx = [dot(xx[i], A[i], ((1,), (1,))) for i in range(L)]
                Mxx = [dot(xx[i], P_ref[i], ((1,), (0,))) + sg * xx[i]
                       + dot(rho[i] * Axx[i], A[i], ((1,), (0,)))
                       for i in range(L)]
                xx = [xx[i] + dot(rhs[i] - Mxx[i], Minv[i], ((1,), (0,)))
                      for i in range(L)]
            if high:
                zz = [dot3(xx[i], A_sp[i], ((1,), (1,))) for i in range(L)]
            else:
                zz = [dot(xx[i], A[i], ((1,), (1,))) for i in range(L)]
            xp, zp = x, z
            x = tuple(al * xx[i] + al1 * xp[i] for i in range(L))
            z = tuple(jnp.clip(al * zz[i] + al1 * zp[i] + rho_inv[i] * y[i],
                               lo[i], up[i]) for i in range(L))
            y = tuple(y[i] + rho[i] * (al * zz[i] + al1 * zp[i] - z[i])
                      for i in range(L))
            return x, z, y, xp, zp

        x0 = tuple(x_ref[i] for i in range(L))
        z0 = tuple(z_ref[i] for i in range(L))
        y0 = tuple(y_ref[i] for i in range(L))
        x, z, y, xp, zp = jax.lax.fori_loop(
            0, K, body, (x0, z0, y0, x0, z0))
        for i in range(L):
            # Per-lane predication within the pack: frozen lanes pass through.
            xo_ref[i] = jnp.where(act[i], x[i], x_ref[i])
            zo_ref[i] = jnp.where(act[i], z[i], z_ref[i])
            yo_ref[i] = jnp.where(act[i], y[i], y_ref[i])
            xpo_ref[i] = jnp.where(act[i], xp[i], x_ref[i])
            zpo_ref[i] = jnp.where(act[i], zp[i], z_ref[i])

    # Convergence-check products from the VMEM-resident A: the per-check
    # residuals need A x and A'y anyway, and recomputing them in XLA re-reads
    # A from HBM for the whole fleet. Computed for frozen lanes too (their
    # x, y are the converged iterates, so the products — and the residuals
    # derived from them — stay correct for history/reporting).
    for i in range(lanes):
        A_i = A_ref[i]
        Axo_ref[i] = dot(xo_ref[i], A_i, ((1,), (1,)))
        ATyo_ref[i] = dot(yo_ref[i], A_i, ((1,), (0,)))


@functools.partial(
    jax.jit,
    static_argnames=("K", "alpha", "sigma", "refine", "lanes", "sigma_free",
                     "slab", "dot_precision", "interpret"))
def fused_admm_chunk(Minv, A, P, q, l, u, x, z, y, rho_row, active,
                     *, K: int, alpha: float, sigma: float, refine: int = 0,
                     lanes: int = 1, sigma_free: bool = False,
                     slab: bool = False, dot_precision: str = "highest",
                     interpret: bool = False, g=None, Glo=None):
    """Run K fused ADMM iterations for every active lane.

    Args:
      Minv: (B, n, n) cached inverse of P + sigma*I + A'diag(rho_row)A (f32).
        With ``sigma_free``: instead the (B, n, m) matrix G = M^{-1}A', and
        ``g`` = (B, n) M^{-1}q — the x-update is then xx = G(rho z - y) - g
        (two dots/iteration instead of three; P/q are unused and may be
        None). See Settings.sigma_free_rhs.
      A: (B, m, n); P: (B, n, n); q,x: (B, n); l,u,z,y,rho_row: (B, m);
      active: (B,) bool; refine: in-kernel iterative-refinement passes per
      KKT solve (sigma_free excludes refine > 0). P is only an operand
      (DMA'd/resident) when refine > 0; VMEM per lane is n^2 + m*n floats
      (+ n^2 with refinement), or 2*m*n with sigma_free.
      lanes: independent lanes interleaved per grid step (B must divide).
      slab (with sigma_free): ``Minv`` is the FULL factor slab
        (B, n, >= m + 128) and G is read through a (lanes, n, m) block
        WINDOW at column offset 0 — the slab's first m columns are exactly
        G = M^{-1}A' (ops/fused_factor.py layout), so the (B, n, m) G copy
        is never materialized in HBM (see Settings.slab_cache).
      Glo (with sigma_free + dot_precision="high"): ``Minv`` is the bf16
        HI half of G and ``Glo`` its bf16 LO half, pre-split on the host
        (Settings.split_cache) — half the HBM read and VMEM residency of
        an f32 G, which is what lets lanes=4 fit with the bf16x3 dots
        (53.4 vs 62.3 ms per 12-iteration chunk, measured B=4096).
    Returns:
      (x, z, y, x_prev, z_prev, Ax, ATy) after K iterations (prev = start of
      the last iteration, for the ADMM fixed-point test; Ax/ATy are the
      convergence-check products of the returned x, y computed from the
      VMEM-resident A).
    """
    B, n = x.shape
    m = l.shape[-1]
    if sigma_free and (refine > 0 or g is None):
        raise ValueError("sigma_free needs g and excludes refine > 0")
    if n % 128 or m % 128:
        raise ValueError(f"fused chunk needs n, m multiples of 128; got {(n, m)}")
    if B % lanes:
        raise ValueError(f"batch {B} not divisible by lanes={lanes}")
    f32 = jnp.float32
    split = Glo is not None
    kernel = functools.partial(_chunk_kernel, K=K, alpha=alpha, sigma=sigma,
                               refine=refine, lanes=lanes,
                               sigma_free=sigma_free,
                               dot_precision=dot_precision, split=split)

    if dot_precision == "high" and not sigma_free:
        raise ValueError("dot_precision='high' (manual bf16x3) is "
                         "implemented for the sigma-free path only")
    if split and (not sigma_free or slab or dot_precision != "high"):
        raise ValueError("a pre-split G (Glo) requires sigma_free + "
                         "dot_precision='high' and excludes slab")
    if split and (Minv.dtype != jnp.bfloat16 or Glo.dtype != jnp.bfloat16):
        raise ValueError("pre-split G halves must be bfloat16")
    if slab and not sigma_free:
        raise ValueError("slab windows apply to the sigma-free G cache only")
    if slab and Minv.shape[-1] < m:
        raise ValueError(f"slab width {Minv.shape[-1]} < m={m}")
    if not slab and sigma_free and Minv.shape[-1] != m:
        raise ValueError(f"G must be (B, n, m); got {Minv.shape} "
                         "(pass slab=True for a slab-backed G)")
    grid = (B // lanes,)
    # index_map receives (grid_idx, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the *_ tail. Vectors carry a singleton
    # sublane axis (B, 1, len) so each (lanes, 1, len) block's trailing dims
    # equal the array's (Mosaic tiling constraint).
    mat = lambda r, c: pl.BlockSpec((lanes, r, c), lambda b, *_: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    vec = lambda c: pl.BlockSpec((lanes, 1, c), lambda b, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    # With ``slab`` the G operand's block is a WINDOW into the wider slab:
    # block shape (lanes, n, m) over array (B, n, wid), index (b, 0, 0)
    # addresses elements [b*lanes:(b+1)*lanes, 0:n, 0:m] — G exactly.
    g_spec = mat(n, m) if sigma_free else mat(n, n)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # active mask, read per program_id
            grid=grid,
            in_specs=(
                [g_spec] + ([mat(n, m)] if split else []) + [mat(m, n)]
                + ([mat(n, n)] if refine > 0 else [])
                + [vec(n)]  # g when sigma_free, else q
                + [vec(m), vec(m), vec(m), vec(n), vec(m), vec(m)]
            ),
            out_specs=[vec(n), vec(m), vec(m), vec(n), vec(m), vec(m), vec(n)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, n), f32),
            jax.ShapeDtypeStruct((B, 1, m), f32),
            jax.ShapeDtypeStruct((B, 1, m), f32),
            jax.ShapeDtypeStruct((B, 1, n), f32),
            jax.ShapeDtypeStruct((B, 1, m), f32),
            jax.ShapeDtypeStruct((B, 1, m), f32),
            jax.ShapeDtypeStruct((B, 1, n), f32),
        ],
        interpret=interpret,
    )(
        active.astype(jnp.int32),
        Minv if split else Minv.astype(f32),
        *([Glo] if split else []),
        A.astype(f32),
        *(([P.astype(f32)]) if refine > 0 else []),
        (g if sigma_free else q).astype(f32)[:, None, :],
        l.astype(f32)[:, None, :],
        u.astype(f32)[:, None, :], rho_row.astype(f32)[:, None, :],
        x.astype(f32)[:, None, :], z.astype(f32)[:, None, :],
        y.astype(f32)[:, None, :],
    )
    return tuple(o[:, 0, :] for o in out)
