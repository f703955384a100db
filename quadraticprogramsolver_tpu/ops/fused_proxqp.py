"""Pallas TPU kernel: fused prox-ALM (ProxQP) iteration chunk.

Same design as ops/fused_admm.py for the second solver family: per lane,
M^{-1}, A, and C stay resident in VMEM across all check-interval iterations
(HBM re-reads drop by ~K-fold), with per-lane convergence predication.

Per-lane iteration (identical math to models/proxqp.py, i.e.
/root/reference/ProxQP.jl:208-249):

    r  = -q + sigma*x + A'(rho*b - y) + C'(rho*(d - s) - z)
    x  = M^{-1} r        (+ optional in-kernel iterative refinement)
    s  = max(d - Cx - z/rho, 0)
    y  = y + rho*(Ax - b)
    z  = max(z + rho*(Cx - d + s), 0)

Shapes must be padded so n, n_eq, n_ineq are multiples of 128 and the
equality/inequality counts nonzero; the solver falls back to the XLA chunk
otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_kernel(rho_all_ref, active_all_ref,      # scalar-prefetch (B,)
                  *refs, K: int, sigma: float, refine: int, lanes: int,
                  sigma_free: bool = False, dot_precision: str = "highest"):
    Gc_ref = g_ref = None
    if sigma_free:
        # Column cache {Ga, Gc, g} instead of M^{-1} (see
        # ProxQPSettings.sigma_free_rhs): x = Ga(rho b - y) +
        # Gc(rho(d-s) - z) - g — two cache dots per iteration, no q/sigma
        # (Ga rides the Minv slot, kept (n, me): the dot contracts its
        # last axis, same discipline as the ADMM kernel's G).
        (Minv_ref, A_ref, C_ref, Gc_ref, g_ref, b_ref, d_ref,
         x_ref, s_ref, y_ref, z_ref,
         xo_ref, so_ref, yo_ref, zo_ref) = refs
        P_ref = q_ref = None
    elif refine > 0:
        (Minv_ref, A_ref, C_ref, P_ref, q_ref, b_ref, d_ref,
         x_ref, s_ref, y_ref, z_ref,
         xo_ref, so_ref, yo_ref, zo_ref) = refs
    else:
        (Minv_ref, A_ref, C_ref, q_ref, b_ref, d_ref,
         x_ref, s_ref, y_ref, z_ref,
         xo_ref, so_ref, yo_ref, zo_ref) = refs
        P_ref = None
    f32 = jnp.float32
    gidx = pl.program_id(0)
    L = lanes
    rho = [rho_all_ref[gidx * L + i] for i in range(L)]
    act = [active_all_ref[gidx * L + i] != 0 for i in range(L)]
    any_active = act[0]
    for a in act[1:]:
        any_active = jnp.logical_or(any_active, a)
    sg = jnp.asarray(sigma, f32)

    @pl.when(jnp.logical_not(any_active))
    def _():
        xo_ref[:] = x_ref[:]
        so_ref[:] = s_ref[:]
        yo_ref[:] = y_ref[:]
        zo_ref[:] = z_ref[:]

    @pl.when(any_active)
    def _():
        Minv = [Minv_ref[i] for i in range(L)]  # Ga (n, me) when sigma_free
        A = [A_ref[i] for i in range(L)]
        C = [C_ref[i] for i in range(L)]
        q = None if sigma_free else [q_ref[i] for i in range(L)]
        Gc = [Gc_ref[i] for i in range(L)] if sigma_free else None
        g = [g_ref[i] for i in range(L)] if sigma_free else None
        b = [b_ref[i] for i in range(L)]
        d = [d_ref[i] for i in range(L)]
        rho_inv = [1.0 / r for r in rho]
        # "default" (one bf16 pass) supports the first-chunk precision
        # schedule (ProxQPSettings.first_chunk_dot_precision); see
        # ops/fused_admm.py for the measured pass costs.
        hi = (jax.lax.Precision.DEFAULT if dot_precision == "default"
              else jax.lax.Precision.HIGHEST)

        def dot(a, bb, dims):
            return jax.lax.dot_general(
                a, bb, (dims, ((), ())), preferred_element_type=f32,
                precision=hi)

        # Manual bf16x3 (see ops/fused_admm.py — the chunk is MXU-pass-
        # bound; Mosaic rejects XLA's HIGH but the 3-pass split by hand
        # lowers fine). Matrix halves split once per grid step; vectors
        # per use. Implemented for the sigma-free path only.
        bf16 = jnp.bfloat16

        def _split(v):
            vh = v.astype(bf16)
            return vh, (v - vh.astype(f32)).astype(bf16)

        def _dot1(a, bb, dims):
            return jax.lax.dot_general(
                a, bb, (dims, ((), ())), preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)

        def dot3s(v_split, m_split, dims):
            vh, vl = v_split
            mh, ml = m_split
            return (_dot1(vh, mh, dims) + _dot1(vh, ml, dims)
                    + _dot1(vl, mh, dims))

        high = dot_precision == "high" and sigma_free
        if high:
            Ga_sp = [_split(Minv[i]) for i in range(L)]
            Gc_sp = [_split(Gc[i]) for i in range(L)]
            A_sp = [_split(A[i]) for i in range(L)]
            C_sp = [_split(C[i]) for i in range(L)]

        def body(_, carry):
            # Stage-interleaved across lanes (same discipline as
            # ops/fused_admm.py): each stage emits L independent dots
            # back-to-back so the MXU pipeline stays fed between the
            # otherwise-dependent (1, n) products of a single lane.
            x, s, y, z = carry
            if high:
                x = tuple(
                    dot3s(_split(rho[i] * b[i] - y[i]), Ga_sp[i],
                          ((1,), (1,)))
                    + dot3s(_split(rho[i] * (d[i] - s[i]) - z[i]), Gc_sp[i],
                            ((1,), (1,)))
                    - g[i]
                    for i in range(L))
            elif sigma_free:
                x = tuple(
                    dot(rho[i] * b[i] - y[i], Minv[i], ((1,), (1,)))
                    + dot(rho[i] * (d[i] - s[i]) - z[i], Gc[i], ((1,), (1,)))
                    - g[i]
                    for i in range(L))
            else:
                r = [(-q[i] + sg * x[i]
                      + dot(rho[i] * b[i] - y[i], A[i], ((1,), (0,)))
                      + dot(rho[i] * (d[i] - s[i]) - z[i], C[i],
                            ((1,), (0,))))
                     for i in range(L)]
                x = [dot(r[i], Minv[i], ((1,), (0,))) for i in range(L)]
                for _i in range(refine):
                    Ax_ = [dot(x[i], A[i], ((1,), (1,))) for i in range(L)]
                    Cx_ = [dot(x[i], C[i], ((1,), (1,))) for i in range(L)]
                    Mx = [(dot(x[i], P_ref[i], ((1,), (0,))) + sg * x[i]
                           + rho[i] * (dot(Ax_[i], A[i], ((1,), (0,)))
                                       + dot(Cx_[i], C[i], ((1,), (0,)))))
                          for i in range(L)]
                    x = [x[i] + dot(r[i] - Mx[i], Minv[i], ((1,), (0,)))
                         for i in range(L)]
                x = tuple(x)
            if high:
                xs = [_split(x[i]) for i in range(L)]
                Cx = [dot3s(xs[i], C_sp[i], ((1,), (1,))) for i in range(L)]
                Ax = [dot3s(xs[i], A_sp[i], ((1,), (1,))) for i in range(L)]
            else:
                Cx = [dot(x[i], C[i], ((1,), (1,))) for i in range(L)]
                Ax = [dot(x[i], A[i], ((1,), (1,))) for i in range(L)]
            s = tuple(jnp.maximum(d[i] - Cx[i] - rho_inv[i] * z[i], 0.0)
                      for i in range(L))
            y = tuple(y[i] + rho[i] * (Ax[i] - b[i]) for i in range(L))
            z = tuple(jnp.maximum(z[i] + rho[i] * (Cx[i] - d[i] + s[i]), 0.0)
                      for i in range(L))
            return x, s, y, z

        x0 = tuple(x_ref[i] for i in range(L))
        s0 = tuple(s_ref[i] for i in range(L))
        y0 = tuple(y_ref[i] for i in range(L))
        z0 = tuple(z_ref[i] for i in range(L))
        x, s, y, z = jax.lax.fori_loop(0, K, body, (x0, s0, y0, z0))
        for i in range(L):
            # Per-lane predication within the pack: frozen lanes pass
            # through bit-identically.
            xo_ref[i] = jnp.where(act[i], x[i], x_ref[i])
            so_ref[i] = jnp.where(act[i], s[i], s_ref[i])
            yo_ref[i] = jnp.where(act[i], y[i], y_ref[i])
            zo_ref[i] = jnp.where(act[i], z[i], z_ref[i])


@functools.partial(jax.jit, static_argnames=("K", "sigma", "refine", "lanes",
                                             "sigma_free", "dot_precision",
                                             "interpret"))
def fused_proxqp_chunk(Minv, A, C, P, q, b, d, x, s, y, z, rho, active,
                       *, K: int, sigma: float, refine: int = 0,
                       lanes: int = 1,
                       sigma_free: bool = False, Gc=None, g=None,
                       dot_precision: str = "highest",
                       interpret: bool = False):
    """Run K fused prox-ALM iterations for every active lane.

    Shapes: Minv/P (B, n, n); A (B, me, n); C (B, mi, n); q/x (B, n);
    b/y (B, me); d/s/z (B, mi); rho (B,); active (B,) bool. P is only an
    operand when refine > 0.

    With ``sigma_free``: Minv instead carries Ga = M^{-1}A' (B, n, me),
    plus ``Gc`` = M^{-1}C' (B, n, mi) and ``g`` = M^{-1}q (B, n) — the
    x-update is Ga(rho b - y) + Gc(rho(d - s) - z) - g (exact ALM; see
    ProxQPSettings.sigma_free_rhs). P/q are unused; refine must be 0.
    """
    B, n = x.shape
    me = b.shape[-1]
    mi = d.shape[-1]
    if sigma_free and (refine > 0 or Gc is None or g is None):
        raise ValueError("sigma_free needs Gc and g and excludes refine > 0")
    if n % 128 or me % 128 or mi % 128 or me == 0 or mi == 0:
        raise ValueError(
            f"fused proxqp chunk needs n, n_eq, n_ineq nonzero multiples of "
            f"128; got {(n, me, mi)}")
    if B % lanes:
        raise ValueError(f"batch {B} not divisible by lanes={lanes}")
    if dot_precision == "high" and not sigma_free:
        raise ValueError("dot_precision='high' (manual bf16x3) is "
                         "implemented for the sigma-free path only")
    f32 = jnp.float32
    kernel = functools.partial(_chunk_kernel, K=K, sigma=sigma, refine=refine,
                               lanes=lanes, sigma_free=sigma_free,
                               dot_precision=dot_precision)

    mat = lambda r, c: pl.BlockSpec((lanes, r, c), lambda g, *_: (g, 0, 0),
                                    memory_space=pltpu.VMEM)
    vec = lambda c: pl.BlockSpec((lanes, 1, c), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # rho and active, read per program_id
            grid=(B // lanes,),
            in_specs=(
                [mat(n, me) if sigma_free else mat(n, n),
                 mat(me, n), mat(mi, n)]
                + ([mat(n, mi), vec(n)] if sigma_free else [])
                + ([mat(n, n)] if refine > 0 else [])
                + ([] if sigma_free else [vec(n)])
                + [vec(me), vec(mi),
                   vec(n), vec(mi), vec(me), vec(mi)]
            ),
            out_specs=[vec(n), vec(mi), vec(me), vec(mi)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, n), f32),
            jax.ShapeDtypeStruct((B, 1, mi), f32),
            jax.ShapeDtypeStruct((B, 1, me), f32),
            jax.ShapeDtypeStruct((B, 1, mi), f32),
        ],
        interpret=interpret,
    )(
        rho.astype(f32), active.astype(jnp.int32),
        Minv.astype(f32), A.astype(f32), C.astype(f32),
        *(([Gc.astype(f32), g.astype(f32)[:, None, :]] if sigma_free
           else [])),
        *(([P.astype(f32)]) if refine > 0 else []),
        *(([] if sigma_free else [q.astype(f32)[:, None, :]])),
        b.astype(f32)[:, None, :],
        d.astype(f32)[:, None, :],
        x.astype(f32)[:, None, :], s.astype(f32)[:, None, :],
        y.astype(f32)[:, None, :], z.astype(f32)[:, None, :],
    )
    return tuple(o[:, 0, :] for o in out)
