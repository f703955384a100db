"""Pallas TPU kernel: fused normal-matrix build + SPD inversion per lane.

The refactorization path — M = P + sigma*I + rho*A'A followed by M^{-1} — is
the dominant per-solve cost of the batched direct backend (~95% at B=2048,
n=512). Through XLA it runs as ~30 separate batched matmuls, each making a
full HBM round trip (batched matmuls on this chip are HBM-bound, so the
round trips, not FLOPs, set the time).

This kernel does the whole thing per lane inside VMEM: DMA P (n^2) and A
(mn) in once, build M with one MXU gram product, invert it in place with a
blocked **sweep operator** (unpivoted block Gauss-Jordan — numerically fine
for SPD; sweeping every pivot block of [[D, B'], [B, C]] maps it to
[[-D^{-1}, D^{-1}B'], [BD^{-1}, C - BD^{-1}B']], and after all T blocks the
buffer holds -M^{-1}), and write M^{-1} (n^2) out. HBM traffic drops to the
information-theoretic floor (read P, A; write M^{-1}).

The 128x128 pivot-block inverses use the same sweep at scalar granularity —
128 sequential steps of rank-1 VPU updates; everything else is MXU matmuls.
n and m must be multiples of 128 (pad_qp).

Performance status (TPU v5e, B=2048, n=512, m=256): 316 ms vs 294 ms for the
XLA build + blocked-Schur path — numerically equivalent (3e-6 rel), not yet
faster. Measured breakdown: gram+IO 44 ms, level matmuls +27 ms, scalar
sweeps +240 ms; the sweep cost is per-sequential-step loop overhead
(~0.2 us x 512 steps x 2048 lanes), not arithmetic. Known fix for a future
round: stack L lanes per grid program (scratch (L, n, n)) so one step's
overhead covers L lanes; needs the manual-DMA (pl.ANY inputs) layout to fit
VMEM. The solver currently keeps the XLA path (ops/linalg.spd_inverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # pivot block size (MXU tile)
_HI = jax.lax.Precision.HIGHEST


def _sweep_inverse_block(D):
    """Inverse of an SPD (NB, NB) block via NB scalar sweep steps (VPU).

    Row/column/pivot extraction is mask-based (Mosaic has no dynamic_slice
    on values; a cyclic-roll formulation with static slices was measured
    slower — full-matrix rolls cost more than the masked reductions). The
    sequential-step loop overhead (~0.2 us/step) is the kernel's current
    bottleneck; amortizing it by stacking several lanes per program is the
    known next optimization (see module docstring).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)

    def step(j, S):
        row_m = rows == j
        col_m = cols == j
        d = jnp.sum(jnp.where(row_m & col_m, S, 0.0))
        dinv = 1.0 / d
        c = jnp.sum(jnp.where(col_m, S, 0.0), axis=1, keepdims=True)  # (NB, 1)
        r = jnp.sum(jnp.where(row_m, S, 0.0), axis=0, keepdims=True)  # (1, NB)
        S = S - (c * dinv) * r
        S = jnp.where(col_m, c * dinv, S)
        S = jnp.where(row_m, r * dinv, S)
        S = jnp.where(row_m & col_m, -dinv, S)
        return S

    S = jax.lax.fori_loop(0, NB, step, D)
    return -S


def _normal_inverse_kernel(rho_ref, P_ref, A_ref, out_ref, W_ref,
                           *, sigma: float, n: int, m: int):
    f32 = jnp.float32
    rho = rho_ref[pl.program_id(0)]
    A = A_ref[0]
    # M = P + sigma*I + rho*A'A, built straight into the VMEM scratch.
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(f32)
    AtA = jax.lax.dot_general(
        A, A, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=_HI)
    W_ref[:] = P_ref[0] + sigma * eye + rho * AtA

    # Static unroll over pivot blocks: offsets become compile-time constants,
    # so all big-slice reads/writes are static (no dynamic lane shifts).
    for k in range(n // NB):
        off = k * NB
        D = W_ref[off:off + NB, off:off + NB]
        Dinv = _sweep_inverse_block(D)
        C = W_ref[:, off:off + NB]                         # (n, NB) original
        R = W_ref[off:off + NB, :]                         # (NB, n) original
        CDinv = jax.lax.dot_general(
            C, Dinv, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI)
        DinvR = jax.lax.dot_general(
            Dinv, R, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI)
        W_ref[:] = W_ref[:] - jax.lax.dot_general(
            CDinv, R, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=_HI)
        W_ref[:, off:off + NB] = CDinv
        W_ref[off:off + NB, :] = DinvR
        W_ref[off:off + NB, off:off + NB] = -Dinv
    out_ref[0] = -W_ref[:]


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def pallas_normal_inverse(P, A, rho, *, sigma: float, interpret: bool = False):
    """(P + sigma*I + rho*A'A)^{-1} per lane, fused in VMEM.

    P: (B, n, n), A: (B, m, n), rho: (B,). n, m multiples of 128.
    """
    B, n = P.shape[0], P.shape[-1]
    m = A.shape[-2]
    if n % NB or m % NB:
        raise ValueError(f"n, m must be multiples of {NB}; got {(n, m)}")
    f32 = jnp.float32
    kernel = functools.partial(_normal_inverse_kernel, sigma=sigma, n=n, m=m)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n, n), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, n), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, n), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, n), f32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, n), f32),
        interpret=interpret,
    )(rho.astype(f32), P.astype(f32), A.astype(f32))
    return out
