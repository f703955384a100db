"""Sparse (BCOO) QP container for the large-problem matrix-free path.

The reference routes large/sparse problems to PCG instead of factorizing
(`SolveQuadraticProgram.m:190-204`) and leans on MKL sparse matvecs
(`SolveQuadraticProgram.jl:5`). The TPU analogue: store P and A as
`jax.experimental.sparse` BCOO, never materialize P + sigma*I + rho*A'A, and
drive the same ADMM core through the shared operator protocol (matvec_P /
matvec_A / matvec_At / diag_*) with the CG KKT backend.

SparseQP is unbatched by design: the fleet axis is for dense padded
instances; a single huge sparse QP is scaled via consensus block-splitting
(parallel/consensus.py) instead.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SparseQP:
    """Box-constrained QP with BCOO matrices (single instance, no batch).

    ``At`` is the pre-transposed constraint matrix (BCOO transposition is a
    host-side one-time cost; doing it per-iteration would re-sort indices).
    ``dP``/``dAtA`` are precomputed diagonals for the Jacobi preconditioner.
    """

    P: jsparse.BCOO    # (n, n)
    q: jax.Array       # (n,)
    A: jsparse.BCOO    # (m, n)
    At: jsparse.BCOO   # (n, m)
    l: jax.Array       # (m,)
    u: jax.Array       # (m,)
    dP: jax.Array      # (n,) diag(P)
    dAtA: jax.Array    # (n,) diag(A'A)

    @property
    def n(self) -> int:
        return self.P.shape[-1]

    @property
    def m(self) -> int:
        return self.A.shape[-2]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return ()

    @property
    def dtype(self):
        return self.q.dtype

    @property
    def is_dense(self) -> bool:
        return False

    # -- operator protocol --

    def matvec_P(self, v: jax.Array) -> jax.Array:
        return self.P @ v

    def matvec_A(self, v: jax.Array) -> jax.Array:
        return self.A @ v

    def matvec_At(self, v: jax.Array) -> jax.Array:
        return self.At @ v

    def diag_P(self) -> jax.Array:
        return self.dP

    def diag_AtA(self) -> jax.Array:
        return self.dAtA

    def diag_AtWA(self, w: jax.Array) -> jax.Array:
        """diag(A' diag(w) A) = (At elementwise-squared) @ w."""
        At2 = jsparse.BCOO((self.At.data ** 2, self.At.indices),
                           shape=self.At.shape)
        return At2 @ w

    def objective(self, x: jax.Array) -> jax.Array:
        return 0.5 * jnp.sum(x * self.matvec_P(x), axis=-1) + jnp.sum(self.q * x, axis=-1)


def make_sparse_qp(P, q, A, l, u, dtype=np.float32) -> SparseQP:
    """Build a SparseQP from scipy sparse matrices (host-side)."""
    import scipy.sparse as sp

    P = sp.csr_matrix(P).astype(dtype)
    A = sp.csr_matrix(A).astype(dtype)
    q = np.asarray(q, dtype)
    l = np.asarray(l, dtype)
    u = np.asarray(u, dtype)
    dP = np.asarray(P.diagonal(), dtype)
    dAtA = np.asarray(A.multiply(A).sum(axis=0)).ravel().astype(dtype)

    def to_bcoo(M):
        coo = M.tocoo()
        indices = jnp.asarray(np.stack([coo.row, coo.col], axis=1))
        return jsparse.BCOO((jnp.asarray(coo.data), indices), shape=M.shape)

    return SparseQP(
        P=to_bcoo(P), q=jnp.asarray(q), A=to_bcoo(A), At=to_bcoo(A.T.tocsr()),
        l=jnp.asarray(l), u=jnp.asarray(u),
        dP=jnp.asarray(dP), dAtA=jnp.asarray(dAtA))
