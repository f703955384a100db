"""Device-mesh utilities and fleet-sharded solving.

The reference is single-process (SURVEY.md §2: no distributed components).
On TPU the first-class scaling axis is **data parallelism over QP
instances**: a fleet of independent QPs is sharded over the mesh's ``qp``
axis with `NamedSharding`, and the one jitted solve runs SPMD — XLA inserts
the only collective needed (the all-reduce behind ``jnp.any(status ==
RUNNING)`` in the while-loop predicate) over ICI.

Consensus-ADMM block splitting of a single large QP (the model-parallel
analogue) lives in parallel/consensus.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import QP
from ..core.settings import Settings
from ..core.state import Solution
from ..models.admm import solve_jit

BATCH_AXIS = "qp"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (one JAX process per host of a pod slice).

    Thin wrapper over `jax.distributed.initialize`; with no arguments the
    cluster environment (TPU metadata) is auto-detected. After this,
    `jax.devices()` spans the whole slice and the fleet/consensus solvers
    shard across hosts with the same code — collectives ride ICI within a
    slice and DCN across hosts, per the SURVEY §5 distributed-backend plan.
    No-ops when already initialized (safe to call from every entry point).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_fleet_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices for fleet data-parallelism."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def shard_fleet(qp: QP, mesh: Mesh, axis_name: str = BATCH_AXIS) -> QP:
    """Place a batched QP with its leading (fleet) axis split over the mesh."""
    if not qp.batch_shape:
        raise ValueError("shard_fleet requires a batched QP (leading fleet axis)")
    n_dev = mesh.shape[axis_name]
    if qp.batch_shape[0] % n_dev != 0:
        raise ValueError(
            f"fleet size {qp.batch_shape[0]} not divisible by mesh axis {n_dev}")

    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, qp)


def solve_fleet(qp: QP, settings: Settings, mesh: Mesh | None = None,
                axis_name: str = BATCH_AXIS) -> Solution:
    """Shard the fleet over the mesh and run the jitted batched solve.

    The solver body is written in batched form, so under GSPMD each device
    factors and iterates only its shard; the convergence predicate reduces
    across devices automatically.
    """
    mesh = make_fleet_mesh() if mesh is None else mesh
    qp = shard_fleet(qp, mesh, axis_name)
    # Module-level jit wrapper: a per-call jax.jit would own a fresh trace
    # cache and re-trace/compile on every call.
    return solve_jit(qp, settings)
