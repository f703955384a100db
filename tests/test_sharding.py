"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 plan:
N-device CPU-simulated mesh tests — a capability the reference has no
analogue of)."""

import sys

import jax
import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.parallel.mesh import (
    make_fleet_mesh,
    shard_fleet,
    solve_fleet,
)

SETTINGS = qps.Settings(max_iterations=2000, eps_abs=1e-8, eps_rel=1e-8, rho=0.1)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_fleet_matches_single_device():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=16,
                            num_elements=20, seed=0, dtype=np.float64)
    plain = qps.solve_jit(qp, SETTINGS)
    mesh = make_fleet_mesh()
    sharded = solve_fleet(qp, SETTINGS, mesh)
    dev = np.abs(np.asarray(plain.x) - np.asarray(sharded.x)).max()
    assert dev <= 1e-10, dev
    assert np.array_equal(np.asarray(plain.info.status),
                          np.asarray(sharded.info.status))


def test_shard_placement():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=8,
                            num_elements=10, seed=1)
    mesh = make_fleet_mesh()
    sq = shard_fleet(qp, mesh)
    # Each leaf's leading axis is split 8 ways.
    shard_shapes = {s.data.shape for s in sq.P.addressable_shards}
    assert shard_shapes == {(1, 10, 10)}


def test_indivisible_fleet_rejected():
    qp = qps.generate_batch(qps.ProblemClass.RANDOM_QP, batch=6,
                            num_elements=10, seed=1)
    with pytest.raises(ValueError, match="not divisible"):
        shard_fleet(qp, make_fleet_mesh())


def test_graft_entry_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
