"""History recording in all solve modes + the diagnostic report generator
(VERDICT r2 item 6: segmented/block-split/prox-ALM observability)."""

import dataclasses

import numpy as np
import pytest

import quadraticprogramsolver_tpu as qps
from quadraticprogramsolver_tpu.core.settings import ProxQPSettings
from quadraticprogramsolver_tpu.models import proxqp
from quadraticprogramsolver_tpu.utils.diagnostics import (
    constraint_map,
    save_report_png,
    solve_report,
)

SETTINGS = qps.Settings(max_iterations=500, eps_abs=1e-8, eps_rel=1e-8,
                        rho=0.1, adaptive_rho=True, record_history=True,
                        check_interval=25)


def _problem(seed=1, n=40):
    data = qps.generate_random_qp(qps.ProblemClass.RANDOM_QP, n, seed=seed)
    return data.dense()


def test_segmented_history_matches_monolithic():
    arrays = _problem()
    from quadraticprogramsolver_tpu.models.admm import solve_segmented

    qp = qps.make_qp(*arrays, dtype=np.float64)
    mono = qps.solve_jit(qp, SETTINGS)
    seg = solve_segmented(qp, SETTINGS, segment_iterations=50)
    h_m, h_s = mono.info.history, seg.info.history
    assert h_s is not None
    assert h_s["res_prim"].shape == h_m["res_prim"].shape
    # The stitched trace agrees with the monolithic one on every check that
    # ran in both (identical math; a segment boundary is a check boundary).
    a = np.asarray(h_m["res_prim"])
    b = np.asarray(h_s["res_prim"])
    both = np.isfinite(a) & np.isfinite(b)
    assert both.sum() >= 2
    np.testing.assert_allclose(a[both], b[both], rtol=1e-6)


def test_proxqp_history_recorded():
    rng = np.random.default_rng(0)
    n, me, mi = 24, 6, 10
    G = rng.standard_normal((n, n))
    prob = qps.make_proxqp(
        P=G @ G.T + 0.1 * np.eye(n), q=rng.standard_normal(n),
        A=rng.standard_normal((me, n)), b=rng.standard_normal(me),
        C=rng.standard_normal((mi, n)), d=rng.standard_normal(mi),
        dtype=np.float64)
    st = ProxQPSettings(max_iterations=500, check_interval=25,
                        record_history=True)
    sol = proxqp.solve_jit(prob, st)
    h = sol.info.history
    assert h is not None and h["res_prim"].shape[0] == st.num_checks
    rp = np.asarray(h["res_prim"])
    valid = np.isfinite(rp)
    assert valid.any()
    # The last recorded residual equals the reported one.
    last = rp[valid][-1]
    np.testing.assert_allclose(last, float(sol.info.res_prim), rtol=1e-6)
    # Segmented prox-ALM stitches the same trace.
    seg = proxqp.solve_segmented(prob, st, segment_iterations=100)
    hs = seg.info.history
    assert hs is not None and hs["res_prim"].shape == h["res_prim"].shape
    a, b = rp, np.asarray(hs["res_prim"])
    both = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_allclose(a[both], b[both], rtol=1e-6)


def test_block_split_history():
    import jax
    from jax.sharding import Mesh

    from quadraticprogramsolver_tpu.parallel.consensus import (
        solve_block_split, solve_fleet_block_split)

    arrays = _problem(seed=2, n=24)
    qp = qps.make_qp(*arrays, dtype=np.float64)
    st = dataclasses.replace(SETTINGS, max_iterations=250)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("blocks",))
    sol = solve_block_split(qp, st, mesh)
    h = sol.info.history
    assert h is not None
    assert h["res_prim"].shape == (st.num_checks,)
    rp = np.asarray(h["res_prim"])
    assert np.isfinite(rp).any()
    # ...and it matches the single-device trace check-for-check.
    ref = qps.solve_jit(qp, st)
    a = np.asarray(ref.info.history["res_prim"])
    both = np.isfinite(a) & np.isfinite(rp)
    np.testing.assert_allclose(rp[both], a[both], rtol=1e-5)

    # Fleet x blocks on a 2-D mesh: history carries the fleet axis.
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 4, 24, seed=0,
                               dtype=np.float64)
    mesh2 = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                 ("qp", "blocks"))
    fsol = solve_fleet_block_split(fleet, st, mesh2)
    assert fsol.info.history["res_prim"].shape == (st.num_checks, 4)


def test_solve_report_text_and_png(tmp_path):
    arrays = _problem()
    qp = qps.make_qp(*arrays, dtype=np.float64)
    sol = qps.solve_jit(qp, SETTINGS)
    rep = solve_report(arrays, sol, check_interval=SETTINGS.check_interval)
    assert "SOLVED" in rep
    assert "constraint map" in rep
    assert "residual trace" in rep
    cm = constraint_map(arrays, np.asarray(sol.x))
    # A solved QP violates nothing beyond tolerance.
    assert cm["min_low_gap"] > -1e-5 and cm["min_up_gap"] > -1e-5
    png = save_report_png(arrays, sol, str(tmp_path / "rep.png"),
                          check_interval=SETTINGS.check_interval)
    if png is not None:
        import os

        assert os.path.getsize(png) > 1000


def test_fleet_report_lane_selection():
    fleet = qps.generate_batch(qps.ProblemClass.RANDOM_QP, 3, 30, seed=0,
                               dtype=np.float64)
    sol = qps.solve_jit(fleet, SETTINGS)
    arrays = tuple(np.asarray(v)[1] for v in
                   (fleet.P, fleet.q, fleet.A, fleet.l, fleet.u))
    rep = solve_report(arrays, sol, lane=1,
                       check_interval=SETTINGS.check_interval)
    assert "status" in rep and "residual trace" in rep
