"""Auxiliary subsystems: console, viz, profiling, checkpoint, results IO."""

import json
import os

import numpy as np
import pytest

from tol_tpu.api import default_goal, make_config
from tol_tpu.io.results import read_results_json, results_document, write_results_json
from tol_tpu.mission import FakeAutopilot, Mission, MissionConfig
from tol_tpu.mission.console import Console
from tol_tpu.utils.checkpoint import load_solution, save_solution
from tol_tpu.utils.profiling import stage_timer
from tests.test_mission import fake_leg_solver


def test_results_json_schema(tmp_path):
    """Document matches the reference snopt_results.json schema
    (src/problem.cpp:1247-1365) so MATLAB tooling/MSL can consume it."""
    cfg = make_config("S10", "tempest", ts=4)
    goal = default_goal("S10")
    Z = np.arange(5 * 11, dtype=float).reshape(5, 11)
    doc = results_document(cfg, goal, Z, 0.25, 1.5, aircraft_name="tempest")
    p = tmp_path / "snopt_results.json"
    write_results_json(str(p), doc)
    back = read_results_json(str(p))
    assert back["problem"] == "S10"
    assert back["FinalCost"] == 1.5 and back["dt"] == 0.25
    for sec, keys in [
        ("args", ["east", "north", "up", "xg", "yg", "zg", "rd", "aircraft", "problem"]),
        ("trajectory", ["time", "x", "y", "z", "Va", "gam", "chi", "phi",
                        "CL", "dphi", "dCL", "T"]),
        ("aircraft", ["name", "mass", "b", "S", "e", "AR", "Cd0", "CLmin",
                      "CLmax", "phimax", "Vamin", "Vamax", "gammamax",
                      "dphimax", "Tmin", "Tmax"]),
        ("gains", ["kT", "kp", "kv", "ka", "kdt"]),
        ("limits", ["dtmin", "dtmax", "xmin", "xmax", "ymin", "ymax", "zmin", "zmax"]),
        ("snopt", ["ts", "numinp", "numstates", "numbounds", "opt_tol", "feas_tol"]),
    ]:
        assert set(keys) <= set(back[sec].keys()), sec
    assert len(back["trajectory"]["x"]) == 5
    # time advances by dt (src/problem.cpp:1276-1291)
    np.testing.assert_allclose(np.diff(back["trajectory"]["time"]), 0.25)


def test_console_auto_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    outputs = []
    m = Mission(MissionConfig(max_legs=8), FakeAutopilot(), leg_solver=fake_leg_solver)
    c = Console(mission=m, input_fn=lambda p: "5",
                print_fn=outputs.append, autostack=[2, 1])
    c.run()
    text = "\n".join(outputs)
    assert "waypoint count" in text          # option 2 ran after option 1
    assert len(m.trajectory) > 0
    assert os.path.exists("trajectory_backup.json")


def test_console_set_datum():
    answers = iter(["40.5", "-105.5", "1700"])
    m = Mission(MissionConfig(), FakeAutopilot(), leg_solver=fake_leg_solver)
    c = Console(mission=m, input_fn=lambda p: next(answers), print_fn=lambda s: None)
    assert c.step("4")
    assert m.cfg.datum_lat == 40.5 and m.trajectory.datum_lon == -105.5


def test_viz_smoke(tmp_path):
    pytest.importorskip("matplotlib")
    from tol_tpu.models.wind import WindConfig
    from tol_tpu.viz import plot_results, plot_wind_field

    cfg = make_config("S10", "tempest", ts=8)
    doc = fake_leg_solver("S10", default_goal("S10"), n=9)
    doc["args"] = {"xg": -100.0, "yg": 0.0, "zg": 0.0}
    doc["problem"] = "S10"; doc["FinalCost"] = 1.0
    p1 = tmp_path / "traj.png"
    plot_results(doc, str(p1))
    assert p1.stat().st_size > 10000
    p2 = tmp_path / "wind.png"
    plot_wind_field(WindConfig(model=1), str(p2), n=8)
    assert p2.stat().st_size > 5000


def test_viz_movie_trace_interp(tmp_path):
    """movie.m / ReadLog.m / interpolatewind.m equivalents (VERDICT #10)."""
    pytest.importorskip("matplotlib")
    import numpy as _np

    from tol_tpu.models.wind import WindConfig
    from tol_tpu.viz import (animate_trajectory, interpolate_wind_along,
                             plot_solver_trace)

    doc = fake_leg_solver("S10", default_goal("S10"), n=9)
    doc["trajectory"]["gam"] = [0.1] * 9
    doc["trajectory"]["phi"] = [0.2] * 9
    p = tmp_path / "movie.gif"
    animate_trajectory(doc, str(p), stride=3)
    assert p.stat().st_size > 5000

    # synthetic batched trace tuple (kkt, mu, gamma, dw, viol, f)
    it = _np.arange(30, dtype=float)
    mk = lambda s: _np.exp(-s * it)[None, :].repeat(4, axis=0)
    p2 = tmp_path / "trace.png"
    plot_solver_trace((mk(0.3), mk(0.1), mk(0.05), mk(0.4), mk(0.2),
                       1.0 + mk(0.3)), str(p2), tol=1e-3)
    assert p2.stat().st_size > 10000

    t, W = interpolate_wind_along(doc, WindConfig(model=1),
                                  str(tmp_path / "wind_along.png"))
    assert W.shape == (9, 3)
    assert (tmp_path / "wind_along.png").stat().st_size > 5000


def test_write_results_txt(tmp_path):
    """writeTXT parity (src/problem.cpp:1371-1418)."""
    from tol_tpu.io.results import write_results_txt

    doc = fake_leg_solver("S10", default_goal("S10"), n=5)
    doc["problem"] = "S10"
    doc["FinalCost"] = 2.5
    p = tmp_path / "snopt_output.txt"
    write_results_txt(str(p), doc)
    lines = p.read_text().splitlines()
    assert lines[0].startswith("% SNOPT Output")
    assert "ProblemS10" in lines[3]
    rows = [l.split("\t") for l in lines[4:]]
    assert len(rows) == 5
    first = [float(c) for c in rows[0] if c.strip()]
    assert len(first) == 14        # time + 11 states + dt + FinalCost
    assert first[0] == 0.0 and first[-1] == 2.5
    # time accumulates by dt
    second = [float(c) for c in rows[1] if c.strip()]
    assert second[0] == pytest.approx(doc["dt"])


def test_checkpoint_roundtrip(tmp_path):
    v = np.random.default_rng(0).normal(size=50)
    y = np.random.default_rng(1).normal(size=20)
    p = str(tmp_path / "sol.npz")
    save_solution(p, v, y, meta={"gamma": 0.01})
    v2, y2, meta = load_solution(p)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(y, y2)
    assert float(meta["gamma"]) == 0.01


def test_stage_timer():
    t = stage_timer()
    with t("a"):
        pass
    with t("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()
