"""Parameter-file loading (ref: src/parameters.cpp)."""

import math

import pytest

from tol_tpu.io.params import (
    assets_root,
    load_aircraft,
    load_gains,
    load_limits,
    load_solver_dims,
    read_param_file,
)

ROOT = assets_root()


def test_tempest_aircraft_values():
    ac = load_aircraft("tempest", ROOT)
    assert ac.mm == pytest.approx(6.1228)
    assert ac.SS == pytest.approx(0.6316)
    assert ac.AR == pytest.approx(16.4457)
    assert ac.Cd0 == pytest.approx(0.03)
    assert ac.CLmin == pytest.approx(-0.45)
    assert ac.CLmax == pytest.approx(0.9)
    # deg -> rad conversions (src/parameters.cpp:56-60)
    assert ac.phimax == pytest.approx(20.0 * math.pi / 180)
    assert ac.gammamax == pytest.approx(20.0 * math.pi / 180)
    assert ac.phidotmax == pytest.approx(20.0 * math.pi / 180)
    assert ac.Vamin == 12.0 and ac.Vamax == 30.0
    assert ac.Tmin == 0.0 and ac.Tmax == pytest.approx(56.33)


def test_all_airframes_load():
    for name in ["skywalker", "tempest", "tempest_eric", "tempest_wences", "tempest_will"]:
        ac = load_aircraft(name, ROOT)
        assert ac.mm > 0 and ac.SS > 0
    wences = load_aircraft("tempest_wences", ROOT)
    assert wences.Tmax == pytest.approx(1e20)


def test_mission_params():
    g = load_gains("S10", ROOT)
    assert (g.kT, g.kp, g.kv, g.ka, g.kdt) == (0.0, 8.0, 0.0, 0.0, 1.0)
    g7 = load_gains("G7", ROOT)
    assert (g7.kT, g7.kp) == (100.0, 0.0)

    lm = load_limits("S10", ROOT)
    assert lm.dtmin == 0.05 and lm.dtmax == 0.4 and lm.zmax == 0.0
    lm7 = load_limits("G7", ROOT)
    assert lm7.dtmin == 0.01 and lm7.dtmax == 2.0

    sn = load_solver_dims("S10", ROOT)
    assert (sn.ts, sn.numinp, sn.numstates, sn.numbounds) == (100, 11, 8, 11)
    assert sn.opt_tol == 1e-3 and sn.feas_tol == 1e-5
    sn7 = load_solver_dims("G7", ROOT)
    assert sn7.numbounds == 12 and sn7.opt_tol == 1e-4


def test_reference_tree_compatible(tmp_path):
    """The reader tolerates the reference's .param quirks: literal \\n text in
    comments (aircraft/tempest.param:2) and '//'-style comment heads."""
    d = tmp_path / "aircraft"
    d.mkdir()
    (d / "quirky.param").write_text(
        "//Header comment line\n"
        "6.122800\\n  // Mass (kg)\n"
        "3.222900\\n\t// Wing span (m)\n"
        + "\n".join(f"{x}" for x in [0.6316, 0.9693, 16.4457, 0.03, -0.45,
                                     0.9, 20.0, 12.0, 30.0, 20.0, 20.0, 0.0, 56.33])
        + "\n")
    ac = load_aircraft("quirky", str(tmp_path))
    assert ac.mm == pytest.approx(6.1228)
    assert ac.b == pytest.approx(3.2229)


def test_wrong_count_raises(tmp_path):
    d = tmp_path / "aircraft"
    d.mkdir()
    (d / "short.param").write_text("1.0\n2.0\n")
    with pytest.raises(ValueError):
        load_aircraft("short", str(tmp_path))


def test_reads_reference_files_if_present():
    """Drop-in compatibility with an actual reference checkout."""
    import os
    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "aircraft")):
        pytest.skip("reference tree not mounted")
    ours = load_aircraft("tempest", ROOT)
    theirs = load_aircraft("tempest", ref)
    assert ours == theirs
    assert load_gains("S10", ROOT) == load_gains("S10", ref)
    assert load_limits("G7", ROOT) == load_limits("G7", ref)
    assert load_solver_dims("S10", ROOT) == load_solver_dims("S10", ref)
