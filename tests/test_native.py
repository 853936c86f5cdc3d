"""Native library (C++) round-trip tests."""

import numpy as np
import pytest

from tol_tpu.io.native import (
    TelemetryLogger,
    load_library,
    read_params_native,
    read_telemetry,
    read_wind_grid,
    write_wind_grid,
)
from tol_tpu.io.params import assets_root, read_param_file


def test_library_builds():
    assert load_library() is not None, "g++ build of native/tolnative.cpp failed"


def test_native_param_parser_matches_python():
    import os
    for rel in ["aircraft/tempest.param", "problems/S10/gains.param",
                "problems/G7/snopt.param"]:
        path = os.path.join(assets_root(), rel)
        py = read_param_file(path)
        nat = read_params_native(path)
        assert nat is not None
        np.testing.assert_allclose(nat, py)


def test_native_parses_reference_quirks(tmp_path):
    p = tmp_path / "quirky.param"
    p.write_text("//header\n6.1228\\n // mass\n-0.45   / min CL\nnotanumber\n1e20\n")
    vals = read_params_native(str(p))
    np.testing.assert_allclose(vals, [6.1228, -0.45, 1e20])


def test_wind_grid_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    u = rng.normal(size=(4, 5, 3)).astype(np.float32)
    v = rng.normal(size=(4, 5, 3)).astype(np.float32)
    w = rng.normal(size=(4, 5, 3)).astype(np.float32)
    path = str(tmp_path / "grid.tolw")
    write_wind_grid(path, [100.0, 200.0, 0.0], [150.0, 150.0, 150.0], u, v, w)
    g = read_wind_grid(path)
    np.testing.assert_allclose(np.asarray(g.origin), [100.0, 200.0, 0.0])
    np.testing.assert_allclose(np.asarray(g.spacing), [150.0, 150.0, 150.0])
    np.testing.assert_allclose(np.asarray(g.v), v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.u), u, rtol=1e-6)


def test_telemetry_logger_roundtrip(tmp_path):
    path = str(tmp_path / "telemetry.bin")
    lg = TelemetryLogger(path)
    lg.append(1, [1.0, 2.0, 3.0])
    lg.append(7, np.arange(10.0))
    lg.close()
    recs = read_telemetry(path)
    assert [t for t, _ in recs] == [1, 7]
    np.testing.assert_allclose(recs[0][1], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(recs[1][1], np.arange(10.0))
