"""Storm-field (wind model 3) end-to-end: netCDF import -> TOLWGRID ->
gridded solve.

The reference's model 3 reads a MongoDB dump of netCDF storm data
(src/problem.cpp:371-469, matlab/scripts/read_netCDF.m) and trilinearly
interpolates the v component (src/problem.cpp:544-693).  Here the full
pipeline runs against a synthetic NetCDF-3 file, and the solve-level check
exploits that trilinear interpolation is EXACT on a linear field: a grid
encoding the model-1 boundary layer must reproduce the model-1 solve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tol_tpu.api import make_problem
from tol_tpu.io.native import read_wind_grid, write_wind_grid
from tol_tpu.io.storm import SENTINEL, grid_from_arrays, import_netcdf_storm
from tol_tpu.models.wind import WindConfig, wind_ned
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

VREF, HREF = 2.4, 10.0
UP0 = 200.0


def _boundary_layer_grid(nx=6, ny=6, nz=5, spacing=150.0):
    """Grid whose v component encodes v = -Vref * z_local / href."""
    origin = (17000.0, 25500.0, 0.0)
    zs = origin[2] + spacing * np.arange(nz)
    v = np.broadcast_to(-VREF * (zs - UP0) / HREF, (nx, ny, nz))
    u = np.zeros((nx, ny, nz))
    w = np.zeros((nx, ny, nz))
    return u, v, w, origin, (spacing, spacing, spacing)


def _write_netcdf(path, u, v, w, origin, spacing):
    from scipy.io import netcdf_file

    nx, ny, nz = u.shape
    with netcdf_file(path, "w") as nc:
        nc.createDimension("x", nx)
        nc.createDimension("y", ny)
        nc.createDimension("z", nz)
        for name, n, o, s in (("x", nx, origin[0], spacing[0]),
                              ("y", ny, origin[1], spacing[1]),
                              ("z", nz, origin[2], spacing[2])):
            var = nc.createVariable(name, "d", (name,))
            var[:] = o + s * np.arange(n)
        for name, data in (("u", u), ("v", v), ("w", w)):
            var = nc.createVariable(name, "d", ("x", "y", "z"))
            var[:] = data


def test_netcdf_import_roundtrip(tmp_path):
    u, v, w, origin, spacing = _boundary_layer_grid()
    # poison some samples with the Mongo sentinel (src/problem.cpp:461-466)
    v = np.array(v)
    v[0, 0, 0] = SENTINEL
    nc_path = str(tmp_path / "storm.nc")
    bin_path = str(tmp_path / "storm.tolwgrid")
    _write_netcdf(nc_path, u, v, w, origin, spacing)
    grid = import_netcdf_storm(nc_path, out_path=bin_path)
    assert float(grid.v[0, 0, 0]) == 0.0            # sentinel -> calm
    assert float(grid.spacing[0]) == pytest.approx(150.0)
    # binary cache round-trip
    grid2 = read_wind_grid(bin_path)
    np.testing.assert_allclose(np.asarray(grid2.v), np.asarray(grid.v))
    np.testing.assert_allclose(np.asarray(grid2.origin),
                               np.asarray(grid.origin))


def test_model3_matches_model1_field():
    """Trilinear interp of the linear boundary layer == analytic model 1
    (the linear-field exactness property the reference's shape functions
    share, src/problem.cpp:617-635)."""
    u, v, w, origin, spacing = _boundary_layer_grid()
    grid = grid_from_arrays(u, v, w, origin, spacing)
    cfg3 = WindConfig(model=3, east0=17400.0, north0=25800.0, up0=UP0,
                      grid=grid)
    cfg1 = WindConfig(model=1, vref=VREF, href=HREF, up0=UP0)
    for p in ([0.0, 0.0, -40.0], [100.0, -200.0, -120.0], [-50.0, 80.0, -5.0]):
        p = jnp.asarray(p, jnp.float64)
        np.testing.assert_allclose(np.asarray(wind_ned(cfg3, p)),
                                   np.asarray(wind_ned(cfg1, p)),
                                   atol=1e-9)


@pytest.mark.slow
def test_gridded_solve_matches_boundary_layer():
    """S10 solve over the gridded storm field (model 3) converges and
    matches the analytic model-1 solve (linear field => identical NLP)."""
    ts = 12
    u, v, w, origin, spacing = _boundary_layer_grid(nx=8, ny=8, nz=6)
    grid = grid_from_arrays(u, v, w, origin, spacing)
    opts = ALMOptions(tol=1e-5, feas_tol=1e-6, max_iter=600, gamma_init=0.01,
                      mu_init=1e-5, mu_shrink=0.1, dual_refine_k=4)

    results = {}
    for model, wind_kw in ((1, dict(vref=VREF, href=HREF, up0=UP0)),
                           (3, dict(east0=17400.0, north0=25800.0, up0=UP0,
                                    grid=grid))):
        nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=model,
                           wind=WindConfig(model=model, **wind_kw))
        can = canonicalize(nlp, scaling="auto")
        kkt = make_condensed_kkt(can, refine=1, chain="cr")
        res = alm_solve(can, kkt, opts)
        assert bool(res.converged), (model, float(res.kkt_err))
        results[model] = can.to_physical(res.v)
    # same NLP -> same optimum (dt and cost agree tightly)
    assert float(results[3][0]) == pytest.approx(float(results[1][0]),
                                                 rel=1e-5)


def test_golden_storm_point_is_certified():
    """The committed storm oracle (tests/golden_storm_ts100.npy,
    scratch/make_golden_storm.py) must be feasible to near-f64 precision
    on the EXACT bench storm problem (nonuniform demo grid, C1 spline
    interpolation) — this pins the grid generator, the interpolation
    order and the oracle file together; any drift breaks feasibility."""
    import os

    import jax.numpy as jnp

    from tol_tpu.api import make_problem
    from tol_tpu.io.storm import make_demo_storm_grid
    from tol_tpu.models.wind import WindConfig
    from tol_tpu.solver import canonicalize

    path = os.path.join(os.path.dirname(__file__),
                        "golden_storm_ts100.npy")
    vp = np.load(path)
    grid = make_demo_storm_grid()
    wcfg = WindConfig(model=3, east0=17400.0, north0=25800.0, up0=200.0,
                      grid=grid, order=2)
    nlp = make_problem("S10", aircraft="tempest", ts=100, wind_model=3,
                       wind=wcfg)
    can = canonicalize(nlp, scaling="auto")
    v = can.from_physical(jnp.asarray(vp))
    viol = float(jnp.max(jnp.abs(can.c(v, nlp.inst0))))
    assert viol < 1e-7, viol
    f = float(can.f(v, nlp.inst0))
    # Certified stationary cost (ALM f64, KKT 6.7e-6; scipy trust-constr
    # referee lands 33% above from the same start).  The bench gates
    # storm lanes at cost gap < 1e-2 vs this value.
    seed_f = float(can.f(can.initial_point(), nlp.inst0))
    assert f < seed_f
