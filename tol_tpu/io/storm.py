"""Storm-field import: netCDF -> TOLWGRID binary cache -> WindGrid.

The reference pipeline for gridded storm wind is: netCDF research data
(matlab/scripts/read_netCDF.m) -> MongoDB ``straka.t000000_f5700``
collection -> per-solve network queries + in-memory cache
(``problem::cacheWind``, src/problem.cpp:371-469).  Here the same data
flows netCDF -> one binary ``TOLWGRID`` file (tol_tpu/io/native.py,
native/tolnative.cpp) -> zero-copy ``WindGrid`` device arrays.

Reads NetCDF-3 classic files via ``scipy.io.netcdf_file`` (no extra
dependencies); NetCDF-4/HDF5 inputs should be converted externally or the
arrays passed straight to :func:`grid_from_arrays`.
"""

from __future__ import annotations

import numpy as np

# Mongo sentinel for missing samples, mapped to calm air
# (src/problem.cpp:461-466).
SENTINEL = -32768.0


def grid_from_arrays(u, v, w, origin, spacing, sentinel: float = SENTINEL,
                     live=(0.0, 1.0, 0.0)):
    """Build a WindGrid from raw (nx, ny, nz) component arrays.

    Sentinel samples become calm air exactly as the reference's cache load
    does (src/problem.cpp:461-466).  ``live`` defaults to v-only, matching
    the reference's model-3 interpolation (src/problem.cpp:631-635); pass
    (1, 1, 1) for all components.
    """
    import jax.numpy as jnp

    from tol_tpu.models.wind import WindGrid

    def clean(a):
        a = np.asarray(a, dtype=np.float32)
        return np.where(a <= sentinel, 0.0, np.nan_to_num(a))

    u, v, w = clean(u), clean(v), clean(w)
    if not (u.shape == v.shape == w.shape) or u.ndim != 3:
        raise ValueError(f"component shapes differ or not 3-D: "
                         f"{u.shape} {v.shape} {w.shape}")
    return WindGrid(
        origin=jnp.asarray(np.asarray(origin, dtype=np.float64)),
        spacing=jnp.asarray(np.asarray(spacing, dtype=np.float64)),
        u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w),
        live=jnp.asarray(np.asarray(live, dtype=np.float32)),
    )


def _uniform_spacing(coord, name):
    coord = np.asarray(coord, dtype=np.float64)
    if coord.size < 2:
        return 1.0
    d = np.diff(coord)
    if not np.allclose(d, d[0], rtol=1e-4):
        raise ValueError(f"{name} coordinate not uniformly spaced")
    return float(d[0])


def import_netcdf_storm(path: str, out_path: str | None = None,
                        u_var: str = "u", v_var: str = "v", w_var: str = "w",
                        x_var: str = "x", y_var: str = "y", z_var: str = "z",
                        time_index: int = 0, sentinel: float = SENTINEL,
                        live=(0.0, 1.0, 0.0)):
    """Import a NetCDF-3 storm snapshot; optionally persist as TOLWGRID.

    Variables may be (nx, ny, nz) or (t, nx, ny, nz) (``time_index``
    selects the snapshot — the reference collection name encodes one,
    ``straka.t000000_f5700``, src/problem.cpp:372).  Coordinate variables
    give the uniform grid origin/spacing (the reference hardcodes 150 m,
    include/problem.h:87-89).  Returns the WindGrid.
    """
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as nc:
        def take(name):
            a = np.asarray(nc.variables[name].data)
            if a.ndim == 4:
                a = a[time_index]
            return a

        u, v, w = take(u_var), take(v_var), take(w_var)
        xs = np.asarray(nc.variables[x_var].data, dtype=np.float64)
        ys = np.asarray(nc.variables[y_var].data, dtype=np.float64)
        zs = np.asarray(nc.variables[z_var].data, dtype=np.float64)

    origin = (float(xs[0]), float(ys[0]), float(zs[0]))
    spacing = (_uniform_spacing(xs, x_var), _uniform_spacing(ys, y_var),
               _uniform_spacing(zs, z_var))
    grid = grid_from_arrays(u, v, w, origin, spacing, sentinel=sentinel,
                            live=live)
    if out_path is not None:
        from tol_tpu.io.native import write_wind_grid
        write_wind_grid(out_path, np.asarray(grid.origin),
                        np.asarray(grid.spacing), np.asarray(grid.u),
                        np.asarray(grid.v), np.asarray(grid.w))
    return grid


def make_demo_storm_grid(nx: int = 8, ny: int = 8, nz: int = 6,
                         spacing: float = 150.0,
                         origin=(17000.0, 25500.0, 0.0),
                         up0: float = 200.0,
                         shear: float = 2.4, shear_href: float = 10.0,
                         shear_sat: float = 50.0,
                         vortex_center=(17400.0, 25700.0),
                         vortex_v: float = 2.5, vortex_r0: float = 200.0,
                         thermal_center=(17350.0, 25650.0),
                         thermal_w: float = 2.0, thermal_r0: float = 150.0):
    """Genuinely NONUNIFORM demo storm field sampled onto a WindGrid.

    The reference flew against a Straka storm database with spatially
    varying wind and live gradients (src/problem.cpp:371-469, 544-695);
    this builds a comparable stand-in without the Mongo dependency: a
    saturating boundary-layer shear (tanh in altitude, matching the
    model-1 gradient ``-shear/shear_href`` at the ``up0`` datum), a
    Rankine-style horizontal vortex, and a Gaussian thermal updraft, all
    sampled at the reference's 150 m grid spacing
    (include/problem.h:87-89) with ALL THREE components live.

    None of these component fields is trilinear, so the grid interpolant
    does NOT represent the analytic field exactly: solves against this
    grid exercise real trilinear interpolation and its AD gradients, and
    the correctness oracle must be solved on the SAME grid (see
    scratch/make_golden_storm.py / tests/golden_storm_ts100.npy).
    """
    xs = origin[0] + spacing * np.arange(nx)
    ys = origin[1] + spacing * np.arange(ny)
    zs = origin[2] + spacing * np.arange(nz)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")

    # Saturating shear: v -> -shear*(z-up0)/shear_href near the datum,
    # bounded at +-shear*shear_sat/shear_href aloft.
    v = -shear * shear_sat / shear_href * np.tanh((Z - up0) / shear_sat)

    # Rankine-style vortex (solid-body core, 1/r-like decay outside).
    dx = X - vortex_center[0]
    dy = Y - vortex_center[1]
    r = np.sqrt(dx * dx + dy * dy)
    vt = vortex_v * (r / vortex_r0) * np.exp(1.0 - r / vortex_r0)
    safe_r = np.where(r > 0, r, 1.0)
    u = np.where(r > 0, -vt * dy / safe_r, 0.0)
    v = v + np.where(r > 0, vt * dx / safe_r, 0.0)

    # Gaussian thermal updraft.
    r2t = ((X - thermal_center[0]) ** 2 + (Y - thermal_center[1]) ** 2)
    w = thermal_w * np.exp(-r2t / (thermal_r0 * thermal_r0))

    return grid_from_arrays(u, v, w, origin,
                            (spacing, spacing, spacing),
                            live=(1.0, 1.0, 1.0))
