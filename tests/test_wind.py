"""Wind-model checks (ref: problem::modelWind, src/problem.cpp:475-757)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.models.wind import (
    WindConfig,
    WindGrid,
    wind_enu,
    wind_ned,
    wind_with_gradient_ned,
)


def test_model0_zero():
    cfg = WindConfig(model=0)
    w, gw = wind_with_gradient_ned(cfg, jnp.array([10.0, 20.0, -30.0]))
    assert np.all(np.asarray(w) == 0) and np.all(np.asarray(gw) == 0)


def test_model1_boundary_layer():
    """v_enu = -Vref*(-z_ned)/href, only north component, gradient constant
    (src/problem.cpp:522-524 + NED swizzle :970-981)."""
    cfg = WindConfig(model=1)
    p = jnp.array([5.0, -7.0, -25.0])  # z_ned = -25 -> altitude 25
    w, gw = wind_with_gradient_ned(cfg, p)
    v_enu = -2.4 * 25.0 / 10.0
    # NED: Wx = v (north), Wy = u, Wz = -w
    np.testing.assert_allclose(np.asarray(w), [v_enu, 0.0, 0.0], atol=1e-12)
    # dWx/dz_ned = d(-Vref*(-z)/href)/dz = Vref/href... v = -Vref*zs/href with
    # zs=-z_ned: v = Vref*z_ned/href -> dWx/dz_ned = Vref/href = 0.24.
    expect = np.zeros((3, 3))
    expect[0, 2] = 2.4 / 10.0
    np.testing.assert_allclose(np.asarray(gw), expect, atol=1e-12)
    # reference computes dv_dz (ENU) = -Vref/href then swizzles with a sign
    # flip (src/problem.cpp:975): dWx_dz = -dv_dz = +0.24 — consistent.


def _grid(nx=6, ny=6, nz=4, seed=0):
    rng = np.random.default_rng(seed)
    return WindGrid(
        origin=jnp.array([17000.0, 25500.0, 0.0]),
        spacing=jnp.array([150.0, 150.0, 150.0]),
        u=jnp.asarray(rng.normal(size=(nx, ny, nz))),
        v=jnp.asarray(rng.normal(size=(nx, ny, nz))),
        w=jnp.asarray(rng.normal(size=(nx, ny, nz))),
        live=jnp.array([0.0, 1.0, 0.0]),
    )


def test_model3_trilinear_matches_shape_functions():
    """Trilinear interpolation equals the reference's 8-node hexahedron shape
    functions (src/problem.cpp:617-635) evaluated in numpy."""
    grid = _grid()
    cfg = WindConfig(model=3, grid=grid)
    p_ned = jnp.array([30.0, -40.0, -110.0])  # arbitrary in-grid point
    w, gw = wind_with_gradient_ned(cfg, p_ned)

    # ENU field coords (src/problem.cpp:550-553)
    xs = -40.0 + 17400.0
    ys = 30.0 + 25800.0
    zs = 110.0 + 200.0
    o = np.asarray(grid.origin)
    sp = np.asarray(grid.spacing)
    ix, iy, iz = [int(np.floor((c - oo) / s)) for c, oo, s in zip((xs, ys, zs), o, sp)]
    zeta = (xs - (o[0] + ix * sp[0])) / sp[0]
    eta = (ys - (o[1] + iy * sp[1])) / sp[1]
    mu = (zs - (o[2] + iz * sp[2])) / sp[2]
    N = np.array([
        (1 - zeta) * (1 - eta) * (1 - mu), zeta * (1 - eta) * (1 - mu),
        (1 - zeta) * eta * (1 - mu), zeta * eta * (1 - mu),
        (1 - zeta) * (1 - eta) * mu, zeta * (1 - eta) * mu,
        (1 - zeta) * eta * mu, zeta * eta * mu,
    ])
    vf = np.asarray(grid.v)
    corners = np.array([
        vf[ix, iy, iz], vf[ix + 1, iy, iz], vf[ix, iy + 1, iz], vf[ix + 1, iy + 1, iz],
        vf[ix, iy, iz + 1], vf[ix + 1, iy, iz + 1], vf[ix, iy + 1, iz + 1],
        vf[ix + 1, iy + 1, iz + 1],
    ])
    v_interp = float(N @ corners)
    # NED Wx = v; u/w masked off (src/problem.cpp:631-635)
    np.testing.assert_allclose(float(w[0]), v_interp, rtol=1e-12)
    assert float(w[1]) == 0.0 and float(w[2]) == 0.0

    # Gradient: finite differences of the interpolant (in-cell).
    eps = 1e-4
    for j in range(3):
        dp = jnp.zeros(3).at[j].set(eps)
        fd = (wind_ned(cfg, p_ned + dp) - wind_ned(cfg, p_ned - dp)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gw[:, j]), np.asarray(fd),
                                   rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("model", [2, 4, 5])
def test_analytic_models_differentiable(model):
    cfg = WindConfig(model=model, xth=10.0, yth=-20.0)
    p = jnp.array([25.0, 35.0, -60.0])
    w, gw = wind_with_gradient_ned(cfg, p)
    assert np.all(np.isfinite(np.asarray(w)))
    assert np.all(np.isfinite(np.asarray(gw)))
    # FD cross-check
    eps = 1e-5
    for j in range(3):
        dp = jnp.zeros(3).at[j].set(eps)
        fd = (wind_ned(cfg, p + dp) - wind_ned(cfg, p - dp)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gw[:, j]), np.asarray(fd),
                                   rtol=1e-5, atol=1e-8)


def test_model3_onehot_matches_gather():
    """The one-hot (MXU) interpolation path is bit-level-equivalent math to
    the fused-gather path: identical corner values, identical weights, the
    one-hot contraction sums exactly one nonzero term."""
    grid = _grid()._replace(live=jnp.array([1.0, 1.0, 1.0]))
    cfg_g = WindConfig(model=3, grid=grid, interp="gather")
    cfg_o = WindConfig(model=3, grid=grid, interp="onehot")
    rng = np.random.default_rng(3)
    for _ in range(8):
        p = jnp.asarray(rng.uniform([-80, -80, -200], [80, 80, -20]))
        wg, gg = wind_with_gradient_ned(cfg_g, p)
        wo, go = wind_with_gradient_ned(cfg_o, p)
        np.testing.assert_allclose(np.asarray(wo), np.asarray(wg),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(go), np.asarray(gg),
                                   rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("order", [1, 2])
def test_model3_separable_matches_gather(order):
    """The axis-separated contraction (the fast TPU lowering, r05) equals
    the fused-gather path — same stencil, same weights, same extrapolation
    clamp — for queries inside AND outside the grid, values and gradients,
    batched and unbatched."""
    grid = _grid()._replace(live=jnp.array([1.0, 1.0, 1.0]))
    cfg_g = WindConfig(model=3, grid=grid, interp="gather", order=order)
    cfg_s = WindConfig(model=3, grid=grid, interp="separable", order=order)
    rng = np.random.default_rng(5)
    ps = jnp.asarray(rng.uniform([-300, -300, -400], [300, 300, 100],
                                 size=(16, 3)))
    wg = jax.vmap(lambda p: wind_ned(cfg_g, p))(ps)
    ws = jax.vmap(lambda p: wind_ned(cfg_s, p))(ps)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(wg),
                               rtol=1e-10, atol=1e-10)
    w1, g1 = wind_with_gradient_ned(cfg_g, ps[0])
    w2, g2 = wind_with_gradient_ned(cfg_s, ps[0])
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-8, atol=1e-12)


def test_demo_storm_grid_is_nonuniform():
    """The bench storm field must NOT be exactly representable by the
    trilinear interpolant (VERDICT r04): mid-cell samples of the analytic
    generators disagree with the grid interpolation by a finite margin,
    and all three components are live."""
    from tol_tpu.io.storm import make_demo_storm_grid

    grid = make_demo_storm_grid()
    assert np.all(np.asarray(grid.live) == 1.0)
    cfg = WindConfig(model=3, grid=grid, east0=17400.0, north0=25800.0,
                     up0=200.0)
    # A mid-cell ENU probe: interpolated vs analytic vortex+thermal+shear.
    p_enu = jnp.asarray(np.asarray(grid.origin)
                        + np.asarray(grid.spacing) * (2.5, 2.5, 1.5))
    w_interp = wind_enu(cfg, p_enu)
    # Analytic field value (same formulas as make_demo_storm_grid).
    x, y, z = [float(q) for q in p_enu]
    v_an = -2.4 * 50.0 / 10.0 * np.tanh((z - 200.0) / 50.0)
    dx, dy = x - 17400.0, y - 25700.0
    r = np.hypot(dx, dy)
    vt = 2.5 * (r / 200.0) * np.exp(1.0 - r / 200.0)
    u_an = -vt * dy / r
    v_an = v_an + vt * dx / r
    w_an = 2.0 * np.exp(-((x - 17350.0) ** 2 + (y - 25650.0) ** 2)
                        / 150.0 ** 2)
    err = np.abs(np.asarray(w_interp)
                 - np.array([u_an, v_an, w_an], dtype=np.float64))
    # Nonuniformity: the interpolant is an approximation, not exact
    # (model-1-replicating grids gave err == 0 identically).  The tanh
    # shear transition (50 m) is deliberately under-resolved by the
    # reference's 150 m spacing, so mid-cell errors are O(m/s) — what
    # matters for the bench gate is that the ORACLE solves the same grid.
    assert np.max(err) > 1e-3
    # Sanity: interpolated winds stay at airframe-sane magnitudes.
    assert np.max(np.abs(np.asarray(w_interp))) < 15.0


def test_model3_spline_order2_properties():
    """Quadratic B-spline field (order=2): (a) linear precision — a
    globally linear sampled field is reproduced exactly, like trilinear;
    (b) C1 — the gradient is continuous across cell-center boundaries
    where trilinear kinks; (c) onehot/gather parity."""
    nx, ny, nz = 6, 6, 6
    sp = 10.0
    xs = sp * np.arange(nx)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    lin = 0.3 * X - 0.2 * Y + 0.1 * Z + 1.0
    grid = WindGrid(origin=jnp.zeros(3), spacing=jnp.full(3, sp),
                    u=jnp.asarray(lin), v=jnp.asarray(lin),
                    w=jnp.asarray(lin), live=jnp.ones(3))
    cfg = WindConfig(model=3, east0=0.0, north0=0.0, up0=0.0, order=2,
                     grid=grid)
    rng = np.random.default_rng(5)
    # (a) linear precision at interior points
    for _ in range(5):
        p = jnp.asarray(rng.uniform(15.0, 40.0, 3))
        w = wind_enu(cfg, p)
        expect = 0.3 * p[0] - 0.2 * p[1] + 0.1 * p[2] + 1.0
        np.testing.assert_allclose(np.asarray(w), float(expect), rtol=1e-12)
    # (b) C1 at the stencil switch (half-integer rel coords): gradients
    # from both sides agree
    grid2 = grid._replace(u=jnp.asarray(rng.normal(size=(nx, ny, nz))),
                          v=jnp.asarray(rng.normal(size=(nx, ny, nz))),
                          w=jnp.asarray(rng.normal(size=(nx, ny, nz))))
    cfg2 = WindConfig(model=3, east0=0.0, north0=0.0, up0=0.0, order=2,
                      grid=grid2)
    gfun = jax.jacfwd(lambda p: wind_enu(cfg2, p))
    p0 = jnp.array([25.0, 27.3, 31.9])   # x at a cell-center boundary
    eps = 1e-6
    gl = np.asarray(gfun(p0 - jnp.array([eps, 0, 0])))
    gr = np.asarray(gfun(p0 + jnp.array([eps, 0, 0])))
    np.testing.assert_allclose(gl, gr, rtol=1e-4, atol=1e-6)
    # (c) onehot/gather parity for order=2
    cfg2o = WindConfig(model=3, east0=0.0, north0=0.0, up0=0.0, order=2,
                       interp="onehot", grid=grid2)
    cfg2g = WindConfig(model=3, east0=0.0, north0=0.0, up0=0.0, order=2,
                       interp="gather", grid=grid2)
    for _ in range(5):
        p = jnp.asarray(rng.uniform(12.0, 45.0, 3))
        np.testing.assert_allclose(np.asarray(wind_enu(cfg2o, p)),
                                   np.asarray(wind_enu(cfg2g, p)),
                                   rtol=1e-12, atol=1e-14)
