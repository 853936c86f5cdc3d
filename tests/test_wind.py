"""Wind-model checks (ref: problem::modelWind, src/problem.cpp:475-757)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.models.wind import (
    WindConfig,
    WindGrid,
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
