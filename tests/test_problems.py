"""Mission NLP specification checks (ref: src/problemG7.cpp, src/problemS10.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.api import default_goal, make_problem
from tol_tpu.config import GRAVITY, RHO
from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS


def test_s10_seed_geometry():
    """Circle seed (src/problemS10.cpp:80-91): centre (-100,0), radius 100,
    full lap; speed chosen inside the airframe envelope (coordinated turn
    at 0.9*phimax, clamped to [1.1 Vamin, 0.9 Vamax])."""
    nlp = make_problem("S10", ts=100, wind_model=0)
    Z, dt = nlp.seed()
    assert Z.shape == (101, NUM_VARS)
    r = np.hypot(np.asarray(Z[:, 0]) + 100.0, np.asarray(Z[:, 1]))
    np.testing.assert_allclose(r, 100.0, atol=1e-8)
    v_turn = np.sqrt(9.81 * np.tan(0.9 * np.deg2rad(20.0)) * 100.0)
    speed = np.clip(v_turn, 1.1 * 12.0, 0.9 * 30.0)
    np.testing.assert_allclose(np.asarray(Z[:, 3]), speed, rtol=1e-6)
    assert float(dt) == pytest.approx(2 * np.pi * 100 / speed / 100, rel=1e-6)
    # bank angle within limits by construction
    assert np.abs(np.asarray(Z[:, 6])).max() <= np.deg2rad(20.0) + 1e-6
    np.testing.assert_allclose(np.asarray(Z[:, 4]), 0.0, atol=1e-12)  # gamma
    # chi winds one full turn
    assert float(Z[-1, 5] - Z[0, 5]) == pytest.approx(2 * np.pi, abs=1e-6)
    # node-0 rates back-filled from final node (src/problemS10.cpp:210-211)
    assert float(Z[0, 8]) == pytest.approx(float(Z[-1, 8]))
    assert float(Z[0, 9]) == pytest.approx(float(Z[-1, 9]))


def test_g7_seed_geometry():
    """Straight-line seed rotated to the goal course (src/problemG7.cpp:38-88):
    level flight at 4 m/s along chi_d, phi=0, T=D."""
    nlp = make_problem("G7", ts=50, wind_model=0)
    Z, dt = nlp.seed()
    speed = 1.1 * 12.0  # max(4, 1.1*Vamin) for tempest
    assert float(dt) == pytest.approx(40.0 / speed / 50, rel=1e-6)
    chi_d = np.arctan2(400.0, 0.0)
    np.testing.assert_allclose(np.asarray(Z[:, 5]), chi_d, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Z[:, 3]), speed, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Z[:, 6]), 0.0, atol=1e-9)  # phi
    # positions advance along chi_d for 40 m total
    np.testing.assert_allclose(np.asarray(Z[-1, 0]), 40.0 * np.cos(chi_d), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Z[-1, 1]), 40.0 * np.sin(chi_d), atol=1e-7)
    # level flight: L = m g => CL = 2 m g / (rho V^2 S)
    CL_expect = 2 * 6.1228 * GRAVITY / (RHO * speed**2 * 0.6316)
    np.testing.assert_allclose(np.asarray(Z[:, 7]), CL_expect, rtol=1e-6)


def test_seed_satisfies_boundary_rows_approximately():
    """The S10 seed is periodic by construction, so boundary rows ~ 0."""
    nlp = make_problem("S10", ts=64, wind_model=0)
    Z, dt = nlp.seed()
    b = np.asarray(nlp.boundary(Z[0], Z[-1], dt))
    np.testing.assert_allclose(b, 0.0, atol=1e-6)


def test_defect_rows_zero_on_exact_euler_rollout():
    """Defects vanish iff the trajectory is an exact forward-Euler rollout
    (src/problem.cpp:1012-1019)."""
    nlp = make_problem("S10", ts=8, wind_model=1)
    Z, dt = nlp.seed()
    # Roll out states by explicit Euler from node 0, keeping seed controls.
    from tol_tpu.api import make_config
    from tol_tpu.models.dynamics import state_derivatives
    from tol_tpu.models.wind import WindConfig, wind_with_gradient_ned
    cfg = make_config("S10", ts=8, wind_model=1)
    wind = WindConfig(model=1)
    Zr = np.asarray(Z).copy()
    for i in range(8):
        z = jnp.asarray(Zr[i])
        w, gw = wind_with_gradient_ned(wind, z[:3])
        zdot = state_derivatives(z, w, gw, cfg.aircraft)
        Zr[i + 1, :NUM_STATES] = Zr[i, :NUM_STATES] + float(dt) * np.asarray(zdot)
    d = np.asarray(nlp.all_defects(jnp.asarray(Zr), dt))
    np.testing.assert_allclose(d, 0.0, atol=1e-10)


def test_bounds_layout():
    """setLimits parity (src/problem.cpp:198-285)."""
    nlp = make_problem("S10", ts=10)
    lo, up = np.asarray(nlp.z_lo), np.asarray(nlp.z_up)
    # node 0: position+gamma pinned
    for k in (0, 1, 2, 4):
        assert lo[0, k] == up[0, k] == 0.0
    assert lo[0, 3] == 4.0 and up[0, 3] == 50.0        # Va1, Va2
    assert up[0, 10] == 1e20 and lo[0, 10] == 0.0      # node-0 thrust
    # nodes >= 1: aircraft boxes
    assert lo[1, 3] == 12.0 and up[1, 3] == 30.0
    assert up[1, 10] == pytest.approx(56.33)
    assert lo[1, 5] == -1e20 and up[1, 5] == 1e20      # chi free winding
    # dCL bound reuses phidotmax (src/problem.cpp:283)
    assert up[1, 9] == pytest.approx(20.0 * np.pi / 180)
    # altitude box z <= 0
    assert up[1, 2] == 0.0


def test_g7_boundary_rows():
    """Displacement-direction rows in the well-conditioned (perp, along)
    form — same feasible set as the reference pair dx-dist*cos /
    dy-dist*sin (src/problemG7.cpp:258-265), but with unit-norm position
    gradients everywhere (the reference pair's Jacobian is the projector
    I - u u^T, rank-deficient along the course — see problems/g7.py)."""
    nlp = make_problem("G7", ts=10)
    assert nlp.nb == 12
    assert list(nlp.boundary_is_ineq) == \
        [False, True] + [False] * 9 + [True]
    Z, dt = nlp.seed()
    b = np.asarray(nlp.boundary(Z[0], Z[-1], dt))
    # Seed travels exactly along chi_d: perp row vanishes, along row is
    # -dist (strictly feasible); dist-dmax = 40-400.
    np.testing.assert_allclose(b[0], 0.0, atol=1e-7)
    assert b[1] == pytest.approx(-40.0, rel=1e-6)
    assert b[-1] == pytest.approx(40.0 - 400.0, rel=1e-6)
    # Equivalence with the reference pair on AND off the feasible set:
    # reference rows == 0  <=>  (perp == 0 and along >= 0).
    z0 = np.asarray(Z[0], float)
    for d_vec, feasible in [((0.0, 30.0), True),     # along course (chi_d=pi/2)
                            ((5.0, 30.0), False),    # off-course
                            ((0.0, -30.0), False)]:  # anti-parallel
        zT = np.asarray(Z[-1], float).copy()
        zT[0] = z0[0] + d_vec[0]
        zT[1] = z0[1] + d_vec[1]
        bb = np.asarray(nlp.boundary(jnp.asarray(z0), jnp.asarray(zT), dt))
        dist = np.hypot(*d_vec)
        ref_pair_zero = (abs(d_vec[0] - 0.0 * dist) < 1e-9
                         and abs(d_vec[1] - 1.0 * dist) < 1e-9)
        ours_ok = abs(bb[0]) < 1e-5 and bb[1] <= 1e-5
        assert ours_ok == ref_pair_zero == feasible


def test_reference_jacobian_mode_freezes_wind():
    """In "reference" mode the defect Jacobian carries no wind-induced
    position columns (matching tabG, src/problem.cpp:1080-1186); in "exact"
    mode it does."""
    zi = jnp.array([10.0, -5.0, -30.0, 15.0, 0.05, 1.0, 0.1, 0.6, 0.0, 0.0, 5.0])
    zj = zi.at[0].add(3.0)
    dt = jnp.asarray(0.2)

    ref = make_problem("S10", ts=4, wind_model=1, jacobian_mode="reference")
    exact = make_problem("S10", ts=4, wind_model=1, jacobian_mode="exact")

    J_ref = jax.jacfwd(lambda z: ref.defect(z, zj, dt))(zi)
    J_exact = jax.jacfwd(lambda z: exact.defect(z, zj, dt))(zi)

    # Row 0 (x-defect) / column z: exact has -dWx/dz * dt = -0.24*0.2; the
    # reference tabG for F1 has no z column (src/problem.cpp:1084-1088).
    assert float(J_ref[0, 2]) == pytest.approx(0.0, abs=1e-12)
    assert float(J_exact[0, 2]) == pytest.approx(-0.24 * 0.2, rel=1e-9)
    # Identity terms unaffected: dF1/dx_i = -1 both modes
    assert float(J_ref[0, 0]) == pytest.approx(-1.0)
    assert float(J_exact[0, 0]) == pytest.approx(-1.0)
    # Residual values identical in both modes.
    np.testing.assert_allclose(np.asarray(ref.defect(zi, zj, dt)),
                               np.asarray(exact.defect(zi, zj, dt)), rtol=1e-14)


def test_s10_cost_values():
    """Cost formula parity (src/problemS10.cpp:227-265) on a hand point."""
    nlp = make_problem("S10", ts=2)
    Z = jnp.zeros((3, NUM_VARS))
    Z = Z.at[:, 0].set(jnp.array([0.0, -50.0, -100.0]))   # x
    Z = Z.at[:, 10].set(jnp.array([1.0, 2.0, 3.0]))       # T
    dt = jnp.asarray(0.3)
    goal = default_goal("S10")  # centre (-100, 0), R=100
    r = np.abs(np.array([0.0, -50.0, -100.0]) - (-100.0))
    expected = 0.5 * 0.0 * np.sum([1, 4, 9]) + 0.5 * 8.0 * np.sum((r - 100.0) ** 2) + 1.0 * 0.3
    assert float(nlp.total_cost(Z, dt)) == pytest.approx(expected, rel=1e-12)
