"""End-to-end NLP solver tests (SNOPT-replacement correctness).

The reference ships no tests (SURVEY.md section 4); its verification was
file dumps + eyeballing.  Here the solver is checked mechanically: the
returned point must satisfy the KKT conditions of the mission NLP to
tolerance, and the S10 solution must be the expected loiter geometry.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_dense import make_dense_kkt


@pytest.fixture(scope="module")
def s10_solution():
    nlp = make_problem("S10", aircraft="tempest", ts=12, wind_model=1)
    can = canonicalize(nlp)
    res = alm_solve(can, make_dense_kkt(can),
                    ALMOptions(tol=1e-6, max_iter=600))
    return nlp, can, res


def test_s10_converges(s10_solution):
    nlp, can, res = s10_solution
    assert bool(res.converged)
    assert float(res.kkt_err) < 1e-6
    # reference feasibility tolerance is 1e-5 (problems/S10/snopt.param:7)
    assert float(res.constr_viol) < 1e-6


def test_s10_solution_geometry(s10_solution):
    """The optimum rides the goal ring: r_i ~ R so cost ~ kdt*dt."""
    nlp, can, res = s10_solution
    Z, dt, _ = can.split(res.v)
    Z = np.asarray(Z)
    r = np.hypot(Z[:, 0] + 100.0, Z[:, 1])
    np.testing.assert_allclose(r, 100.0, atol=0.1)
    # full winding (src/problemS10.cpp:298)
    assert Z[-1, 5] - Z[0, 5] == pytest.approx(2 * np.pi, abs=1e-5)
    # node 0 pinned at origin
    np.testing.assert_allclose(Z[0, :3], 0.0, atol=1e-9)
    # bounds respected
    lb, ub, _ = can.bounds(can.nlp.inst0)
    lo, up = np.asarray(lb), np.asarray(ub)
    v = np.asarray(res.v)
    assert np.all(v >= lo - 1e-7) and np.all(v <= up + 1e-7)
    # cost reduces to the time term
    assert float(res.f) == pytest.approx(float(dt), rel=1e-3)


def test_s10_dynamics_feasible_rollout(s10_solution):
    """Defect residuals vanish: the solution is an exact Euler rollout."""
    nlp, can, res = s10_solution
    Z, dt, _ = can.split(res.v)
    d = np.asarray(nlp.all_defects(Z, dt))
    assert np.abs(d).max() < 1e-6


def test_stationarity_independent_check(s10_solution):
    """Gradient of the Lagrangian vanishes on free variables (computed
    here independently of the solver's own error function)."""
    nlp, can, res = s10_solution
    inst = can.nlp.inst0
    g = jax.grad(lambda v: can.f(v, inst) + can.c(v, inst) @ res.y)(res.v)
    r = np.asarray(g - res.zl + res.zu)
    free = ~np.asarray(can.bounds(inst)[2])
    assert np.abs(r[free]).max() < 1e-4 * max(1.0, np.abs(np.asarray(res.y)).max())
