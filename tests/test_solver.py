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


def test_scaled_canonical_agrees_with_unscaled():
    """The nondimensionalized path must find the same optimum as the
    unscaled oracle path (mapped back through to_physical)."""
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    nlp = make_problem("S10", aircraft="tempest", ts=12, wind_model=1)
    can_u = canonicalize(nlp)
    res_u = alm_solve(can_u, make_dense_kkt(can_u),
                      ALMOptions(tol=1e-6, max_iter=600))
    can_s = canonicalize(nlp, scaling="auto")
    res_s = alm_solve(can_s, make_condensed_kkt(can_s),
                      ALMOptions(tol=1e-6, max_iter=600, gamma_init=0.01,
                                 mu_init=1e-4, mu_shrink=0.1))
    assert bool(res_u.converged) and float(res_s.constr_viol) < 1e-6
    v_s = np.asarray(can_s.to_physical(res_s.v))
    # Same optimal period (dt is the S10 cost up to kdt).
    assert v_s[0] == pytest.approx(float(res_u.v[0]), rel=1e-3)
    f_phys = float(res_s.f) / float(can_s.scaling.s_f)
    assert f_phys == pytest.approx(float(res_u.f), rel=1e-3)


def test_resume_state_matches_uninterrupted():
    """state0 resume: stopping at a runtime iteration cap and resuming
    from result.state must land exactly where the uninterrupted solve
    lands (the straggler-drain mechanism in bench.py relies on this)."""
    from tol_tpu.solver.alm import ALMParams
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    nlp = make_problem("S10", aircraft="tempest", ts=8, wind_model=1)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can)
    opts = ALMOptions(max_iter=600, gamma_init=0.01, mu_init=1e-4,
                      mu_shrink=0.1)

    def params(max_iter):
        p = ALMParams.from_options(
            ALMOptions(tol=1e-6, max_iter=600, gamma_init=0.01,
                       mu_init=1e-4, mu_shrink=0.1), jnp.float64)
        return p._replace(max_iter=jnp.asarray(max_iter, jnp.int32))

    run = jax.jit(lambda p, st: alm_solve(can, kkt, opts, params=p,
                                          state0=st, keep_state=True))
    full = run(params(600), None)
    assert bool(full.converged)

    part = run(params(25), None)
    assert not bool(part.converged) and int(part.iterations) == 25
    resumed = run(params(600), part.state)
    assert bool(resumed.converged)
    assert int(resumed.iterations) == int(full.iterations)
    np.testing.assert_allclose(np.asarray(resumed.v), np.asarray(full.v),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_golden_flat_manifold():
    """Documents WHY the bench gates on cost gap, not control L2: at the
    fully converged oracle point the reduced Hessian has an O(100)-dim
    near-null subspace (|eig| < 1e-3 in scaled units) — the S10 optimum is
    a cost-flat manifold, so pointwise comparison between two exact
    solvers' solutions is ill-posed while the cost gap is well-defined."""
    import os
    golden_path = os.path.join(os.path.dirname(__file__),
                               "golden_s10_ts100.npy")
    golden = np.load(golden_path)
    nlp = make_problem("S10", aircraft="tempest", ts=100, wind_model=1)
    can = canonicalize(nlp, scaling="auto")
    inst = can.nlp.inst0
    v = can.from_physical(jnp.asarray(golden))
    lb, ub, fixed = can.bounds(inst)
    va, lbn, ubn = np.asarray(v), np.asarray(lb), np.asarray(ub)
    act = (va - lbn < 1e-6) | (ubn - va < 1e-6) | np.asarray(fixed)
    free = ~act
    J = np.asarray(jax.jacfwd(lambda vv: can.c(vv, inst))(v))[:, free]
    g = np.asarray(jax.grad(lambda vv: can.f(vv, inst))(v))[free]
    y, *_ = np.linalg.lstsq(J.T, g, rcond=None)
    H = np.asarray(jax.hessian(
        lambda vv: can.f(vv, inst) + can.c(vv, inst) @ jnp.asarray(y))(v))
    U, S, Vt = np.linalg.svd(J, full_matrices=True)
    rank = int((S > 1e-8 * S[0]).sum())
    N = Vt[rank:].T
    w = np.linalg.eigvalsh(N.T @ H[np.ix_(free, free)] @ N)
    # The golden really is (second-order) optimal up to flatness ...
    assert w.min() > -1e-2
    # ... and the flat subspace is large.
    assert int((np.abs(w) < 1e-3).sum()) > 100


@pytest.mark.slow
def test_g7_ts100_float32_converges():
    """G7-Skywalker at the reference horizon (ts=100,
    problems/G7/snopt.param:2) converges in float32 with the production
    configuration (crp unavailable off-TPU at batch 1; cr is the same
    elimination order).  Round-2 state of this problem was 0/256
    converged with median KKT 1.99; the fixes were (a) boundary-row
    scaling at a perturbed seed, (b) the non-degenerate (perp, along)
    displacement rows, (c) the KKT-driven gamma policy with floor 5e-6.
    """
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    nlp = make_problem("G7", aircraft="skywalker", ts=100, wind_model=1,
                       dtype=jnp.float32)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=1, chain="cr")
    opts = ALMOptions(tol=5e-3, feas_tol=1e-4, max_iter=600,
                      gamma_init=0.01, gamma_min=5e-6, mu_init=1e-5,
                      mu_shrink=0.1, prox=1e-3, dual_refine_k=4,
                      gamma_eager=True, gamma_shrink=0.2)
    res = alm_solve(can, kkt, opts)
    assert bool(res.converged), (float(res.kkt_err), float(res.constr_viol))
    assert float(res.constr_viol) < 1e-4
    assert float(res.kkt_err) < 5e-3
