"""Batched solving over stacked instances (the Monte-Carlo/sweep path)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.api import make_config
from tol_tpu.config import Goal
from tol_tpu.models.wind import WindConfig
from tol_tpu.problems.base import build_nlp, make_instance
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt


def stack_instances(instances):
    """Stack a list of Instance pytrees along a new batch axis (the wind
    model index is static metadata and must agree across the batch)."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *instances)


@pytest.mark.slow
def test_batched_goals_converge():
    cfg = make_config("S10", "tempest", ts=12)
    wind = WindConfig(model=1)
    nlp = build_nlp(cfg, Goal(-100.0, 0.0, 0.0, 100.0), wind)
    can = canonicalize(nlp)
    kkt = make_condensed_kkt(can)
    opts = ALMOptions(tol=1e-4, feas_tol=1e-6, max_iter=1200)

    insts = stack_instances([
        make_instance(cfg, Goal(xg=-rg, yg=0.0, zg=0.0, rg=rg), wind)
        for rg in [90.0, 100.0, 110.0]
    ])
    insts = insts._replace(wind=dataclasses.replace(insts.wind, model=1))

    out = jax.jit(jax.vmap(lambda i: alm_solve(can, kkt, opts, inst=i)))(insts)
    viol = np.asarray(out.constr_viol)
    assert np.all(viol < 1e-5), viol
    # Ring radii track the per-instance goal.
    for b, rg in enumerate([90.0, 100.0, 110.0]):
        Z, dt, _ = can.split(out.v[b])
        r = np.hypot(np.asarray(Z[:, 0]) + rg, np.asarray(Z[:, 1]))
        np.testing.assert_allclose(r, rg, atol=1.0)


@pytest.mark.slow
def test_batched_airframes():
    """Multi-airframe sweep (BASELINE.json config 3): same mission family,
    different AircraftParams leaves."""
    wind = WindConfig(model=1)
    singles = []
    for name in ["tempest_eric", "tempest_will"]:
        cfg = make_config("S10", name, ts=12)
        singles.append(make_instance(cfg, Goal(-100.0, 0.0, 0.0, 100.0), wind))
    cfg0 = make_config("S10", "tempest_eric", ts=12)
    nlp = build_nlp(cfg0, Goal(-100.0, 0.0, 0.0, 100.0), wind)
    can = canonicalize(nlp)
    kkt = make_condensed_kkt(can)
    opts = ALMOptions(tol=1e-4, feas_tol=1e-6, max_iter=1200)

    insts = stack_instances(singles)
    insts = insts._replace(wind=dataclasses.replace(insts.wind, model=1))
    out = jax.jit(jax.vmap(lambda i: alm_solve(can, kkt, opts, inst=i)))(insts)
    viol = np.asarray(out.constr_viol)
    assert np.all(viol < 1e-5), viol
    # Airframe bounds respected per instance (phimax differs: 45 vs 45 deg,
    # Va bounds differ via Vamin 12 vs 10).
    for b in range(2):
        Z, _, _ = can.split(out.v[b])
        lb, ub, _ = can.bounds(jax.tree.map(lambda x: x[b], insts))
        v = np.asarray(out.v[b])
        assert np.all(v >= np.asarray(lb) - 1e-6)
        assert np.all(v <= np.asarray(ub) + 1e-6)


def test_grouped_solver_with_drain_matches_monolithic():
    """tol_tpu.solver.batch.make_grouped_solver: group solves + straggler
    drain must land every lane on the same optimum a monolithic
    full-budget batch reaches.  (Bitwise trajectory equality holds only
    within one compiled program — tests/test_solver.py::
    test_resume_state_matches_uninterrupted; across the group/drain/mono
    programs XLA schedules differ at the ulp level, so this compares the
    converged points.)"""
    import numpy as np

    from tol_tpu.solver.alm import ALMParams
    from tol_tpu.solver.batch import make_grouped_solver

    cfg = make_config("S10", "tempest", ts=8)
    wind = WindConfig(model=1)
    nlp = build_nlp(cfg, Goal(-100.0, 0.0, 0.0, 100.0), wind)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can)
    opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8)

    B, GB, DB = 8, 4, 2
    inst0 = can.nlp.inst0
    insts = stack_instances([inst0] * B)
    v0 = can.initial_point()
    lb, ub, fixed = can.bounds(inst0)
    dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n),
                                  dtype=v0.dtype)
    v0s = jnp.where(fixed[None], lb[None],
                    jnp.clip(v0[None] + dv, lb[None], ub[None]))

    def params(max_iter, tol=1e-6):
        p = ALMParams.from_options(
            ALMOptions(tol=tol, max_iter=600, gamma_init=0.01,
                       mu_init=1e-5, mu_shrink=0.1, prox=3e-3,
                       gamma_eager=True, gamma_shrink=0.2), v0.dtype)
        return p._replace(max_iter=jnp.asarray(max_iter, jnp.int32))

    p1 = params(600, tol=1e-12)._replace(
        prox=jnp.asarray(0.0, v0.dtype), gamma_eager=jnp.asarray(0.0))
    cap1, full = 40, 600   # cap low enough that lanes drain

    gsolve = make_grouped_solver(can, kkt, opts, group_size=GB,
                                 drain_size=DB)
    res = gsolve([inst0, inst0], insts, v0s, p1, params(cap1),
                 params(full), 10, -1.0)
    assert res.converged.all(), (res.converged, res.kkt_err)
    assert res.drain_iters > 0      # the low cap really exercised a drain

    # monolithic oracle: same lanes, full budget in one program
    from tol_tpu.solver.alm import Phase1
    ph = Phase1(params=p1, n_max=jnp.asarray(10, jnp.int32),
                exit_df=jnp.asarray(-1.0, v0.dtype), patience=3)
    mono = jax.jit(jax.vmap(lambda v: alm_solve(
        can, kkt, opts, v0=v, params=params(full), phase1=ph)))(v0s)
    assert np.asarray(mono.converged).all()
    np.testing.assert_allclose(res.f, np.asarray(mono.f, np.float64),
                               rtol=1e-7)
    np.testing.assert_allclose(res.v, np.asarray(mono.v), atol=1e-4)
    assert (res.kkt_err < 1e-6).all()
