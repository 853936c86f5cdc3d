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
