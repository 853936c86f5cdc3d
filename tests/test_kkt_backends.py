"""Structured O(T) KKT backend vs dense oracle backend.

The structured backend factorizes the same saddle system by chain
elimination + border Schur complement; on positive-definite states the two
must agree to machine precision.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.kkt_dense import make_dense_kkt
from tol_tpu.solver.kkt_condensed import make_condensed_kkt
from tol_tpu.solver.kkt_structured import make_structured_kkt


def _state(can, seed=0, y_scale=0.3):
    rng = np.random.default_rng(seed)
    lb, ub, fixed = can.bounds(can.nlp.inst0)
    lb, ub, fixed = np.asarray(lb), np.asarray(ub), np.asarray(fixed)
    v = np.asarray(can.initial_point())
    v = np.clip(v + rng.normal(scale=0.01, size=v.shape), lb, ub)
    v = jnp.asarray(np.where(fixed, lb, v))
    y = jnp.asarray(rng.normal(scale=y_scale, size=can.m))
    sigma = jnp.asarray(rng.uniform(0.1, 2.0, size=can.n))
    rhs_v = jnp.where(jnp.asarray(fixed), 0.0, jnp.asarray(rng.normal(size=can.n)))
    rhs_c = jnp.asarray(rng.normal(size=can.m))
    return v, y, sigma, rhs_v, rhs_c


import functools


@functools.lru_cache(maxsize=None)
def _dense_oracle(mission, ts):
    """Shared per-(mission, ts) canonical problem + dense-KKT oracle
    solution at the seed-0 state: every backend-parity test compares
    against the SAME system, so the expensive dense factorization (and
    its compile) runs once per session, not once per test."""
    nlp = make_problem(mission, aircraft="tempest", ts=ts, wind_model=1)
    can = canonicalize(nlp)
    v, y, sigma, rhs_v, rhs_c = _state(can)
    dw = 300.0
    dc = jnp.full((can.m,), 0.05)
    # jit everything here and in the parity tests: eagerly these solves
    # are ~50 s of op-by-op dispatch that no cache can help; jitted they
    # compile once and replay from the persistent compile cache.
    dv_d, dy_d = jax.jit(make_dense_kkt(can))(v, y, sigma, dw, dc,
                                              rhs_v, rhs_c)
    return can, (v, y, sigma, rhs_v, rhs_c), dw, dc, dv_d, dy_d


@pytest.mark.parametrize("mission,ts", [("S10", 8), ("G7", 8)])
def test_condensed_matches_dense(mission, ts):
    """The condensed-primal backend solves the exact same saddle system."""
    can, (v, y, sigma, rhs_v, rhs_c), dw, dc, dv_d, dy_d = \
        _dense_oracle(mission, ts)
    cond = jax.jit(make_condensed_kkt(can))
    dv_s, dy_s = cond(v, y, sigma, dw, dc, rhs_v, rhs_c)
    scale = max(1.0, float(jnp.max(jnp.abs(dv_d))))
    np.testing.assert_allclose(np.asarray(dv_s), np.asarray(dv_d), atol=1e-9 * scale)
    yscale = max(1.0, float(jnp.max(jnp.abs(dy_d))))
    np.testing.assert_allclose(np.asarray(dy_s), np.asarray(dy_d), atol=1e-8 * yscale)


@pytest.mark.parametrize("mission,ts", [("S10", 8), ("G7", 8)])
def test_structured_matches_dense(mission, ts):
    can, (v, y, sigma, rhs_v, rhs_c), dw, dc, dv_d, dy_d = \
        _dense_oracle(mission, ts)   # dw=300: every node block PD
    # convexify off: compare the *exact* systems (needs a PD shift).
    struct = jax.jit(make_structured_kkt(can, convexify=False))
    dv_s, dy_s = struct(v, y, sigma, dw, dc, rhs_v, rhs_c)
    assert np.all(np.isfinite(np.asarray(dv_s)))
    scale = float(jnp.max(jnp.abs(dv_d)))
    np.testing.assert_allclose(np.asarray(dv_s), np.asarray(dv_d),
                               atol=1e-9 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(dy_s), np.asarray(dy_d),
                               atol=1e-9 * max(1.0, float(jnp.max(jnp.abs(dy_d)))))


def test_convexified_backend_descent_directions():
    """With convexify=True the solution is a descent direction for the
    (regularized) system even where the exact Hessian is indefinite."""
    nlp = make_problem("S10", aircraft="tempest", ts=8, wind_model=1)
    can = canonicalize(nlp)
    struct = jax.jit(make_structured_kkt(can, convexify=True))
    v, y, sigma, rhs_v, rhs_c = _state(can, seed=3, y_scale=2.0)
    dc = jnp.full((can.m,), 0.1)
    dv, dy = struct(v, y, sigma, 0.0, dc, rhs_v, rhs_c)
    assert np.all(np.isfinite(np.asarray(dv)))
    assert np.all(np.isfinite(np.asarray(dy)))
    # For rhs_c = 0 the step solves the convexified AL Newton system; with
    # rhs_v = -g it must satisfy g @ dv < 0.  Emulate that contract.
    dv2, _ = struct(v, y, sigma, 0.0, dc, rhs_v, jnp.zeros(can.m))
    assert float(rhs_v @ dv2) > 0.0  # dv2 aligned with -g (rhs_v = -g)


@pytest.mark.parametrize("mission,ts", [("S10", 8), ("G7", 8)])
def test_pallas_chain_matches_dense(mission, ts):
    """chain="pallas" (ops/chainkern.py fused kernels, interpret mode on
    CPU) solves the identical saddle system — the same oracle contract the
    scan and cr chains are held to.  Batched (the pallas batch rule needs
    B % 128 == 0; here the vmap fallback path plus the interpreted kernels
    both run via a 128-wide batch)."""
    can, (v, y, sigma, rhs_v, rhs_c), dw, dc, dv_d, dy_d = \
        _dense_oracle(mission, ts)
    pk = make_condensed_kkt(can, chain="pallas")
    B = 128
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    dv_p, dy_p = jax.jit(jax.vmap(
        lambda vv, yy, ss, rv, rc: pk(vv, yy, ss, dw, dc, rv, rc)))(
        tile(v), tile(y), tile(sigma), tile(rhs_v), tile(rhs_c))
    scale = max(1.0, float(jnp.max(jnp.abs(dv_d))))
    np.testing.assert_allclose(np.asarray(dv_p[0]), np.asarray(dv_d),
                               atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(dv_p[-1]), np.asarray(dv_d),
                               atol=1e-8 * scale)
    yscale = max(1.0, float(jnp.max(jnp.abs(dy_d))))
    np.testing.assert_allclose(np.asarray(dy_p[0]), np.asarray(dy_d),
                               atol=1e-7 * yscale)


@pytest.mark.parametrize("mission,ts", [("S10", 8), ("G7", 8)])
def test_cyclic_reduction_matches_dense(mission, ts):
    """chain="cr" (O(log T) cyclic reduction, ops/blocktri.py) solves the
    identical saddle system.  (Non-power-of-two padding parity lives in
    tests/test_chains.py: crp/cr/spike at n=13 against the dense block
    solve — the former ("S10", 13) case here duplicated a ~90 s compile
    for coverage those chain-level tests already provide.)"""
    can, (v, y, sigma, rhs_v, rhs_c), dw, dc, dv_d, dy_d = \
        _dense_oracle(mission, ts)
    cr = jax.jit(make_condensed_kkt(can, chain="cr"))
    dv_s, dy_s = cr(v, y, sigma, dw, dc, rhs_v, rhs_c)
    scale = max(1.0, float(jnp.max(jnp.abs(dv_d))))
    np.testing.assert_allclose(np.asarray(dv_s), np.asarray(dv_d), atol=1e-9 * scale)
    yscale = max(1.0, float(jnp.max(jnp.abs(dy_d))))
    np.testing.assert_allclose(np.asarray(dy_s), np.asarray(dy_d), atol=1e-8 * yscale)


@pytest.mark.parametrize("mission,ts", [("S10", 8), ("G7", 8), ("S10", 13)])
def test_spike_matches_dense(mission, ts):
    """chain="spike" (partitioned/SPIKE elimination, ops/spike.py: parallel
    segment interiors + cyclic-reduction separator chain) solves the
    identical saddle system, including horizons that need identity-block
    padding to a multiple of the segment length."""
    can, (v, y, sigma, rhs_v, rhs_c), dw, dc, dv_d, dy_d = \
        _dense_oracle(mission, ts)
    sp = jax.jit(make_condensed_kkt(can, chain="spike"))
    dv_s, dy_s = sp(v, y, sigma, dw, dc, rhs_v, rhs_c)
    scale = max(1.0, float(jnp.max(jnp.abs(dv_d))))
    np.testing.assert_allclose(np.asarray(dv_s), np.asarray(dv_d), atol=1e-9 * scale)
    yscale = max(1.0, float(jnp.max(jnp.abs(dy_d))))
    np.testing.assert_allclose(np.asarray(dy_s), np.asarray(dy_d), atol=1e-8 * yscale)
