"""Canonical NLP form for the solvers.

Transforms a :class:`tol_tpu.problems.base.CollocationNLP` into

    minimize   f(v, inst)
    subject to c(v, inst) = 0,       lb(inst) <= v <= ub(inst)

with decision vector ``v = [dt, Z.flat, s]`` (reference SNOPT ordering
``x[0]=dt`` + node-major blocks, src/problem.cpp:151, plus one slack per
inequality boundary row).  Inequality rows ``b_k(v) <= 0`` (G7's
``dist - dmax``, src/problem.cpp:345-350) become ``b_k(v) + s_k = 0`` with
``s_k >= 0``.

Fixed variables (``lb == ub``: node-0 position and flight-path angle,
src/problem.cpp:256-260) are detected dynamically and pinned by the solver.

All callables take the per-scenario :class:`Instance` pytree, so batched
solves are ``jax.vmap`` over stacked instances / initial points.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS
from tol_tpu.problems.base import CollocationNLP, Instance


@dataclasses.dataclass(frozen=True)
class CanonicalNLP:
    nlp: CollocationNLP
    n: int                       # total variables (1 + (T+1)*11 + n_slack)
    m: int                       # equality rows (8*T + nb)
    n_slack: int
    f: Callable[[jax.Array, Instance], jax.Array]
    c: Callable[[jax.Array, Instance], jax.Array]
    bounds: Callable[[Instance], tuple]

    def split(self, v: jax.Array):
        """v -> (Z, dt, s)."""
        T = self.nlp.T
        dt = v[0]
        Z = v[1:1 + (T + 1) * NUM_VARS].reshape(T + 1, NUM_VARS)
        s = v[1 + (T + 1) * NUM_VARS:]
        return Z, dt, s

    def join(self, Z: jax.Array, dt: jax.Array, s: jax.Array) -> jax.Array:
        return jnp.concatenate([jnp.reshape(dt, (1,)), Z.reshape(-1), s])

    def initial_point(self, inst: Instance | None = None) -> jax.Array:
        """Seed trajectory + interior slack initialization."""
        inst = self.nlp._inst(inst)
        Z, dt = self.nlp.seed_fn(inst)
        b = self.nlp.boundary(Z[0], Z[-1], dt, inst)
        ineq = np.flatnonzero(self.nlp.boundary_is_ineq)
        if self.n_slack:
            s = jnp.maximum(-b[jnp.asarray(ineq)], 1e-2)
        else:
            s = jnp.zeros((0,), dtype=Z.dtype)
        return self.join(Z, dt, s)


def canonicalize(nlp: CollocationNLP) -> CanonicalNLP:
    T = nlp.T
    dtype = nlp.inst0.z_lo.dtype
    ineq_idx = np.flatnonzero(nlp.boundary_is_ineq)
    n_slack = len(ineq_idx)
    n = 1 + (T + 1) * NUM_VARS + n_slack
    m = NUM_STATES * T + nlp.nb

    slack_scatter_np = np.zeros((nlp.nb, n_slack))
    for j, r in enumerate(ineq_idx):
        slack_scatter_np[r, j] = 1.0

    def split(v):
        dt = v[0]
        Z = v[1:1 + (T + 1) * NUM_VARS].reshape(T + 1, NUM_VARS)
        s = v[1 + (T + 1) * NUM_VARS:]
        return Z, dt, s

    def f(v, inst):
        Z, dt, _ = split(v)
        return nlp.total_cost(Z, dt, inst)

    def c(v, inst):
        Z, dt, s = split(v)
        d = nlp.all_defects(Z, dt, inst).reshape(-1)
        b = nlp.boundary(Z[0], Z[-1], dt, inst)
        if n_slack:
            b = b + jnp.asarray(slack_scatter_np, dtype=v.dtype) @ s
        return jnp.concatenate([d, b])

    def bounds(inst):
        lb = jnp.concatenate([
            jnp.reshape(inst.dt_lo, (1,)), inst.z_lo.reshape(-1),
            jnp.zeros(n_slack, dtype=dtype),
        ])
        ub = jnp.concatenate([
            jnp.reshape(inst.dt_hi, (1,)), inst.z_up.reshape(-1),
            jnp.full((n_slack,), 1e20, dtype=dtype),
        ])
        return lb, ub, lb == ub

    return CanonicalNLP(
        nlp=nlp, n=n, m=m, n_slack=n_slack, f=f, c=c, bounds=bounds,
    )
