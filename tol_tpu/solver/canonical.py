"""Canonical NLP form for the interior-point solver.

Transforms a :class:`tol_tpu.problems.base.CollocationNLP` into

    minimize   f(v)
    subject to c(v) = 0,       l <= v <= u

with decision vector ``v = [dt, Z.flat, s]`` (reference SNOPT ordering
``x[0]=dt`` + node-major blocks, src/problem.cpp:151, plus one slack per
inequality boundary row).  Inequality rows ``b_k(v) <= 0`` (G7's
``dist - dmax``, src/problem.cpp:345-350) become ``b_k(v) + s_k = 0`` with
``s_k >= 0``.

Fixed variables (``l == u``: node-0 position and flight-path angle,
src/problem.cpp:256-260) are detected and exposed as a mask; the solver pins
them instead of running barrier terms on an empty interior.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS
from tol_tpu.problems.base import CollocationNLP


@dataclasses.dataclass(frozen=True)
class CanonicalNLP:
    nlp: CollocationNLP
    n: int                       # total variables (1 + (T+1)*11 + n_slack)
    m: int                       # equality rows (8*T + nb)
    n_slack: int
    lb: jax.Array                # (n,)
    ub: jax.Array                # (n,)
    fixed: jax.Array             # (n,) bool, l == u
    f: Callable[[jax.Array], jax.Array]
    c: Callable[[jax.Array], jax.Array]

    def split(self, v: jax.Array):
        """v -> (Z, dt, s)."""
        T = self.nlp.T
        dt = v[0]
        Z = v[1:1 + (T + 1) * NUM_VARS].reshape(T + 1, NUM_VARS)
        s = v[1 + (T + 1) * NUM_VARS:]
        return Z, dt, s

    def join(self, Z: jax.Array, dt: jax.Array, s: jax.Array) -> jax.Array:
        return jnp.concatenate([jnp.reshape(dt, (1,)), Z.reshape(-1), s])

    def initial_point(self) -> jax.Array:
        """Seed trajectory + interior slack initialization."""
        Z, dt = self.nlp.seed()
        b = self.nlp.boundary(Z[0], Z[-1], dt)
        ineq = jnp.asarray(np.flatnonzero(self.nlp.boundary_is_ineq))
        s = jnp.maximum(-b[ineq], 1e-2) if self.n_slack else jnp.zeros(
            (0,), dtype=Z.dtype)
        return self.join(Z, dt, s)


def canonicalize(nlp: CollocationNLP) -> CanonicalNLP:
    T = nlp.T
    dtype = nlp.z_lo.dtype
    ineq_idx = np.flatnonzero(nlp.boundary_is_ineq)
    n_slack = len(ineq_idx)
    n = 1 + (T + 1) * NUM_VARS + n_slack
    m = NUM_STATES * T + nlp.nb

    lb = jnp.concatenate([
        jnp.reshape(nlp.dt_lo, (1,)), nlp.z_lo.reshape(-1),
        jnp.zeros(n_slack, dtype=dtype),
    ])
    ub = jnp.concatenate([
        jnp.reshape(nlp.dt_hi, (1,)), nlp.z_up.reshape(-1),
        jnp.full((n_slack,), 1e20, dtype=dtype),
    ])
    fixed = lb == ub
    ineq = jnp.asarray(ineq_idx)
    slack_scatter = jnp.zeros((nlp.nb, n_slack), dtype=dtype)
    if n_slack:
        slack_scatter = slack_scatter.at[ineq, jnp.arange(n_slack)].set(1.0)

    def split(v):
        dt = v[0]
        Z = v[1:1 + (T + 1) * NUM_VARS].reshape(T + 1, NUM_VARS)
        s = v[1 + (T + 1) * NUM_VARS:]
        return Z, dt, s

    def f(v):
        Z, dt, _ = split(v)
        return nlp.total_cost(Z, dt)

    def c(v):
        Z, dt, s = split(v)
        d = nlp.all_defects(Z, dt).reshape(-1)
        b = nlp.boundary(Z[0], Z[-1], dt) + slack_scatter @ s
        return jnp.concatenate([d, b])

    return CanonicalNLP(
        nlp=nlp, n=n, m=m, n_slack=n_slack,
        lb=lb, ub=ub, fixed=fixed, f=f, c=c,
    )
