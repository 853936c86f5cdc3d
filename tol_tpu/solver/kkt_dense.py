"""Dense KKT backend (correctness oracle).

Solves the primal-dual Newton system

    [ H + Sigma + delta_w I    J^T          ] [dv]   [rhs_v]
    [ J                        -delta_c I   ] [dy] = [rhs_c]

with exact AD derivatives on the flat canonical NLP.  O((n+m)^3) — intended
for float64 CPU validation and small horizons, not the TPU hot path (that is
``kkt_structured``, which factorizes the same system in O(T) block steps).
Replaces SNOPT's dense QP workspace (ref: snoptProblemA, src/snoptProblem.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tol_tpu.solver.canonical import CanonicalNLP


def make_dense_kkt(can: CanonicalNLP):
    """Returns kkt_solve(v, y, sigma, delta_w, delta_c, rhs_v, rhs_c) -> (dv, dy)."""

    def lagrangian(v, y, inst):
        return can.f(v, inst) + can.c(v, inst) @ y

    hess = jax.hessian(lagrangian, argnums=0)
    jac = jax.jacfwd(can.c, argnums=0)

    def kkt_solve(v, y, sigma, delta_w, delta_c, rhs_v, rhs_c, inst=None):
        """``delta_c`` may be a scalar or per-row (m,) vector."""
        inst = can.nlp._inst(inst)
        _, _, fixed = can.bounds(inst)
        n, m = can.n, can.m
        H = hess(v, y, inst)
        J = jac(v, inst)
        dtype = v.dtype

        K = jnp.zeros((n + m, n + m), dtype=dtype)
        K = K.at[:n, :n].set(H + jnp.diag(sigma + delta_w))
        K = K.at[:n, n:].set(J.T)
        K = K.at[n:, :n].set(J)
        delta_c_rows = jnp.broadcast_to(delta_c, (m,))
        K = K.at[n:, n:].set(-jnp.diag(delta_c_rows))

        # Pin fixed variables: identity row/col, zero rhs.
        fmask = jnp.concatenate([fixed, jnp.zeros(m, dtype=bool)])
        K = jnp.where(fmask[:, None] | fmask[None, :], 0.0, K)
        K = K + jnp.diag(fmask.astype(dtype))
        rhs = jnp.concatenate([jnp.where(fixed, 0.0, rhs_v), rhs_c])

        sol = jnp.linalg.solve(K, rhs)
        return sol[:n], sol[n:]

    return kkt_solve
