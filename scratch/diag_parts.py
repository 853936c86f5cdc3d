"""Decompose the plateau KKT error: is it the multiplier estimate?

Solve bench-config instances, then at the final iterate compute the dual
residual at (a) the ALM multiplier y_al, (b) the least-squares multiplier
(min over y and bound duals), in both f32 and f64.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts = int(os.environ.get("TS", "100"))
batch = int(os.environ.get("BATCH", "4"))
max_iter = int(os.environ.get("MAXIT", "200"))
dtype = jnp.float32

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
opts = ALMOptions(tol=float(os.environ.get("TOL", "5e-3")), feas_tol=1e-4,
                  max_iter=max_iter, gamma_init=0.01, mu_init=1e-5,
                  mu_shrink=0.1, prox=float(os.environ.get("PROX", "3e-3")))

v0 = can.initial_point()
key = jax.random.PRNGKey(0)
dv = 0.01 * jax.random.normal(key, (batch, can.n), dtype=dtype)
lb, ub, fixed = can.bounds(can.nlp.inst0)
v0s = jnp.clip(v0[None, :] + dv, lb[None, :], ub[None, :])
v0s = jnp.where(fixed[None, :], lb[None, :], v0s)

run = jax.jit(jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v)))
out = run(v0s)
jax.block_until_ready(out.f)

inst = can.nlp.inst0
BIG = 1e19
has_lb = np.asarray((lb > -BIG) & ~fixed)
has_ub = np.asarray((ub < BIG) & ~fixed)
fx = np.asarray(fixed)

for b in range(batch):
    v = out.v[b]
    y = out.y[b]
    zl = out.zl[b]
    zu = out.zu[b]
    gf = jax.grad(lambda vv: can.f(vv, inst))(v)
    J = jax.jacfwd(lambda vv: can.c(vv, inst))(v)
    gf64, J64, v64 = [np.asarray(a, np.float64) for a in (gf, J, v)]
    z_term = np.where(has_lb, np.asarray(zl, np.float64), 0.0) - \
        np.where(has_ub, np.asarray(zu, np.float64), 0.0)
    # (a) residual at y_al
    r_al = gf64 + J64.T @ np.asarray(y, np.float64) - z_term
    r_al[fx] = 0.0
    # (b) LSQ over y AND free bound duals: solve min ||gf + J^T y - z||
    # where z entries are free (can absorb residual) on rows with an
    # active-ish bound (slack < 1e-6 scaled).
    dl = np.where(has_lb, np.asarray(v64 - np.asarray(lb, np.float64)), 1.0)
    du = np.where(has_ub, np.asarray(np.asarray(ub, np.float64) - v64), 1.0)
    act = ((dl < 1e-4) & has_lb) | ((du < 1e-4) & has_ub) | fx
    rows = ~act
    A = J64.T[rows]
    rhs = -(gf64 - z_term)[rows]
    ylsq, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    r_lsq = gf64 + J64.T @ ylsq - z_term
    r_lsq[act] = 0.0
    cviol = np.max(np.abs(np.asarray(can.c(v, inst), np.float64)))
    print(f"inst {b}: kkt_rep={float(out.kkt_err[b]):.3e} viol={cviol:.3e} "
          f"|r_d(y_al)|={np.max(np.abs(r_al)):.3e} "
          f"|r_d(y_lsq)|={np.max(np.abs(r_lsq)):.3e} "
          f"|y_al-y_lsq|={np.max(np.abs(np.asarray(y,np.float64)-ylsq)):.3e} "
          f"n_act={act.sum()}")
    # where is the residual concentrated?
    ii = np.argsort(-np.abs(r_al))[:6]
    print("   worst r_al idx:", ii, np.round(r_al[ii], 4))
