"""At the stalled final iterate: CG refinement convergence + z absorption."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, _cg, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts, batch = 100, 2
dtype = jnp.float32
nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
opts = ALMOptions(tol=5e-3, feas_tol=1e-4, max_iter=200, gamma_init=0.01,
                  mu_init=1e-5, mu_shrink=0.1, prox=3e-3)
v0 = can.initial_point()
key = jax.random.PRNGKey(0)
dv = 0.01 * jax.random.normal(key, (batch, can.n), dtype=dtype)
lb, ub, fixed = can.bounds(can.nlp.inst0)
v0s = jnp.clip(v0[None, :] + dv, lb[None, :], ub[None, :])
v0s = jnp.where(fixed[None, :], lb[None, :], v0s)
out = jax.jit(jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v)))(v0s)
jax.block_until_ready(out.f)

inst = can.nlp.inst0
BIG = 1e19
has_lb = (lb > -BIG) & ~fixed
has_ub = (ub < BIG) & ~fixed
c_fn = lambda vv: can.c(vv, inst)

b = 0
v, y, zl, zu = out.v[b], out.y[b], out.zl[b], out.zu[b]
_, jvp_c = jax.linearize(c_fn, v)
_, vjp_c = jax.vjp(c_fn, v)
gf = jax.grad(lambda vv: can.f(vv, inst))(v)
g0 = gf - jnp.where(has_lb, zl, 0.0) + jnp.where(has_ub, zu, 0.0)
dl = jnp.where(has_lb, v - lb, 1.0)
du = jnp.where(has_ub, ub - v, 1.0)
sig = jnp.where(has_lb, zl / dl, 0.0) + jnp.where(has_ub, zu / du, 0.0)
w2 = jnp.where(fixed, 0.0, 1.0 / (1.0 + sig))
Nop = lambda yy: jvp_c(w2 * vjp_c(yy)[0])
rhs = -jvp_c(w2 * g0)

for k in (4, 8, 16, 32, 64, 128):
    y_ls = _cg(Nop, rhs, y, k)
    r = jnp.where(fixed, 0.0, g0 + vjp_c(y_ls)[0])
    # weighted vs raw residual
    print(f"k={k:3d} |W r|={float(jnp.max(jnp.abs(jnp.sqrt(w2) * r))):.3e} "
          f"|r|={float(jnp.max(jnp.abs(r))):.3e}")
    # absorb into bound duals: d = r, zl absorbs positive, zu negative
    d = r
    zl2 = jnp.where(has_lb, jnp.maximum(zl + d, 0.0), 0.0)
    used_l = zl2 - jnp.where(has_lb, zl, 0.0)
    left = d - used_l
    zu2 = jnp.where(has_ub, jnp.maximum(zu - left, 0.0), 0.0)
    used_u = jnp.where(has_ub, zu, 0.0) - zu2
    r2 = r - used_l - used_u
    comp_l = jnp.where(has_lb, zl2 * dl, 0.0)
    comp_u = jnp.where(has_ub, zu2 * du, 0.0)
    print(f"      after absorb: |r|={float(jnp.max(jnp.abs(r2))):.3e} "
          f"comp_l={float(jnp.max(comp_l)):.3e} comp_u={float(jnp.max(comp_u)):.3e}")
