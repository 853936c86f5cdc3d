"""Coarse-to-fine horizon continuation test for the S10 flagship.

Dive at ts=TS1 (cheap iterations), linearly prolong the trajectory in
time to ts=100, then run the endgame program (phase flag disabled via
N1MAX=0).  Env: B TS1 N1 MAXIT2 CHAIN REFINE DUALK + endgame knobs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tol_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import (ALMOptions, ALMParams, Phase1,
                                solve as alm_solve)
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

e = os.environ.get
B = int(e("B", "1024"))
TS1 = int(e("TS1", "25"))
TS2 = 100
dtype = jnp.float32

chain = e("CHAIN", "crp")
refine = int(e("REFINE", "1"))
dual_k = int(e("DUALK", "4"))
MAXIT_STATIC = 400

opts = ALMOptions(max_iter=MAXIT_STATIC, dual_refine_k=dual_k)


def build(ts):
    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                       dtype=dtype)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=refine, chain=chain)
    return can, kkt


can1, kkt1 = build(TS1)
can2, kkt2 = build(TS2)


def params(**kw):
    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=1e-5, mu_min=0.0,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=3e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0,
                max_iter=MAXIT_STATIC)
    base.update(kw)
    if base["mu_min"] == 0.0:
        base["mu_min"] = min(base["tol"] / 10.0, base["mu_init"])
    mi = base.pop("max_iter")
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(mi, jnp.int32))


# Dive params (phase-1 style), run as p2 with huge tol never met -> fixed
# N1 iterations at ts=TS1.
N1 = int(e("N1", "90"))
p_dive = params(tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
                max_iter=N1)
# Endgame params at ts=100.
p_end = params(tol=float(e("TOL", "5e-3")), feas_tol=float(e("FEAS", "1e-4")),
               prox=float(e("PROX", "3e-3")),
               max_iter=int(e("MAXIT2", "310")))
p_dive_fine = params(tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
                     max_iter=int(e("MAXIT2", "310")))
zero32 = jnp.asarray(0, jnp.int32)
ph_off1 = Phase1(params=p_dive, n_max=jnp.asarray(10 ** 9, jnp.int32),
                 exit_df=jnp.asarray(-1.0, dtype), patience=3)
ph_off2 = Phase1(params=p_end,
                 n_max=jnp.asarray(int(e("N1FINE", "0")), jnp.int32),
                 exit_df=jnp.asarray(-1.0, dtype), patience=3)

v0 = can1.initial_point()
lb1, ub1, fx1 = can1.bounds(can1.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can1.n), dtype=dtype)
v01 = jnp.clip(v0[None] + dv, lb1[None], ub1[None])
v01 = jnp.where(fx1[None], lb1[None], v01)


@jax.jit
def dive(v0s, p):
    return jax.vmap(lambda v: alm_solve(can1, kkt1, opts, v0=v, params=p,
                                        phase1=ph_off1))(v0s)


@jax.jit
def endgame(v0s, y0s, p, p1f, n1f):
    ph = Phase1(params=p1f, n_max=n1f, exit_df=ph_off2.exit_df, patience=3)
    return jax.vmap(lambda v, y: alm_solve(can2, kkt2, opts, v0=v, y0=y,
                                           params=p, phase1=ph))(v0s, y0s)


def prolong(v_coarse):
    """(B, n1) coarse decision vectors -> (B, n2) fine, linear in time."""
    Z = v_coarse[:, 1:1 + (TS1 + 1) * 11].reshape(B, TS1 + 1, 11)
    dt1 = v_coarse[:, 0]
    t_c = jnp.linspace(0.0, 1.0, TS1 + 1)
    t_f = jnp.linspace(0.0, 1.0, TS2 + 1)
    Zf = jax.vmap(lambda Zb: jax.vmap(
        lambda col: jnp.interp(t_f, t_c, col))(Zb.T).T)(Z)
    # same physical tfinal: dt2 = dt1 * TS1 / TS2 (scaled dt identically)
    dt2 = dt1 * (TS1 / TS2) * float(can1.scaling.d_dt / can2.scaling.d_dt)
    # chi: already continuous (no wrap in solver variables)
    sc1 = can1.scaling.d_z
    sc2 = can2.scaling.d_z
    Zf = Zf * (sc1 / sc2)[None, None, :]
    return jnp.concatenate([dt2[:, None], Zf.reshape(B, -1)], axis=1)


t0 = time.time()
r1 = dive(v01, p_dive)
jax.block_until_ready(r1.f)
compile1 = time.time() - t0
t0 = time.time()
r1 = dive(v01, p_dive)
jax.block_until_ready(r1.f)
wall1 = time.time() - t0

lb2, ub2, fx2 = can2.bounds(can2.nlp.inst0)
vf = prolong(r1.v)
vf = jnp.clip(vf, lb2[None], ub2[None])
vf = jnp.where(fx2[None], lb2[None], vf)
y0s = jnp.zeros((B, can2.m), dtype)

t0 = time.time()
r2 = endgame(vf, y0s, p_end, p_dive_fine, ph_off2.n_max)
jax.block_until_ready(r2.f)
compile2 = time.time() - t0
t0 = time.time()
vf2 = jnp.clip(prolong(r1.v), lb2[None], ub2[None])
vf2 = jnp.where(fx2[None], lb2[None], vf2)
r2 = endgame(vf2, y0s, p_end, p_dive_fine, ph_off2.n_max)
jax.block_until_ready(r2.f)
wall2 = time.time() - t0

golden = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_s10_ts100.npy"))
f_star = float(can2.f(can2.from_physical(jnp.asarray(golden, dtype)),
                      can2.nlp.inst0))
gap = (np.asarray(r2.f, np.float64) - f_star) / abs(f_star)
conv = np.asarray(r2.converged)
viol = np.asarray(r2.constr_viol)
ok = conv & (viol < 1e-4) & (gap < 1e-2)
iters = np.asarray(r2.iterations)
res = {
    "batch": B, "ts1": TS1, "n1": N1,
    "wall1_s": round(wall1, 3), "wall2_s": round(wall2, 3),
    "wall_total_s": round(wall1 + wall2, 3),
    "compile_s": round(compile1 + compile2, 1),
    "converged": int(conv.sum()), "gate_ok": int(ok.sum()),
    "solves_per_s": round(ok.sum() / (wall1 + wall2), 1),
    "median_gap": float(np.median(gap)),
    "p90_gap": float(np.percentile(gap, 90)),
    "median_viol": float(np.median(viol)),
    "median_iters2": int(np.median(iters)),
    "p90_iters2": int(np.percentile(iters, 90)),
    "max_iters2": int(np.max(iters)),
}
print(json.dumps(res))
