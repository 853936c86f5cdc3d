"""Tuning harness for G7-Skywalker ts=100 (phased solver, runtime params).

Mirrors tune_s10.py.  Env: B MAXIT N1MAX EXITDF TOL FEAS PROX MUINIT
GAMINIT GAMEAGER DUALK(static) CHAIN(static) PATIENCE(static) TRACE.
Prints one JSON line; cost gap vs tests/golden_g7_ts100.npy if present.
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
B = int(e("B", "256"))
ts = 100
dtype = jnp.float32

MAXIT_STATIC = int(e("MAXIT_STATIC", "400"))
chain = e("CHAIN", "crp")
refine = int(e("REFINE", "1"))
dual_k = int(e("DUALK", "4"))
trace = e("TRACE", "0") == "1"

opts = ALMOptions(max_iter=MAXIT_STATIC, dual_refine_k=dual_k, trace=trace)

nlp = make_problem("G7", aircraft="skywalker", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=refine, chain=chain)


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


p2 = params(gamma_min=float(e("GAMMIN", "1e-6")),
            tol=float(e("TOL", "5e-3")), feas_tol=float(e("FEAS", "1e-4")),
            prox=float(e("PROX", "3e-3")), mu_init=float(e("MUINIT", "1e-5")),
            mu_shrink=float(e("MUSHRINK", "0.1")),
            gamma_init=float(e("GAMINIT", "0.01")),
            gamma_shrink=float(e("GAMSHRINK", "0.2")),
            gamma_eager=float(e("GAMEAGER", "1")),
            max_iter=int(e("MAXIT", "400")))
p1 = params(tol=1e-12, feas_tol=1e-12, prox=float(e("PROX1", "0.0")),
            mu_init=float(e("MUINIT1", "1e-5")),
            gamma_init=float(e("GAMINIT1", "0.01")),
            gamma_eager=0.0, max_iter=int(e("MAXIT", "400")))
n_max = jnp.asarray(int(e("N1MAX", "90")), jnp.int32)
exit_df = jnp.asarray(float(e("EXITDF", "-1")), dtype)
patience = int(e("PATIENCE", "3"))

v0 = can.initial_point()
lb, ub, fixed = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, can.n), dtype=dtype)
v0s = jnp.clip(v0[None] + dv, lb[None], ub[None])
v0s = jnp.where(fixed[None], lb[None], v0s)


@jax.jit
def run(v0s, p1, p2, n_max, exit_df):
    ph = Phase1(params=p1, n_max=n_max, exit_df=exit_df, patience=patience)
    return jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v,
                                        params=p2, phase1=ph))(v0s)


t0 = time.time()
out = run(v0s, p1, p2, n_max, exit_df)
jax.block_until_ready(out.f)
compile_s = time.time() - t0
t0 = time.time()
out = run(v0s, p1, p2, n_max, exit_df)
jax.block_until_ready(out.f)
wall = time.time() - t0

conv = np.asarray(out.converged)
viol = np.asarray(out.constr_viol)
iters = np.asarray(out.iterations)
res = {
    "batch": B, "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
    "converged": int(conv.sum()), "feasible": int((viol < 1e-4).sum()),
    "solves_per_s": round(conv.sum() / wall, 1),
    "median_kkt": float(np.nanmedian(np.asarray(out.kkt_err))),
    "median_viol": float(np.median(viol)),
    "median_iters": int(np.median(iters)),
    "p90_iters": int(np.percentile(iters, 90)),
    "median_f": float(np.median(np.asarray(out.f, np.float64))),
    "platform": jax.devices()[0].platform,
}
gp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "tests", "golden_g7_ts100.npy")
if os.path.exists(gp):
    golden = np.load(gp)
    f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                         can.nlp.inst0))
    gap = (np.asarray(out.f, np.float64) - f_star) / max(abs(f_star), 1e-9)
    res["median_gap"] = float(np.median(gap))
    res["gate_ok"] = int((conv & (viol < 1e-4) & (gap < 3e-2)).sum())
print(json.dumps(res))
if trace:
    kkt_tr, mu_tr, gam_tr, dw_tr, viol_tr, f_tr = [np.asarray(x)
                                                   for x in out.trace]
    for i in range(0, MAXIT_STATIC, 10):
        print(f"it {i:3d} med_f={np.median(f_tr[:, i]):+.5e} "
              f"med_kkt={np.median(kkt_tr[:, i]):.2e} "
              f"med_viol={np.median(viol_tr[:, i]):.2e} "
              f"med_dw={np.median(dw_tr[:, i]):.1e} "
              f"med_gam={np.median(gam_tr[:, i]):.1e} "
              f"med_mu={np.median(mu_tr[:, i]):.1e}")

if os.environ.get("ROWDIAG", "0") == "1":
    cfun = jax.jit(jax.vmap(lambda v: can.c(v, can.nlp.inst0)))
    C = np.asarray(cfun(out.v))
    NS = 8
    med = np.median(np.max(np.abs(C), axis=1))
    lane = int(np.argsort(np.max(np.abs(C), axis=1))[B // 2])
    c = C[lane]
    ii = np.argsort(-np.abs(c))[:8]
    print(f"median lane {lane} worst rows:")
    for i in ii:
        if i < NS * ts:
            print(f"  defect node {i // NS} state {i % NS}: {c[i]:+.3e}")
        else:
            print(f"  boundary row {i - NS * ts}: {c[i]:+.3e}")
