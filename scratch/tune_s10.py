"""Tuning harness for the phased S10 bench solve (runtime ALMParams).

One compiled program (persistent-cached); all numeric knobs are runtime
arguments, so sweeps re-run without recompiling.  Env overrides:

  B(atch) MAXIT N1MAX EXITDF TOL FEAS PROX MUINIT MUSHRINK GAMINIT
  GAMSHRINK GAMEAGER DUALK(static!) CHAIN(static!) LS(static!) TRACE

Prints one JSON line with gate stats vs the f64 golden.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import (ALMOptions, ALMParams, Phase1,
                                solve as alm_solve)
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

e = os.environ.get
B = int(e("B", "1024"))
ts = 100
dtype = jnp.float32

# ---- static structure (changing these recompiles) ----
MAXIT_STATIC = int(e("MAXIT_STATIC", "400"))
chain = e("CHAIN", "pallas")
refine = int(e("REFINE", "1"))
dual_k = int(e("DUALK", "4"))
max_ls = int(e("LS", "12"))
trace = e("TRACE", "0") == "1"

opts = ALMOptions(max_iter=MAXIT_STATIC, max_ls=max_ls,
                  dual_refine_k=dual_k, trace=trace)

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=refine, chain=chain)

# ---- runtime params ----
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

p2 = params(tol=float(e("TOL", "5e-3")), feas_tol=float(e("FEAS", "1e-4")),
            prox=float(e("PROX", "3e-3")), mu_init=float(e("MUINIT", "1e-5")),
            mu_shrink=float(e("MUSHRINK", "0.1")),
            gamma_init=float(e("GAMINIT", "0.01")),
            gamma_shrink=float(e("GAMSHRINK", "0.2")),
            gamma_eager=float(e("GAMEAGER", "1")),
            kappa_inner=float(e("KAPPA", "1.0")),
            max_iter=int(e("MAXIT", "400")))
p1 = params(tol=1e-12, feas_tol=1e-12, prox=0.0,
            mu_init=float(e("MUINIT1", "1e-5")),
            mu_shrink=float(e("MUSHRINK1", "0.1")),
            gamma_init=float(e("GAMINIT1", "0.01")),
            gamma_eager=0.0, max_iter=int(e("MAXIT", "400")))
ph1 = Phase1(params=p1,
             n_max=jnp.asarray(int(e("N1MAX", "90")), jnp.int32),
             exit_df=jnp.asarray(float(e("EXITDF", "1e-4")), dtype),
             patience=int(e("PATIENCE", "3")))

v0 = can.initial_point()
lb, ub, fixed = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n), dtype=dtype)
v0s = jnp.clip(v0[None] + dv, lb[None], ub[None])
v0s = jnp.where(fixed[None], lb[None], v0s)


@jax.jit
def run(v0s, p1, p2, n_max, exit_df):
    ph = Phase1(params=p1, n_max=n_max, exit_df=exit_df, patience=ph1.patience)
    return jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v,
                                        params=p2, phase1=ph))(v0s)


t0 = time.time()
out = run(v0s, p1, p2, ph1.n_max, ph1.exit_df)
jax.block_until_ready(out.f)
compile_s = time.time() - t0

t0 = time.time()
out = run(v0s, p1, p2, ph1.n_max, ph1.exit_df)
jax.block_until_ready(out.f)
wall = time.time() - t0

golden = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_s10_ts100.npy"))
f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                     can.nlp.inst0))
gap = (np.asarray(out.f, np.float64) - f_star) / abs(f_star)
conv = np.asarray(out.converged)
viol = np.asarray(out.constr_viol)
ok = conv & (viol < 1e-4) & (gap < 1e-2)
res = {
    "batch": B, "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
    "converged": int(conv.sum()), "feasible": int((viol < 1e-4).sum()),
    "gate_ok": int(ok.sum()), "solves_per_s": round(ok.sum() / wall, 1),
    "median_gap": float(np.median(gap)),
    "p90_gap": float(np.percentile(gap, 90)),
    "median_kkt": float(np.median(np.asarray(out.kkt_err))),
    "median_viol": float(np.median(viol)),
    "median_iters": int(np.median(np.asarray(out.iterations))),
    "p90_iters": int(np.percentile(np.asarray(out.iterations), 90)),
    "p99_iters": int(np.percentile(np.asarray(out.iterations), 99)),
    "max_iters": int(np.max(np.asarray(out.iterations))),
    "median_ph1": int(np.median(np.asarray(out.phase1_iters))),
    "gap_p50_of_conv": float(np.median(gap[conv])) if conv.any() else None,
    "gate_at_cap": {str(c): int((ok & (np.asarray(out.iterations) <= c)).sum())
                    for c in (150, 200, 250, 300)},
    "platform": jax.devices()[0].platform,
}
print(json.dumps(res))
if trace:
    kkt_tr, mu_tr, gam_tr, dw_tr, viol_tr, f_tr = [np.asarray(x)
                                                   for x in out.trace]
    gp = (np.asarray(f_tr, np.float64) - f_star) / abs(f_star)
    for i in range(0, MAXIT_STATIC, 10):
        print(f"it {i:3d} med_gap={np.median(gp[:, i]):+.4e} "
              f"med_kkt={np.median(kkt_tr[:, i]):.2e} "
              f"med_viol={np.median(viol_tr[:, i]):.2e}")
