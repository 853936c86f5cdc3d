"""Probe: G7-Skywalker ts=100 end-to-end with the condensed ALM path."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts = int(os.environ.get("TS", "100"))
ac = os.environ.get("AC", "skywalker")
dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

nlp = make_problem("G7", aircraft=ac, ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain=os.environ.get("CHAIN", "cr"))
opts = ALMOptions(tol=float(os.environ.get("TOL", "5e-3")), feas_tol=1e-4,
                  max_iter=int(os.environ.get("MAXIT", "200")),
                  gamma_init=0.01, mu_init=float(os.environ.get("MUINIT", "1e-5")), mu_shrink=0.1,
                  prox=float(os.environ.get("PROX", "3e-3")),
                  dual_refine_k=int(os.environ.get("DUALK", "4")),
                  dual_reset=bool(int(os.environ.get("DUALRESET", "0"))),
                  gamma_eager=bool(int(os.environ.get("GAMEAGER", "1"))),
                  gamma_shrink=0.2, trace=bool(int(os.environ.get("TRACE", "1"))))

t0 = time.time()
out = jax.jit(lambda: alm_solve(can, kkt, opts)).lower().compile()()
jax.block_until_ready(out.f)
print("wall", time.time() - t0)
print("converged", bool(out.converged), "iters", int(out.iterations),
      "kkt", float(out.kkt_err), "viol", float(out.constr_viol),
      "f", float(out.f))
vp = can.to_physical(out.v)
Z = np.asarray(vp[1:1 + (ts + 1) * 11]).reshape(ts + 1, 11)
print("dt", float(vp[0]))
print("z0", np.round(Z[0], 3))
print("zT", np.round(Z[-1], 3))
if opts.trace:
    kkt_tr, mu_tr, gam_tr, dw_tr, viol_tr = [np.asarray(x) for x in out.trace]
    for i in range(0, opts.max_iter, 10):
        print(f"it {i:3d} kkt={kkt_tr[i]:.3e} viol={viol_tr[i]:.3e} "
              f"gam={gam_tr[i]:.1e} dw={dw_tr[i]:.1e}")

# which rows are violated?
cvec = np.asarray(can.c(out.v, can.nlp.inst0))
ii = np.argsort(-np.abs(cvec))[:8]
NS = 8
for i in ii:
    if i < NS * ts:
        print(f"row {i} = defect node {i // NS} state {i % NS}: {cvec[i]:.3e}")
    else:
        print(f"row {i} = boundary {i - NS * ts}: {cvec[i]:.3e}")
# bound activity at the worst nodes
lb, ub, fixed = can.bounds(can.nlp.inst0)
act_lo = np.asarray(out.v - lb) < 1e-6
act_hi = np.asarray(ub - out.v) < 1e-6
print("active lo:", np.flatnonzero(act_lo & ~np.asarray(fixed))[:20])
print("active hi:", np.flatnonzero(act_hi & ~np.asarray(fixed))[:20])
