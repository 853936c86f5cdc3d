"""Diagnose the f32 convergence stall on the bench config (TPU).

Runs a few bench-identical instances with trace mode and prints the
per-iteration KKT / viol / mu / gamma trajectory of the median instance.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts = int(os.environ.get("TS", "100"))
batch = int(os.environ.get("BATCH", "8"))
max_iter = int(os.environ.get("MAXIT", "200"))
dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=int(os.environ.get("REFINE", "1")),
                         chain=os.environ.get("CHAIN", "cr"))
opts = ALMOptions(tol=float(os.environ.get("TOL", "5e-3")), feas_tol=1e-4,
                  max_iter=max_iter, gamma_init=0.01, mu_init=1e-5,
                  mu_shrink=0.1, prox=float(os.environ.get("PROX", "3e-3")),
                  dual_refine_k=int(os.environ.get("DUALK", "0")),
                  dual_reset=bool(int(os.environ.get("DUALRESET", "0"))),
                  gamma_eager=bool(int(os.environ.get("GAMEAGER", "0"))),
                  gamma_shrink=float(os.environ.get("GAMSHRINK", "0.5")),
                  trace=True)

v0 = can.initial_point()
key = jax.random.PRNGKey(0)
dv = 0.01 * jax.random.normal(key, (batch, can.n), dtype=dtype)
lb, ub, fixed = can.bounds(can.nlp.inst0)
v0s = jnp.clip(v0[None, :] + dv, lb[None, :], ub[None, :])
v0s = jnp.where(fixed[None, :], lb[None, :], v0s)

run = jax.jit(jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v)))
t0 = time.time()
out = run(v0s)
jax.block_until_ready(out.f)
print("compile+run", time.time() - t0)

kkt_tr, mu_tr, gam_tr, dw_tr, viol_tr, f_tr = [np.asarray(x) for x in out.trace]
final_kkt = np.asarray(out.kkt_err)
med = int(np.argsort(final_kkt)[batch // 2])
print("final kkt:", final_kkt)
print("converged:", np.asarray(out.converged))
print("iters:", np.asarray(out.iterations))
# first iteration at which the convergence gate holds per instance
tol_ = opts.tol
ok = (kkt_tr <= tol_) & (viol_tr <= 1e-4)
first = np.where(ok.any(axis=1), ok.argmax(axis=1), -1)
print("first-converged iter per instance:", first)
print(f"-- median instance {med} trajectory (every 5 iters) --")
for i in range(0, max_iter, 5):
    print(f"it {i:3d} kkt={kkt_tr[med, i]:.3e} viol={viol_tr[med, i]:.3e} "
          f"mu={mu_tr[med, i]:.1e} gam={gam_tr[med, i]:.1e} dw={dw_tr[med, i]:.1e}")
