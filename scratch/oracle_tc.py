"""External oracle via scipy trust-constr with SPARSE constraint Jacobian.

The S10 ts=100 NLP's J is block-bidiagonal (8 rows x 22 cols per node) —
sparse trust-constr handles n=1112 where dense SLSQP cannot.
"""
import os
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.optimize import minimize, NonlinearConstraint, Bounds

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize

ts = int(os.environ.get("TS", "100"))
mission = os.environ.get("MISSION", "S10")
ac = os.environ.get("AC", "tempest")
nlp = make_problem(mission, aircraft=ac, ts=ts, wind_model=1,
                   dtype=jnp.float64)
can = canonicalize(nlp, scaling="auto")
inst = nlp.inst0

f = jax.jit(lambda v: can.f(v, inst))
g = jax.jit(jax.grad(lambda v: can.f(v, inst)))
c = jax.jit(lambda v: can.c(v, inst))
J = jax.jit(jax.jacfwd(lambda v: can.c(v, inst)))
H_lag = jax.jit(jax.hessian(lambda v, y: can.f(v, inst) + can.c(v, inst) @ y,
                            argnums=0))

lb = np.clip(np.asarray(can.bounds(inst)[0]), -1e19, 1e19)
ub = np.clip(np.asarray(can.bounds(inst)[1]), -1e19, 1e19)
v0 = np.asarray(can.initial_point())

t0 = time.time()
res = minimize(
    lambda v: float(f(jnp.asarray(v))),
    v0, jac=lambda v: np.asarray(g(jnp.asarray(v))),
    method="trust-constr",
    bounds=Bounds(lb, ub),
    constraints=[NonlinearConstraint(
        lambda v: np.asarray(c(jnp.asarray(v))), 0.0, 0.0,
        jac=lambda v: sp.csr_matrix(np.asarray(J(jnp.asarray(v)))))],
    options={"maxiter": int(os.environ.get("MAXIT", "3000")),
             "gtol": 1e-8, "xtol": 1e-12, "verbose": 0})
wall = time.time() - t0
v = res.x
print(f"trust-constr: status={res.status} nit={res.nit} wall={wall:.0f}s")
print("f =", float(f(jnp.asarray(v))), " viol =",
      float(np.max(np.abs(np.asarray(c(jnp.asarray(v)))))))
vp = np.asarray(can.to_physical(jnp.asarray(v)))
Z = vp[1:1 + (ts + 1) * 11].reshape(ts + 1, 11)
print("dt =", vp[0], " z range", Z[:, 2].min(), Z[:, 2].max(),
      " Va range", Z[:, 3].min(), Z[:, 3].max())
gp = os.path.join("tests", f"golden_s10_ts{ts}.npy")
if mission == "S10" and os.path.exists(gp):
    golden = np.load(gp)
    f_star = float(can.f(can.from_physical(jnp.asarray(golden)), inst))
    print("cost gap vs repo golden:",
          (float(f(jnp.asarray(v))) - f_star) / abs(f_star))
np.save(f"scratch/oracle_tc_{mission}_ts{ts}.npy", vp)
