"""Independent oracle: scipy SLSQP / trust-constr on the S10 ts=100 NLP.

Breaks the self-referential golden (VERDICT Missing #4): an external f64
solver, same seed, same canonical NLP.  Where does it land on the
two-basin structure (slow level loop dt~0.3335 vs fast zoom loop
dt~0.3277)?
"""
import os
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize, NonlinearConstraint, Bounds

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize

ts = int(os.environ.get("TS", "100"))
nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                   dtype=jnp.float64)
can = canonicalize(nlp, scaling="auto")
inst = nlp.inst0

f = jax.jit(lambda v: can.f(v, inst))
g = jax.jit(jax.grad(lambda v: can.f(v, inst)))
c = jax.jit(lambda v: can.c(v, inst))
J = jax.jit(jax.jacfwd(lambda v: can.c(v, inst)))

lb, ub, fixed = can.bounds(inst)
lb = np.asarray(lb); ub = np.asarray(ub)
lb = np.clip(lb, -1e19, 1e19); ub = np.clip(ub, -1e19, 1e19)
v0 = np.asarray(can.initial_point())

method = os.environ.get("METHOD", "SLSQP")
t0 = time.time()
if method == "SLSQP":
    res = minimize(lambda v: float(f(jnp.asarray(v))),
                   v0, jac=lambda v: np.asarray(g(jnp.asarray(v))),
                   method="SLSQP",
                   bounds=Bounds(lb, ub),
                   constraints=[{"type": "eq",
                                 "fun": lambda v: np.asarray(c(jnp.asarray(v))),
                                 "jac": lambda v: np.asarray(J(jnp.asarray(v)))}],
                   options={"maxiter": 800, "ftol": 1e-10})
else:
    res = minimize(lambda v: float(f(jnp.asarray(v))),
                   v0, jac=lambda v: np.asarray(g(jnp.asarray(v))),
                   method="trust-constr",
                   bounds=Bounds(lb, ub),
                   constraints=[NonlinearConstraint(
                       lambda v: np.asarray(c(jnp.asarray(v))), 0.0, 0.0,
                       jac=lambda v: np.asarray(J(jnp.asarray(v))))],
                   options={"maxiter": 3000, "gtol": 1e-9, "xtol": 1e-12})
wall = time.time() - t0
v = res.x
golden = np.load("tests/golden_s10_ts100.npy") if ts == 100 else None
print(f"{method}: status={res.status} nit={res.nit} wall={wall:.1f}s")
print("f =", float(f(jnp.asarray(v))), " viol =",
      float(np.max(np.abs(np.asarray(c(jnp.asarray(v)))))))
vp = np.asarray(can.to_physical(jnp.asarray(v)))
Z = vp[1:1 + (ts + 1) * 11].reshape(ts + 1, 11)
print("dt =", vp[0], " z range", Z[:, 2].min(), Z[:, 2].max(),
      " Va range", Z[:, 3].min(), Z[:, 3].max())
if golden is not None:
    f_star = float(can.f(can.from_physical(jnp.asarray(golden)), inst))
    print("cost gap vs repo golden:",
          (float(f(jnp.asarray(v))) - f_star) / abs(f_star))
