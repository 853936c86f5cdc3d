"""Generate tests/golden_storm_ts100.npy: certified f64 S10-Tempest
ts=100 solve against the NONUNIFORM demo storm grid (wind model 3).

The bench's storm config previously gated against the model-1 oracle on
a grid that replicated the linear field (trilinear exact).  This oracle
is solved on the genuinely nonuniform vortex+thermal+saturating-shear
grid (tol_tpu.io.storm.make_demo_storm_grid) — the SAME WindGrid the
bench storm config flies — so the bench cost-gap gate is solver-vs-
solver on the identical NLP.

Stage 1: the repo's ALM solver (f64, CPU) to its certificate.
Stage 2: scipy trust-constr (EXTERNAL solver, sparse Jacobian) polishes
to gtol 1e-9.  Saved (physical units) when feasible to 1e-8 and the
cost does not regress.

Reference context: /root/reference/src/problem.cpp:544-695 (storm DB
trilinear interpolation), problems/S10/snopt.param:6-7 (tolerances).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402
from scipy.optimize import Bounds, NonlinearConstraint, minimize  # noqa: E402

from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.io.storm import make_demo_storm_grid  # noqa: E402
from tol_tpu.models.wind import WindConfig  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

grid = make_demo_storm_grid()
# order=2 (C1 quadratic B-spline): trilinear's cell-face kinks leave the
# nonuniform-field NLP without pointwise stationarity (measured: f64 KKT
# stalls ~1e+1, feasibility ~4e-3); the C1 field restores the full
# certificate (ts=24 probe: KKT 9e-8, viol 9.5e-9).
wcfg = WindConfig(model=3, east0=17400.0, north0=25800.0, up0=200.0,
                  grid=grid, order=2)
nlp = make_problem("S10", aircraft="tempest", ts=100, wind_model=3,
                   wind=wcfg)
can = canonicalize(nlp, scaling="auto")
inst = nlp.inst0
kkt = make_condensed_kkt(can, refine=1, chain="cr")

opts1 = ALMOptions(tol=1e-7, feas_tol=1e-8, max_iter=3000,
                   gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                   prox=3e-3, dual_refine_k=4, gamma_eager=True,
                   gamma_shrink=0.2)
t0 = time.time()
res = alm_solve(can, kkt, opts1)
print("stage1 (ALM f64): iters", int(res.iterations),
      "kkt", float(res.kkt_err), "viol", float(res.constr_viol),
      "f", float(res.f), f"({time.time() - t0:.0f}s)", flush=True)

f = jax.jit(lambda v: can.f(v, inst))
g = jax.jit(jax.grad(lambda v: can.f(v, inst)))
c = jax.jit(lambda v: can.c(v, inst))
J = jax.jit(jax.jacfwd(lambda v: can.c(v, inst)))

lb = np.clip(np.asarray(can.bounds(inst)[0]), -1e19, 1e19)
ub = np.clip(np.asarray(can.bounds(inst)[1]), -1e19, 1e19)
v1 = np.clip(np.asarray(res.v), lb, ub)

t0 = time.time()
out = minimize(
    lambda v: float(f(jnp.asarray(v))),
    v1, jac=lambda v: np.asarray(g(jnp.asarray(v))),
    method="trust-constr",
    bounds=Bounds(lb, ub),
    constraints=[NonlinearConstraint(
        lambda v: np.asarray(c(jnp.asarray(v))), 0.0, 0.0,
        jac=lambda v: sp.csr_matrix(np.asarray(J(jnp.asarray(v)))))],
    options={"maxiter": int(os.environ.get("MAXIT", "2000")),
             "gtol": 1e-9, "xtol": 1e-12, "verbose": 1})
print(f"stage2 (trust-constr): {time.time() - t0:.0f}s "
      f"f {out.fun:.9e} constr_viol {out.constr_violation:.3e} "
      f"status {out.status}", flush=True)

viol = float(np.max(np.abs(np.asarray(c(jnp.asarray(out.x))))))
f_alm, f_tc = float(res.f), float(out.fun)
best = out.x if (viol < 1e-8 and f_tc <= f_alm + 1e-9) else np.asarray(res.v)
which = "trust-constr" if best is out.x else "ALM stage1"
v_best = jnp.asarray(best)
viol_best = float(np.max(np.abs(np.asarray(c(v_best)))))
print(f"selected {which}: f {float(f(v_best)):.9e} viol {viol_best:.3e}")
assert viol_best < 1e-7, "golden candidate infeasible"

vp = np.asarray(can.to_physical(v_best), dtype=np.float64)
dst = os.path.join("/root/repo", "tests", "golden_storm_ts100.npy")
np.save(dst, vp)
print("saved", dst)
