"""Generate tests/golden_g7_ts100.npy: certified f64 G7-Skywalker ts=100.

Stage 1: the repo's ALM solver (f64, CPU) reaches the basin (KKT ~1e-5;
the first-order dual update crawls below that on this degenerate NLP).
Stage 2: scipy trust-constr (EXTERNAL solver, sparse constraint Jacobian)
polishes from the stage-1 point to gtol 1e-9 — the golden is therefore
externally produced, not just externally refereed.  Saved when the final
point is feasible to 1e-8 and improves (or matches) the stage-1 cost.

Mirrors the S10 oracle pipeline (scratch/oracle_tc.py,
tests/test_external_oracle.py); reference optimality context:
/root/reference/problems/G7/snopt.param:6 (opt tol 1e-4).
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
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

nlp = make_problem("G7", aircraft="skywalker", ts=100, wind_model=1)
can = canonicalize(nlp, scaling="auto")
inst = nlp.inst0
kkt = make_condensed_kkt(can, refine=1, chain="cr")

warm = os.environ.get("WARM", "")
if warm:
    vp_in = np.load(warm)
    v_warm = can.from_physical(jnp.asarray(vp_in))

    class _R:  # stand-in for the stage-1 result
        v = v_warm
        f = float(can.f(v_warm, inst))
        iterations = 0
        kkt_err = float("nan")
        constr_viol = float("nan")

    res = _R()
    print("warm start from", warm, " f =", res.f, flush=True)
else:
    opts1 = ALMOptions(tol=1e-7, feas_tol=1e-8, max_iter=2000,
                       gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                       prox=3e-3, dual_refine_k=4, gamma_eager=True,
                       gamma_shrink=0.2)
    res = alm_solve(can, kkt, opts1)
    print("stage1 (ALM f64): iters", int(res.iterations),
          "kkt", float(res.kkt_err), "viol", float(res.constr_viol),
          "f", float(res.f), flush=True)

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
    options={"maxiter": int(os.environ.get("MAXIT", "3000")),
             "gtol": 1e-9, "xtol": 1e-14, "verbose": 0})
print(f"stage2 (trust-constr): status={out.status} nit={out.nit} "
      f"wall={time.time() - t0:.0f}s optimality={out.optimality:.3e} "
      f"constr_violation={out.constr_violation:.3e}", flush=True)
v = jnp.asarray(out.x)
f2 = float(f(v))
viol2 = float(np.max(np.abs(np.asarray(c(v)))))
print("f", f2, "(stage1", float(res.f), ") viol", viol2)
vp = np.asarray(can.to_physical(v))
print("dt", vp[0])
np.save("/root/repo/scratch/g7_tc_last.npy", vp)   # chain via WARM=
if (viol2 <= 1e-8 and f2 <= float(res.f) + 1e-9
        and float(out.optimality) < float(os.environ.get("OPT_TOL", "1e-6"))):
    np.save("/root/repo/tests/golden_g7_ts100.npy", vp)
    print("saved golden_g7_ts100.npy  f* =", f2)
else:
    print("NOT SAVED (chain with WARM=scratch/g7_tc_last.npy)")
