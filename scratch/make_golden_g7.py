"""Generate tests/golden_g7_ts100.npy: f64 CPU solve of G7-Skywalker ts=100."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

nlp = make_problem("G7", aircraft="skywalker", ts=100, wind_model=1)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
opts = ALMOptions(tol=1e-7, feas_tol=1e-8, max_iter=2000, gamma_init=0.01,
                  mu_init=1e-5, mu_shrink=0.1, prox=3e-3, dual_refine_k=4,
                  gamma_eager=True, gamma_shrink=0.2)
res = alm_solve(can, kkt, opts)
print("converged", bool(res.converged), "iters", int(res.iterations),
      "kkt", float(res.kkt_err), "viol", float(res.constr_viol),
      "f", float(res.f))
vp = np.asarray(can.to_physical(res.v))
print("dt", vp[0])
if bool(res.converged):
    np.save("/root/repo/tests/golden_g7_ts100.npy", vp)
    print("saved golden_g7_ts100.npy")
