"""Polish the trust-constr G7 point with the repo ALM solver (f64 CPU).

bound_push is dropped to 1e-8 so the warm start is not shoved off its
active bounds (the default 1e-2 interior push wrecks warm restarts —
measured: a 1e-2 push from the basin point diverges).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

nlp = make_problem("G7", aircraft="skywalker", ts=100, wind_model=1)
can = canonicalize(nlp, scaling="auto")
inst = nlp.inst0
kkt = make_condensed_kkt(can, refine=1, chain="cr")

vp = np.load("/root/repo/scratch/g7_tc_last.npy")
v0 = can.from_physical(jnp.asarray(vp))
print("warm f =", float(can.f(v0, inst)), flush=True)

opts = ALMOptions(tol=1e-7, feas_tol=1e-8, max_iter=3000, gamma_init=1e-3,
                  mu_init=1e-6, mu_shrink=0.1, prox=1e-3, dual_refine_k=8,
                  gamma_eager=True, gamma_shrink=0.2, gamma_min=1e-8,
                  bound_push=1e-8)
res = alm_solve(can, kkt, opts, v0=v0)
print("ALM: converged", bool(res.converged), "iters", int(res.iterations),
      "kkt", float(res.kkt_err), "viol", float(res.constr_viol),
      "f", float(res.f), flush=True)
vp2 = np.asarray(can.to_physical(res.v))
print("dt", vp2[0])
np.save("/root/repo/scratch/g7_alm_polish.npy", vp2)
