"""Cost-gap-vs-iteration on the bench config (CPU f32 by default)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts, batch = 100, int(os.environ.get("BATCH", "8"))
max_iter = int(os.environ.get("MAXIT", "300"))
dtype = jnp.float32
nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
opts = ALMOptions(tol=float(os.environ.get("TOL", "5e-3")), feas_tol=1e-4,
                  max_iter=max_iter, gamma_init=0.01, mu_init=1e-5,
                  mu_shrink=0.1, prox=float(os.environ.get("PROX", "3e-3")),
                  dual_refine_k=int(os.environ.get("DUALK", "4")),
                  gamma_eager=True, gamma_shrink=0.2, trace=True)

v0 = can.initial_point()
key = jax.random.PRNGKey(0)
dv = 0.01 * jax.random.normal(key, (batch, can.n), dtype=dtype)
lb, ub, fixed = can.bounds(can.nlp.inst0)
v0s = jnp.clip(v0[None, :] + dv, lb[None, :], ub[None, :])
v0s = jnp.where(fixed[None, :], lb[None, :], v0s)

out = jax.jit(jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v)))(v0s)
jax.block_until_ready(out.f)

golden = np.load("tests/golden_s10_ts100.npy")
f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                     can.nlp.inst0))
kkt_tr, mu_tr, gam_tr, dw_tr, viol_tr, f_tr = [np.asarray(x) for x in out.trace]
gap = (np.asarray(f_tr, np.float64) - f_star) / abs(f_star)
print("f_star:", f_star)
for i in range(0, max_iter, 10):
    print(f"it {i:3d} med_gap={np.median(gap[:, i]):+.4e} "
          f"med_kkt={np.median(kkt_tr[:, i]):.2e} "
          f"med_viol={np.median(viol_tr[:, i]):.2e}")
