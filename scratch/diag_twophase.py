"""Two-phase continuation: dive (loose feasibility) then enforce.

Phase 1: prox=0, tol=0 (never converges), N1 iterations — cost dives
through the valley on the infeasible side.
Phase 2: production options warm-started from phase 1 — pull back to
feasibility near the dive basin.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts, batch = 100, int(os.environ.get("BATCH", "8"))
N1 = int(os.environ.get("N1", "60"))
N2 = int(os.environ.get("N2", "80"))
dtype = jnp.float32
nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
kkt1 = make_condensed_kkt(can, refine=int(os.environ.get("R1", "0")) if False else 0,
                          chain=os.environ.get("CH1", "cr"))
import os as _os
opts1 = ALMOptions(tol=1e-12, feas_tol=1e-12, max_iter=N1, gamma_init=0.01,
                   mu_init=1e-5, mu_shrink=0.1, prox=0.0,
                   delta_decay=float(_os.environ.get("DD", "0.2")),
                   max_ls=int(_os.environ.get("LS", "12")),
                   dual_refine_k=0)
opts2 = ALMOptions(tol=5e-3, feas_tol=1e-4, max_iter=N2, gamma_init=0.01,
                   mu_init=1e-5, mu_shrink=0.1, prox=3e-3, dual_refine_k=4,
                   gamma_eager=True, gamma_shrink=0.2)

v0 = can.initial_point()
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (batch, can.n), dtype=dtype)
lb, ub, fixed = can.bounds(can.nlp.inst0)
v0s = jnp.clip(v0[None] + dv, lb[None], ub[None])
v0s = jnp.where(fixed[None], lb[None], v0s)

def solve2(v):
    r1 = alm_solve(can, kkt1, opts1, v0=v)
    return alm_solve(can, kkt, opts2, v0=r1.v, y0=r1.y)

out = jax.jit(jax.vmap(solve2))(v0s)
jax.block_until_ready(out.f)
golden = np.load("tests/golden_s10_ts100.npy")
f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)), can.nlp.inst0))
gap = (np.asarray(out.f, np.float64) - f_star) / abs(f_star)
print("converged:", np.asarray(out.converged).sum(), "/", batch,
      "med iters2:", int(np.median(np.asarray(out.iterations))))
print("gap:", np.round(gap, 4))
print("viol:", np.asarray(out.constr_viol))
print("kkt:", np.asarray(out.kkt_err))
vp = np.asarray(jax.vmap(can.to_physical)(out.v))
print("dt:", vp[:, 0])
