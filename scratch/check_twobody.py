"""CPU parity check: two-body grouped solver vs the classic in-loop
Phase1 group program, same params/seeds (ts=24, f32).  Expect matching
gate statistics (convergence counts, feasibility, cost quantiles) — the
two paths differ only in the phase-switch bookkeeping (delta_w reset,
one fresh eval) and the absence of the patience early-exit, which is a
no-op at exit_df=-1."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, ALMParams
from tol_tpu.solver.batch import make_grouped_solver
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

ts, B, GB, DB = 24, 32, 16, 8
dtype = jnp.float32

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")


def params(**kw):
    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=1e-5, mu_min=1e-5,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=3e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0,
                max_iter=400)
    base.update(kw)
    mi = base.pop("max_iter")
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(mi, jnp.int32))


p1 = params(tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
            max_iter=400)
p2 = params(mu_init=6e-5, kappa_inner=2.0, prox=2.5e-3, max_iter=120)
p2d = params(mu_init=6e-5, kappa_inner=2.0, prox=2.5e-3, max_iter=250)

opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8)

v0 = can.initial_point()
lb, ub, fx = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n), dtype=dtype)
v0s = jnp.where(fx[None], lb[None], jnp.clip(v0[None] + dv, lb[None],
                                             ub[None]))
g_insts = [can.nlp.inst0] * (B // GB)
import jax.tree_util as jtu

insts = jtu.tree_map(lambda *xs: jnp.stack(xs), *([can.nlp.inst0] * B))

classic = make_grouped_solver(can, kkt, opts, group_size=GB, drain_size=DB)
twob = make_grouped_solver(can, kkt, opts, group_size=GB, drain_size=DB,
                           dive_opts=opts, dive_kkt=kkt)

for name, gs in (("classic", classic), ("two-body", twob)):
    r = gs(g_insts, insts, v0s, p1, p2, p2d, 40, -1.0)
    print(f"{name:9s} conv={int(r.converged.sum())}/{B} "
          f"feas={int((r.constr_viol < 1e-4).sum())} "
          f"med_f={float(np.median(r.f)):.6f} "
          f"med_it={int(np.median(r.iterations))} "
          f"med_kkt={float(np.nanmedian(r.kkt_err)):.2e}")
