"""r05 G7 schedule sweep on the bench-identical grouped two-body path.

All knobs runtime — one compile serves every config.  Gate = KKT
certificate + feasibility (G7 gates on the certificate; cost is a
connected soaring valley, see BASELINE.md).
Args: comma tuples n1,cap,budget,gamma_shrink_milli (e.g. 40,360,600,120).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tol_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from bench import _params, _stack_instances  # noqa: E402
from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions  # noqa: E402
from tol_tpu.solver.batch import make_grouped_solver  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

dtype = jnp.float32
ts, batch, GB, DB = 100, 256, 128, 128
nlp = make_problem("G7", aircraft="skywalker", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="crp")
kkt_d = make_condensed_kkt(can, refine=0, chain="crp")
opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8, factor_reuse=1)
dive_opts = ALMOptions(max_iter=2000, dual_refine_k=0, max_ls=4,
                       factor_reuse=1)
gs = make_grouped_solver(can, kkt, opts, group_size=GB, drain_size=DB,
                         dive_opts=dive_opts, dive_kkt=kkt_d)

v0 = can.initial_point()
lb, ub, fx = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (batch, can.n), dtype)
v0s = jnp.where(fx[None], lb[None],
                jnp.clip(v0[None] + dv, lb[None], ub[None]))
gi = [can.nlp.inst0] * (batch // GB)
inst = _stack_instances([can.nlp.inst0] * batch)
p1 = _params(dtype, tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
             max_iter=600)


def run(n1, cap, budget, gsh, mu=6e-5, kap=2.0):
    kw = dict(tol=5e-3, feas_tol=1e-4, gamma_min=5e-6, prox=2.5e-3,
              mu_init=mu, kappa_inner=kap, gamma_shrink=gsh)
    p2 = _params(dtype, max_iter=cap, **kw)
    p2d = _params(dtype, max_iter=budget, **kw)
    o = gs(gi, inst, v0s, p1, p2, p2d, n1, -1.0)   # warm
    t0 = time.time()
    o = gs(gi, inst, v0s, p1, p2, p2d, n1, -1.0)
    w = time.time() - t0
    ok = np.asarray(o.converged) & (np.asarray(o.constr_viol) < 1e-4)
    print(f"n1={n1} cap={cap} budget={budget} gsh={gsh} mu={mu} kap={kap}: "
          f"{ok.sum()}/{batch} ok, {ok.sum() / w:.1f} solves/s "
          f"(wall {w:.2f}s), median iters "
          f"{int(np.median(np.asarray(o.iterations)))}, p90 "
          f"{int(np.percentile(np.asarray(o.iterations), 90))}", flush=True)


for a in (sys.argv[1:] or ["40,360,600,120"]):
    t = a.split(",")
    run(int(t[0]), int(t[1]), int(t[2]), float(t[3]) / 1000.0,
        *([float(t[4])] if len(t) > 4 else []),
        *([float(t[5])] if len(t) > 5 else []))
