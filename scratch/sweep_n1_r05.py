"""r05 margin sweep: flagship dive length n1 x group cap, runtime-only.

All knobs here are runtime ALMParams/args — one compile serves every
config.  Reports gated solves/s + median cost gap per config (VERDICT
r04 task 4: find >=350 solves/s at median gap <= 7e-3).
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
ts, batch, GB, DB = 100, 1024, 128, 128
nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="crp")
kkt_d = make_condensed_kkt(can, refine=0, chain="crp")
opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8, factor_reuse=1)
dive_opts = ALMOptions(max_iter=2000, dual_refine_k=0, max_ls=4,
                       factor_reuse=1)
gs = make_grouped_solver(can, kkt, opts, group_size=GB, drain_size=DB,
                         dive_opts=dive_opts, dive_kkt=kkt_d)

v0 = jax.vmap(can.initial_point)(_stack_instances([can.nlp.inst0] * batch))
lb, ub, fx = jax.vmap(can.bounds)(_stack_instances([can.nlp.inst0] * batch))
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (batch, can.n), dtype)
v0s = jnp.where(fx, lb, jnp.clip(v0 + dv, lb, ub))
gi = [can.nlp.inst0] * (batch // GB)
inst = _stack_instances([can.nlp.inst0] * batch)

gold = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_s10_ts100.npy"))
f_star = float(can.f(can.from_physical(jnp.asarray(gold, dtype)),
                     can.nlp.inst0))

p1 = _params(dtype, tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
             max_iter=250)


def run(n1, cap1, budget=250):
    p2 = _params(dtype, tol=5e-3, feas_tol=1e-4, mu_init=6e-5,
                 kappa_inner=2.0, prox=2.5e-3, max_iter=cap1)
    p2d = _params(dtype, tol=5e-3, feas_tol=1e-4, mu_init=6e-5,
                  kappa_inner=2.0, prox=2.5e-3, max_iter=budget)
    o = gs(gi, inst, v0s, p1, p2, p2d, n1, -1.0)   # warm/compile
    t0 = time.time()
    o = gs(gi, inst, v0s, p1, p2, p2d, n1, -1.0)
    w = time.time() - t0
    gap = (np.asarray(o.f, np.float64) - f_star) / max(abs(f_star), 1e-9)
    ok = (np.asarray(o.converged) & (np.asarray(o.constr_viol) < 1e-4)
          & (gap < 1e-2))
    print(f"n1={n1} cap1={cap1} budget={budget}: {ok.sum()}/{batch} ok, "
          f"{ok.sum() / w:.1f} solves/s (wall {w:.2f}s), "
          f"median gap {np.median(gap):.3e}, "
          f"p75 gap {np.percentile(gap, 75):.3e}", flush=True)


configs = [(90, 145, 250), (100, 155, 250), (110, 165, 250),
           (110, 175, 250), (120, 180, 250)]
if len(sys.argv) > 1:
    configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
for n1, cap1, budget in configs:
    run(n1, cap1, budget)
