"""Time the storm-grid grouped solve per interp lowering (r05).

Builds the bench's exact storm config (config 5) for each model-3
interpolation mode and times the grouped+two-body solve end-to-end.
Usage: python scratch/time_storm_interp.py [modes...]
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
from tol_tpu.io.storm import make_demo_storm_grid  # noqa: E402
from tol_tpu.models.wind import WindConfig  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions  # noqa: E402
from tol_tpu.solver.batch import make_grouped_solver  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

modes = sys.argv[1:] or ["onehot", "separable"]
dtype = jnp.float32
ts, sb, GB, DB = 100, 256, 128, 128
grid = make_demo_storm_grid()
gold = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_storm_ts100.npy"))

for mode in modes:
    wcfg = WindConfig(model=3, east0=17400.0, north0=25800.0, up0=200.0,
                      grid=grid, order=2, interp=mode)
    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=3,
                       wind=wcfg, dtype=dtype)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=1, chain="crp")
    kkt_d = make_condensed_kkt(can, refine=0, chain="crp")
    opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=4,
                      factor_reuse=1)
    dive_opts = ALMOptions(max_iter=2000, dual_refine_k=0, max_ls=4,
                           factor_reuse=1)
    gs = make_grouped_solver(can, kkt, opts, group_size=GB, drain_size=DB,
                             dive_opts=dive_opts, dive_kkt=kkt_d)
    p1 = _params(dtype, tol=1e-12, feas_tol=1e-12, prox=0.0,
                 gamma_eager=0.0, max_iter=250)
    p2 = _params(dtype, tol=5e-3, feas_tol=1e-4, mu_init=6e-5,
                 kappa_inner=2.0, prox=2.5e-3, max_iter=175)
    p2d = _params(dtype, tol=5e-3, feas_tol=1e-4, mu_init=6e-5,
                  kappa_inner=2.0, prox=2.5e-3, max_iter=250)
    v0 = can.initial_point()
    lb, ub, fx = can.bounds(can.nlp.inst0)
    dv = 0.01 * jax.random.normal(jax.random.PRNGKey(3), (sb, can.n), dtype)
    v0s = jnp.where(fx[None], lb[None], jnp.clip(v0[None] + dv, lb[None],
                                                 ub[None]))
    gi = [can.nlp.inst0] * (sb // GB)
    inst = _stack_instances([can.nlp.inst0] * sb)
    t0 = time.time()
    o = gs(gi, inst, v0s, p1, p2, p2d, 90, -1.0)
    c_s = time.time() - t0
    t0 = time.time()
    o = gs(gi, inst, v0s, p1, p2, p2d, 90, -1.0)
    w = time.time() - t0
    conv = np.asarray(o.converged)
    feas = np.asarray(o.constr_viol) < 1e-4
    f_star = float(can.f(can.from_physical(jnp.asarray(gold, dtype)),
                         can.nlp.inst0))
    gap = (np.asarray(o.f, np.float64) - f_star) / max(abs(f_star), 1e-9)
    ok = conv & feas & (gap < 1e-2)
    print(f"{mode}: wall {w:.3f}s (compile {c_s - w:.0f}s) "
          f"ok {ok.sum()}/{sb} -> {ok.sum() / w:.1f} solves/s "
          f"median gap {np.median(gap):.2e} median iters "
          f"{int(np.median(np.asarray(o.iterations)))}", flush=True)
