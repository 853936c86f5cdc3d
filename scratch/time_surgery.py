"""Program surgery on the REAL solver loop: stub out stages and measure
the per-iteration delta (the only reliable decomposition on a tunneled
TPU, where isolated-stage timings are dominated by argument-passing
dispatch overhead).

Variants (env SURG=comma list, default all):
  full        production crp kkt, ls=8, dualk=4, refine=1
  nokkt       kkt_solve replaced by dv=rhs (keeps evals/ls/duals)
  nols        max_ls=1 (single merit trial)
  nodual      dual_refine_k=0
  norefine    refine=0
  scanchain   chain="scan" (sequential XLA scan, for contrast)

Per-iteration cost by runtime-cap differencing exactly as time_iter.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tol_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import (ALMOptions, ALMParams,  # noqa: E402
                                solve as alm_solve)
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

e = os.environ.get
B = int(e("B", "256"))
ts = 100
dtype = jnp.float32

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")


def params(max_iter):
    base = dict(tol=1e-12, feas_tol=1e-12, mu_init=1e-5, mu_min=1e-6,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=3e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0)
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(max_iter, jnp.int32))


def measure(name, kkt, opts):
    @jax.jit
    def run(v0s, p):
        return jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v,
                                            params=p))(v0s)

    v0 = can.initial_point()
    lb, ub, fx = can.bounds(can.nlp.inst0)
    dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n),
                                  dtype=dtype)
    v0s = jnp.where(fx[None], lb[None],
                    jnp.clip(v0[None] + dv, lb[None], ub[None]))
    t0 = time.time()
    out = run(v0s, params(10))
    jax.block_until_ready(out.f)
    compile_s = time.time() - t0
    walls = {}
    for n_it in (40, 120):
        t0 = time.time()
        out = run(v0s, params(n_it))
        jax.block_until_ready(out.f)
        walls[n_it] = time.time() - t0
    per_it = (walls[120] - walls[40]) / 80.0 * 1000.0
    print(f"B={B:5d} {name:10s} per_iter={per_it:7.2f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)


def kkt_stub(v, y, sigma, dw, gam, rhs_v, rhs_c, inst=None):
    return rhs_v, jnp.zeros(can.m, dtype)


kkt_crp = make_condensed_kkt(can, refine=1, chain="crp")
variants = {
    "full": lambda: measure("full", kkt_crp,
                            ALMOptions(max_iter=2000, dual_refine_k=4,
                                       max_ls=8)),
    "nokkt": lambda: measure("nokkt", kkt_stub,
                             ALMOptions(max_iter=2000, dual_refine_k=4,
                                        max_ls=8)),
    "nols": lambda: measure("nols", kkt_crp,
                            ALMOptions(max_iter=2000, dual_refine_k=4,
                                       max_ls=1)),
    "nodual": lambda: measure("nodual", kkt_crp,
                              ALMOptions(max_iter=2000, dual_refine_k=0,
                                         max_ls=8)),
    "norefine": lambda: measure(
        "norefine", make_condensed_kkt(can, refine=0, chain="crp"),
        ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8)),
    "scanchain": lambda: measure(
        "scanchain", make_condensed_kkt(can, refine=1, chain="scan"),
        ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8)),
    "nokkt_nols_nodual": lambda: measure(
        "nokkt_nols_nodual", kkt_stub,
        ALMOptions(max_iter=2000, dual_refine_k=0, max_ls=1)),
}

sel = e("SURG", "full,nokkt,nols,nodual,norefine,nokkt_nols_nodual")
for name in [x for x in sel.split(",") if x]:
    variants[name]()


def kkt_stage_variants():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from _kkt_stage import make_condensed_kkt as mk_stage

    for st in tuple(x for x in e("STAGES", "assemble,blocks,factor,full").split(",") if x):
        measure(f"kkt:{st}", mk_stage(can, refine=1, chain="crp", stage=st),
                ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8))


if e("KKT_STAGES", "0") == "1":
    kkt_stage_variants()
