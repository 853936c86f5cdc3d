"""Per-phase iteration cost of the two-body group program vs classic,
by runtime-cap differencing on run_group directly (one 128-lane group).

Dive per-iter:    wall(cap=80) - wall(cap=40)   / 40   (both < n1=90)
Endgame per-iter: wall(cap=145) - wall(cap=105) / 40   (both > n1=90)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tol_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, ALMParams
from tol_tpu.solver.batch import make_grouped_solver
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

e = os.environ.get
B = int(e("B", "128"))
dtype = jnp.float32
nlp = make_problem("S10", aircraft="tempest", ts=100, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="crp")


def params(max_iter, **kw):
    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=1e-5, mu_min=1e-5,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=3e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0)
    base.update(kw)
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(max_iter, jnp.int32))


p1 = params(400, tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0)


def p2(cap):
    return params(cap, mu_init=6e-5, kappa_inner=2.0, prox=2.5e-3)


opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8)
dive_opts = ALMOptions(max_iter=2000, dual_refine_k=0,
                       max_ls=int(e("DIVE_LS", "4")), factor_reuse=1)
kkt_dive = make_condensed_kkt(can, refine=int(e("DIVE_REFINE", "0")),
                              chain="crp")

v0 = can.initial_point()
lb, ub, fx = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n), dtype=dtype)
v0s = jnp.where(fx[None], lb[None], jnp.clip(v0[None] + dv, lb[None],
                                             ub[None]))

variants = {
    "classic": make_grouped_solver(can, kkt, opts, group_size=B,
                                   drain_size=B),
    "twobody": make_grouped_solver(can, kkt, opts, group_size=B,
                                   drain_size=B, dive_opts=dive_opts,
                                   dive_kkt=kkt_dive),
}
sel = [x for x in e("VAR", "classic,twobody").split(",") if x]
n1 = jnp.asarray(int(e("N1", "90")), jnp.int32)
xdf = jnp.asarray(-1.0, dtype)

for name in sel:
    rg = variants[name].run_group
    walls = {}
    t0 = time.time()
    out = rg(can.nlp.inst0, v0s, p1, p2(10), n1, xdf)
    jax.block_until_ready(out.f)
    print(f"{name}: compile {time.time() - t0:.0f}s", flush=True)
    for cap in (40, 80, 105, 145):
        best = 1e9
        for _ in range(int(e("REPS", "3"))):
            t0 = time.time()
            out = rg(can.nlp.inst0, v0s, p1, p2(cap), n1, xdf)
            jax.block_until_ready(out.f)
            best = min(best, time.time() - t0)
        walls[cap] = best
    dive_ms = (walls[80] - walls[40]) / 40.0 * 1000.0
    end_ms = (walls[145] - walls[105]) / 40.0 * 1000.0
    print(f"B={B} {name:8s} dive={dive_ms:6.2f} ms/iter "
          f"endgame={end_ms:6.2f} ms/iter "
          f"walls={{40: {walls[40]:.2f}, 80: {walls[80]:.2f}, "
          f"105: {walls[105]:.2f}, 145: {walls[145]:.2f}}}", flush=True)
