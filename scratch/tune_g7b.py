"""G7-Skywalker iteration-count tuning (bench config 2).

r03 bench: median 438 iters at cap 600, 110 solves/s.  Sweep runtime
schedules (and optional dive phase) on the bench-identical program;
gate = converged & feasible (see BASELINE.md: G7 gates on the KKT
certificate; cost gap vs best-known is informational).
Env: CAPS, N1S, SCHEDS like tune_sched; GB group size.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tol_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import (ALMOptions, ALMParams, Phase1,  # noqa: E402
                                solve as alm_solve)
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

e = os.environ.get
ts = 100
dtype = jnp.float32
B = int(e("B", "256"))

nlp = make_problem("G7", aircraft="skywalker", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="crp")
opts = ALMOptions(max_iter=2000, dual_refine_k=int(e("DUALK", "4")), max_ls=8)


def params(**kw):
    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=1e-5, mu_min=1e-5,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=5e-6,
                gamma_shrink=0.2, prox=1e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0,
                max_iter=600)
    base.update(kw)
    mi = base.pop("max_iter")
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(mi, jnp.int32))


@jax.jit
def run(v0s, p1, p2, n_max):
    ph = Phase1(params=p1, n_max=n_max,
                exit_df=jnp.asarray(-1.0, dtype), patience=3)
    return jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v, params=p2,
                                        phase1=ph))(v0s)


v0 = can.initial_point()
lb, ub, fx = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, can.n), dtype=dtype)
v0s = jnp.where(fx[None], lb[None], jnp.clip(v0[None] + dv, lb[None], ub[None]))

bk = np.load(os.path.join("tests", "g7_bestknown_ts100.npy"))
f_bk = float(can.f(can.from_physical(jnp.asarray(bk, dtype)), can.nlp.inst0))

p1_dive = params(tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0)

caps = [int(x) for x in e("CAPS", "600").split(",")]
n1s = [int(x) for x in e("N1S", "0").split(",")]
sched_grid = [dict()]
if e("SCHEDS", ""):
    sched_grid = []
    for spec in e("SCHEDS", "").split(";"):
        d = {}
        for kv in spec.split(","):
            if kv:
                k, v = kv.split("=")
                d[k] = float(v)
        sched_grid.append(d)

o = run(v0s, p1_dive, params(max_iter=5), jnp.asarray(0, jnp.int32))
jax.block_until_ready(o.f)

for sched in sched_grid:
    for n1 in n1s:
        for cap in caps:
            p2 = params(max_iter=cap, **sched)
            t0 = time.time()
            o = run(v0s, p1_dive, p2, jnp.asarray(n1, jnp.int32))
            jax.block_until_ready(o.f)
            wall = time.time() - t0
            conv = np.asarray(o.converged)
            viol = np.asarray(o.constr_viol)
            fs = np.asarray(o.f, np.float64)
            its = np.asarray(o.iterations)
            ok = conv & (viol < 1e-4)
            tag = ",".join(f"{k}={v:g}" for k, v in sched.items()) or "base"
            print(f"[{tag}] n1={n1:3d} cap={cap:3d} ok={int(ok.sum()):3d}"
                  f"/{B} it_p50={int(np.median(its)):3d} "
                  f"it_p90={int(np.percentile(its, 90)):3d} "
                  f"f_p50={float(np.median(fs)):.3f} "
                  f"gapBK_p50={float(np.median((fs - f_bk) / abs(f_bk))):.2f} "
                  f"wall={wall:6.3f}s sps={ok.sum() / wall:6.1f}", flush=True)
