"""Split-program continuation test: cheap dive program + crp endgame.

Dive (90 iters, loose feasibility) runs with the fused sequential Pallas
chain ("pallas", ~40% cheaper per iteration; its higher elimination-depth
f32 error only matters in the endgame) and dual_refine_k=0; the state
then passes through alm.phase_switch_state into the crp endgame program.
Gate identical to bench.py config 1.

Env: GB, DB, CAPS, N1S, LS, DIVE_CHAIN, DRAIN.
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
from tol_tpu.solver.alm import (ALMOptions, ALMParams,  # noqa: E402
                                phase_switch_state, solve as alm_solve)
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

e = os.environ.get
ts = 100
dtype = jnp.float32
B = 1024
GB = int(e("GB", "256"))
DB = int(e("DB", "128"))
max_ls = int(e("LS", "12"))

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt_dive = make_condensed_kkt(can, refine=int(e("DIVE_REFINE", "1")),
                              chain=e("DIVE_CHAIN", "pallas"))
kkt_end = make_condensed_kkt(can, refine=1, chain="crp")
opts_dive = ALMOptions(max_iter=2000, dual_refine_k=0, max_ls=max_ls)
opts_end = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=max_ls)


def params(**kw):
    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=1e-5, mu_min=1e-5,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=3e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0,
                max_iter=250)
    base.update(kw)
    mi = base.pop("max_iter")
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(mi, jnp.int32))


@jax.jit
def run_dive(v0s, p1):
    return jax.vmap(lambda v: alm_solve(can, kkt_dive, opts_dive, v0=v,
                                        params=p1, keep_state=True))(v0s)


@jax.jit
def run_end(st, p2):
    st2 = jax.vmap(lambda s: phase_switch_state(can, s, p2))(st)
    return jax.vmap(lambda s: alm_solve(can, kkt_end, opts_end, params=p2,
                                        state0=s, keep_state=True))(st2)


@jax.jit
def run_drain(st, p2):
    return jax.vmap(lambda s: alm_solve(can, kkt_end, opts_end, params=p2,
                                        state0=s))(st)


v0 = can.initial_point()
lb, ub, fx = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n), dtype=dtype)
v0s = jnp.where(fx[None], lb[None], jnp.clip(v0[None] + dv, lb[None], ub[None]))

golden = np.load(os.path.join("tests", "golden_s10_ts100.npy"))
f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                     can.nlp.inst0))
groups = [v0s[i * GB:(i + 1) * GB] for i in range(B // GB)]

drain_on = e("DRAIN", "1") == "1"
caps = [int(x) for x in e("CAPS", "250,180,160").split(",")]
n1s = [int(x) for x in e("N1S", "90").split(",")]

# warm-up compiles
o = run_dive(groups[0], params(tol=1e-12, feas_tol=1e-12, prox=0.0,
                               gamma_eager=0.0, max_iter=5))
oe = run_end(o.state, params(max_iter=7))
jax.block_until_ready(oe.f)
if drain_on:
    std = jax.tree_util.tree_map(lambda x: x[:DB], oe.state)
    od = run_drain(std, params(max_iter=8))
    jax.block_until_ready(od.f)

for n1 in n1s:
    p1 = params(tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
                max_iter=n1)
    for cap in caps:
        p2 = params(max_iter=cap)
        t0 = time.time()
        outs = []
        for gv in groups:
            odive = run_dive(gv, p1)
            outs.append(run_end(odive.state, p2))
        for o in outs:
            jax.block_until_ready(o.f)
        drained = 0
        douts, didx = [], []
        if drain_on:
            st_all = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *[o.state for o in outs])
            conv = np.concatenate([np.asarray(o.converged) for o in outs])
            idx = np.flatnonzero(~conv)
            p2d = params(max_iter=int(e("DRAIN_CAP", "250")))
            for k0 in range(0, len(idx), DB):
                sel = idx[k0:k0 + DB]
                pad = np.concatenate([sel, np.zeros(DB - len(sel), int)])
                std = jax.tree_util.tree_map(lambda x: x[pad], st_all)
                od = run_drain(std, p2d)
                jax.block_until_ready(od.f)
                douts.append(od)
                didx.append(sel)
            drained = len(idx)
        wall = time.time() - t0

        conv = np.concatenate([np.asarray(o.converged) for o in outs])
        viol = np.concatenate([np.asarray(o.constr_viol) for o in outs])
        fs = np.concatenate([np.asarray(o.f, np.float64) for o in outs])
        iters = np.concatenate([np.asarray(o.iterations) for o in outs])
        for od, sel in zip(douts, didx):
            m = len(sel)
            conv[sel] = np.asarray(od.converged)[:m]
            viol[sel] = np.asarray(od.constr_viol)[:m]
            fs[sel] = np.asarray(od.f, np.float64)[:m]
            iters[sel] = np.asarray(od.iterations)[:m]
        gap = (fs - f_star) / abs(f_star)
        ok = conv & (viol < 1e-4) & (gap < 1e-2)
        n_ok = int(ok.sum())
        print(f"n1={n1:3d} cap={cap:3d} ok={n_ok:4d}/1024 "
              f"conv={int(conv.sum()):4d} "
              f"it_p50={int(np.median(iters)):3d} "
              f"it_p90={int(np.percentile(iters, 90)):3d} "
              f"gap_p50={float(np.median(gap)):.2e} "
              f"drain={drained:4d} wall={wall:6.3f}s "
              f"sps={n_ok / wall:6.1f}", flush=True)
