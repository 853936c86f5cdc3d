"""Throughput tuning for bench config 1 (S10-Tempest ts=100, 1024 seeds).

Finding (scratch/time_iter.py): per-LANE iteration cost improves sharply
at smaller batch (B=1024: 20.8us/lane-iter; B=256: 14.6), so the bench
batch should run as independent 256-lane groups.  This script compiles
ONE B=256 program and sweeps runtime knobs over the same 1024 seeds and
the same gate as bench.py:

  * phase-1 adaptive exit (exit_df) vs fixed 90-iteration dive
  * phase-1 cap n1
  * total iteration cap
  * optional straggler drain: resume unconverged lanes in a B=128
    program (state0 resume) after the main cap

Reports gated-pass count, iteration percentiles, wall, and solves/s.
Env: CAPS, EXITDFS, N1S (comma lists), DRAIN=1, LS, CHAIN.
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
B = 1024
GB = int(e("GB", "256"))          # group batch
DB = int(e("DB", "128"))          # drain batch
chain = e("CHAIN", "crp")
max_ls = int(e("LS", "12"))

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain=chain)
opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=max_ls)


def params(**kw):
    # bench-identical numerics: mu_min resolves to min(tol/10, mu_init)
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
def run_group(v0s, p1, p2, n_max, exit_df):
    ph = Phase1(params=p1, n_max=n_max, exit_df=exit_df, patience=3)
    return jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v, params=p2,
                                        phase1=ph, keep_state=True))(v0s)


@jax.jit
def run_drain(st, p1, p2, n_max, exit_df):
    ph = Phase1(params=p1, n_max=n_max, exit_df=exit_df, patience=3)
    return jax.vmap(lambda s: alm_solve(can, kkt, opts, params=p2,
                                        phase1=ph, state0=s))(st)


# bench-identical seeds
v0 = can.initial_point()
lb, ub, fx = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n), dtype=dtype)
v0s = jnp.where(fx[None], lb[None], jnp.clip(v0[None] + dv, lb[None], ub[None]))

golden = np.load(os.path.join("tests", "golden_s10_ts100.npy"))
f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                     can.nlp.inst0))

groups = [v0s[i * GB:(i + 1) * GB] for i in range(B // GB)]

p1_base = params(tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0)

drain_on = e("DRAIN", "0") == "1"
caps = [int(x) for x in e("CAPS", "250,210,180").split(",")]
exitdfs = [float(x) for x in e("EXITDFS", "-1,1e-3,3e-3").split(",")]
n1s = [int(x) for x in e("N1S", "90").split(",")]
# endgame-schedule override grid: "key=v|key=v,key=v" -> list of dicts
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

# warm-up compile
o = run_group(groups[0], p1_base, params(max_iter=5),
              jnp.asarray(5, jnp.int32), jnp.asarray(-1.0, dtype))
jax.block_until_ready(o.f)
if drain_on:
    st5 = jax.tree_util.tree_map(lambda x: x[:DB], o.state)
    od = run_drain(st5, p1_base, params(max_iter=6),
                   jnp.asarray(5, jnp.int32), jnp.asarray(-1.0, dtype))
    jax.block_until_ready(od.f)

for sched in sched_grid:
  for n1 in n1s:
    for xdf in exitdfs:
        for cap in caps:
            p2 = params(max_iter=cap, **sched)
            t0 = time.time()
            outs = [run_group(gv, p1_base, p2, jnp.asarray(n1, jnp.int32),
                              jnp.asarray(xdf, dtype)) for gv in groups]
            for o in outs:
                jax.block_until_ready(o.f)
            drained = 0
            if drain_on:
                # gather unconverged lanes across groups into DB-lane chunks
                st_all = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *[o.state for o in outs])
                conv = np.concatenate([np.asarray(o.converged) for o in outs])
                idx = np.flatnonzero(~conv)
                p2d = params(max_iter=int(e("DRAIN_CAP", "250")), **sched)
                douts, didx = [], []
                for k0 in range(0, len(idx), DB):
                    sel = idx[k0:k0 + DB]
                    pad = np.concatenate([sel, np.zeros(DB - len(sel), int)])
                    std = jax.tree_util.tree_map(lambda x: x[pad], st_all)
                    od = run_drain(std, p1_base, p2d,
                                   jnp.asarray(n1, jnp.int32),
                                   jnp.asarray(xdf, dtype))
                    jax.block_until_ready(od.f)
                    douts.append(od)
                    didx.append(sel)
                drained = len(idx)
            wall = time.time() - t0

            conv = np.concatenate([np.asarray(o.converged) for o in outs])
            viol = np.concatenate([np.asarray(o.constr_viol) for o in outs])
            fs = np.concatenate([np.asarray(o.f, np.float64) for o in outs])
            iters = np.concatenate([np.asarray(o.iterations) for o in outs])
            n0s = np.concatenate([np.asarray(o.phase1_iters) for o in outs])
            if drain_on and drained:
                for od, sel in zip(douts, didx):
                    m = len(sel)
                    conv[sel] = np.asarray(od.converged)[:m]
                    viol[sel] = np.asarray(od.constr_viol)[:m]
                    fs[sel] = np.asarray(od.f, np.float64)[:m]
                    iters[sel] = np.asarray(od.iterations)[:m]
            gap = (fs - f_star) / abs(f_star)
            ok = conv & (viol < 1e-4) & (gap < 1e-2)
            n_ok = int(ok.sum())
            tag = ",".join(f"{k}={v:g}" for k, v in sched.items()) or "base"
            print(f"[{tag}] n1={n1:3d} xdf={xdf:8.1e} cap={cap:3d} "
                  f"ok={n_ok:4d}/1024 conv={int(conv.sum()):4d} "
                  f"it_p50={int(np.median(iters)):3d} "
                  f"it_p90={int(np.percentile(iters, 90)):3d} "
                  f"n0_p50={int(np.median(n0s)):3d} "
                  f"gap_p50={float(np.median(gap)):.2e} "
                  f"drain={drained:4d} wall={wall:6.3f}s "
                  f"sps={n_ok / wall:6.1f}", flush=True)
