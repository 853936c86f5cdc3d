"""Per-iteration cost of the REAL bench solver program (TPU).

Runs the bench-identical vmapped ALM while-loop with tol=1e-12 (never
converges) at two runtime iteration caps and reports (wall2-wall1)/d_it
— the true cost of one batched solver iteration including evals, line
search, Hessian assembly, KKT solve and dual refinement.

Env: B, CHAIN, REFINE, DUALK, LS (max_ls), SWEEP=1 to sweep variants.
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
                                solve as alm_solve)
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

e = os.environ.get
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


def measure(B, chain, refine, dual_k, max_ls):
    kkt = make_condensed_kkt(can, refine=refine, chain=chain)
    opts = ALMOptions(max_iter=2000, dual_refine_k=dual_k, max_ls=max_ls)

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
    print(f"B={B:5d} chain={chain:7s} refine={refine} dualk={dual_k} "
          f"ls={max_ls:2d}  per_iter={per_it:7.2f} ms  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return per_it


base = dict(B=int(e("B", "1024")), chain=e("CHAIN", "crp"),
            refine=int(e("REFINE", "1")), dual_k=int(e("DUALK", "4")),
            max_ls=int(e("LS", "12")))

if e("SWEEP", "0") == "1":
    measure(**base)
    for kw in (dict(dual_k=0), dict(max_ls=8), dict(refine=0),
               dict(chain="pallas"), dict(B=512), dict(B=256)):
        measure(**{**base, **kw})
elif e("SWEEP", "0") == "r5":
    # Round-5 throughput sweep at the production group size.
    measure(**base)                                   # bench baseline
    for kw in (dict(max_ls=6), dict(max_ls=4), dict(dual_k=2),
               dict(dual_k=0), dict(refine=0), dict(B=128), dict(B=192),
               dict(B=384), dict(max_ls=6, dual_k=2)):
        measure(**{**base, **kw})
else:
    measure(**base)
