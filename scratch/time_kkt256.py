"""Standalone KKT timings at B=256 (group geometry)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from tol_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np
from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

B = int(os.environ.get("B", "256"))
dtype = jnp.float32
nlp = make_problem("S10", aircraft="tempest", ts=100, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
inst = can.nlp.inst0
lb, ub, fixed = can.bounds(inst)
v0 = can.initial_point()
key = jax.random.PRNGKey(0)
v0s = jnp.where(fixed[None], lb[None],
                jnp.clip(v0[None] + 0.01 * jax.random.normal(key, (B, can.n), dtype), lb[None], ub[None]))
y0s = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, can.m), dtype)
sig = jnp.abs(0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, can.n), dtype))

def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); n = 20
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1000:7.3f} ms", flush=True)

with jax.default_matmul_precision("highest"):
    for chain, refine in [("crp", 1), ("crp", 0), ("pallas", 1)]:
        kkt = make_condensed_kkt(can, refine=refine, chain=chain)
        def one(v, y, s):
            rhs_v = jnp.ones(can.n, dtype); rhs_c = jnp.zeros(can.m, dtype)
            dv, dy = kkt(v, y, s, jnp.asarray(1e-4, dtype), jnp.asarray(0.01, dtype), rhs_v, rhs_c, inst)
            return dv
        bench(f"kkt_{chain}_refine{refine}", jax.vmap(one), v0s, y0s, sig)
