"""Per-component timing of one ALM iteration at bench scale (TPU).

Times, at batch B and ts=100 S10-Tempest f32:
  - eval:      c(v) + grad of Lagrangian (the per-step AD evals)
  - merit12:   12-trial vmapped AL merit line search
  - hessians:  node Hessian + defect Jacobian + border Hessian assembly
  - kkt_*:     one condensed KKT solve per backend/refine combo
Run:  python scratch/time_components.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

B = int(os.environ.get("B", "1024"))
ts = 100
dtype = jnp.float32

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
inst = can.nlp.inst0
lb, ub, fixed = can.bounds(inst)

v0 = can.initial_point()
key = jax.random.PRNGKey(0)
v0s = jnp.clip(v0[None] + 0.01 * jax.random.normal(key, (B, can.n), dtype=dtype),
               lb[None], ub[None])
v0s = jnp.where(fixed[None], lb[None], v0s)
y0s = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, can.m), dtype=dtype)
sig = jnp.abs(0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, can.n),
                                      dtype=dtype))


def bench_fn(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:30s} {dt:8.3f} ms")
    return dt


# ---- eval: c + grad_lag ----
grad_lag = jax.grad(lambda v, y: can.f(v, inst) + can.c(v, inst) @ y)
bench_fn("c_fn", jax.vmap(lambda v: can.c(v, inst)), v0s)
bench_fn("grad_lag", jax.vmap(grad_lag), v0s, y0s)

# ---- merit line search: 12 AL values ----
def al_value(v):
    cv = can.c(v, inst)
    dl = jnp.where(~fixed, v - lb, 1.0)
    return (can.f(v, inst) + cv @ cv * 50.0
            - 1e-5 * jnp.sum(jnp.where(dl > 0, jnp.log(jnp.abs(dl) + 1e-9), 0.0)))

def merit12(v):
    alphas = 0.5 ** jnp.arange(12, dtype=dtype)
    return jax.vmap(lambda a: al_value(v * (1 - 0.001 * a)))(alphas)

bench_fn("merit12", jax.vmap(merit12), v0s)

# ---- KKT backends ----
with jax.default_matmul_precision("highest"):
    for chain, refine in [("pallas", 0), ("pallas", 1), ("cr", 0), ("cr", 1)]:
        kkt = make_condensed_kkt(can, refine=refine, chain=chain)

        def one(v, y, s):
            rhs_v = jnp.ones(can.n, dtype)
            rhs_c = jnp.zeros(can.m, dtype)
            dv, dy = kkt(v, y, s, jnp.asarray(1e-4, dtype),
                         jnp.asarray(0.01, dtype), rhs_v, rhs_c, inst)
            return dv

        bench_fn(f"kkt_{chain}_refine{refine}",
                 jax.vmap(one), v0s, y0s, sig)
print("done")

# ---- spike backend ----
with jax.default_matmul_precision("highest"):
    for L in [5, 10, 20]:
        import importlib
        import tol_tpu.ops.spike as spk
        importlib.reload(spk)

        def one_spike(v, y, s, L=L):
            kkt2 = make_condensed_kkt(can, refine=1, chain="spike")
            rhs_v = jnp.ones(can.n, dtype)
            rhs_c = jnp.zeros(can.m, dtype)
            dv, dy = kkt2(v, y, s, jnp.asarray(1e-4, dtype),
                          jnp.asarray(0.01, dtype), rhs_v, rhs_c, inst)
            return dv

        bench_fn(f"kkt_spike_L{L}_refine1", jax.vmap(one_spike), v0s, y0s, sig)
        break
