import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize
from tol_tpu.solver.kkt_condensed import make_condensed_kkt

B = int(os.environ.get("B", "1024"))
dtype = jnp.float32
nlp = make_problem("S10", aircraft="tempest", ts=100, wind_model=1, dtype=dtype)
can = canonicalize(nlp, scaling="auto")
inst = can.nlp.inst0
lb, ub, fixed = can.bounds(inst)
v0 = can.initial_point()
v0s = jnp.clip(v0[None] + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, can.n), dtype),
               lb[None], ub[None])
v0s = jnp.where(fixed[None], lb[None], v0s)
y0s = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, can.m), dtype)
sig = jnp.abs(0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, can.n), dtype))

kkt = make_condensed_kkt(can, refine=int(os.environ.get("REFINE", "1")),
                         chain=os.environ.get("CHAIN", "spike"))

def one(v, y, s):
    rhs_v = jnp.ones(can.n, dtype)
    rhs_c = jnp.zeros(can.m, dtype)
    with jax.default_matmul_precision("highest"):
        dv, dy = kkt(v, y, s, jnp.asarray(1e-4, dtype),
                     jnp.asarray(0.01, dtype), rhs_v, rhs_c, inst)
    return dv

f = jax.jit(jax.vmap(one))
t0 = time.perf_counter(); out = f(v0s, y0s, sig); jax.block_until_ready(out)
print("compile+first", round(time.perf_counter() - t0, 1))
t0 = time.perf_counter()
for _ in range(10): out = f(v0s, y0s, sig)
jax.block_until_ready(out)
print(os.environ.get("CHAIN", "spike"), "per-solve ms:",
      round((time.perf_counter() - t0) / 10 * 1000, 2))
