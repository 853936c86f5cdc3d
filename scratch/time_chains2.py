import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tol_tpu.ops.blocktri import cr_factor, cr_solve
from tol_tpu.ops.spike import spike_factor, spike_solve

B, N, b, m = 1024, 100, 11, 13
dtype = jnp.float32
rng = np.random.default_rng(0)
A = rng.standard_normal((B, N, b, b)).astype("float32")
M = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + 6 * np.eye(b, dtype="float32"))
O = jnp.asarray(0.3 * rng.standard_normal((B, N, b, b)).astype("float32"))
F0 = jnp.asarray(rng.standard_normal((B, N, b, m)).astype("float32"))

def chain_loop(solver):
    # 20 dependent solves: F_{k+1} = normalize(solve(F_k)); defeats any
    # overlap/caching, measures steady per-solve cost.
    def run(M, O, F):
        def body(F, _):
            X = solver(M, O, F)
            X = X / (1e-6 + jnp.max(jnp.abs(X)))
            return X, ()
        X, _ = jax.lax.scan(body, F, None, length=20)
        return X
    return run

for name, solver in [
    ("cr", lambda M, O, F: cr_solve(cr_factor(M, O), F)),
    ("spike10", lambda M, O, F: spike_solve(spike_factor(M, O, 10), F)),
]:
    f = jax.jit(jax.vmap(chain_loop(solver)))
    out = f(M, O, F0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3): out = f(M, O, F0)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / 3 / 20 * 1000
    print(f"{name:10s} per factor+solve: {per:7.2f} ms   checksum {float(jnp.sum(out)):.3e}")
