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
F = jnp.asarray(rng.standard_normal((B, N, b, m)).astype("float32"))

def t(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/10*1000:8.2f} ms")
    return out

L = int(os.environ.get("L", "10"))
with jax.default_matmul_precision("highest"):
    t("cr_factor", jax.vmap(cr_factor, in_axes=(0, 0)), M, O)
    t("cr_factor+solve", jax.vmap(lambda M, O, F: cr_solve(cr_factor(M, O), F)), M, O, F)
    t(f"spike_factor_L{L}", jax.vmap(lambda M, O: spike_factor(M, O, L)), M, O)
    t(f"spike_f+s_L{L}", jax.vmap(lambda M, O, F: spike_solve(spike_factor(M, O, L), F)), M, O, F)
