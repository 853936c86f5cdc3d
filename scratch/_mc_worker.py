"""Monte-Carlo worker: one process of the multi-host 10k-scenario config.

Each process owns ``DEV_PER_PROC`` virtual CPU devices and solves its
host-local slice of the global scenario batch through the real
``sharded_batch_solve`` path on the global "dp" mesh (gloo collectives
across processes), then reduces convergence statistics with
``global_psum``.  Fixed iteration budget so work per scenario is
identical across runs (mechanism-scaling measurement).

argv: pid nproc port local_batch ts max_iter
"""
import os
import sys
import time

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
local_batch = int(sys.argv[4])
ts = int(sys.argv[5])
max_iter = int(sys.argv[6])
DEV_PER_PROC = int(os.environ.get("DEV_PER_PROC", "1"))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={DEV_PER_PROC}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from tol_tpu.parallel.multihost import (  # noqa: E402
    global_psum, init_multihost, local_batch_to_global)

if nproc > 1:
    init_multihost(f"127.0.0.1:{port}", nproc, pid, cpu_collectives="gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.parallel import make_mesh, sharded_batch_solve  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

mesh = make_mesh()   # all global devices on "dp"

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
# Fixed-budget solve (tol never met) -> identical work per scenario.
opts = ALMOptions(tol=1e-13, feas_tol=1e-13, max_iter=max_iter,
                  gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1, prox=3e-3,
                  dual_refine_k=4, gamma_eager=True, gamma_shrink=0.2)

# Host-local Monte-Carlo slice: perturbed initial conditions, decorrelated
# by process id.
v0 = can.initial_point()
lb, ub, fixed = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(1000 + pid),
                              (local_batch, can.n), dtype=v0.dtype)
v0s_local = jnp.where(fixed[None], lb[None],
                      jnp.clip(v0[None] + dv, lb[None], ub[None]))

v0s = local_batch_to_global(mesh, v0s_local)
assert v0s.shape[0] == nproc * local_batch

solve = lambda inst, v: alm_solve(can, kkt, opts, v0=v)

t0 = time.time()
out = sharded_batch_solve(mesh, solve, None, v0s)
jax.block_until_ready(out.constr_viol)
compile_s = time.time() - t0

t0 = time.time()
out = sharded_batch_solve(mesh, solve, None, v0s)
jax.block_until_ready(out.constr_viol)
wall = time.time() - t0

# Cross-host reductions of run statistics (the DCN-boundary collective).
n_feas = float(global_psum(mesh, (out.constr_viol < 1e-4).astype(
    jnp.float64)))
viol_sum = float(global_psum(mesh, out.constr_viol))

print(f"RESULT {pid} wall={wall:.3f} compile={compile_s:.1f} "
      f"n_global={nproc * local_batch} feas={n_feas:.0f} "
      f"viol_mean={viol_sum / (nproc * local_batch):.3e}", flush=True)
