"""Worker process for the multi-host smoke test (tests/test_multihost.py).

Each process owns 2 virtual CPU devices; ``jax.distributed`` + gloo stitch
N processes into one global mesh.  The worker assembles its host-local
slice of a scenario batch into a global "dp"-sharded array, evaluates the
batched constraint residual under jit on the global mesh, and reduces a
statistic across hosts with an explicit psum — the same boundary the
multi-host Monte-Carlo config (BASELINE config 5) uses around the solver.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from tol_tpu.parallel.multihost import (global_psum, global_stats_to_host,
                                        init_multihost, local_batch_to_global)

init_multihost(f"127.0.0.1:{port}", nproc, pid, cpu_collectives="gloo")

import jax.numpy as jnp
import numpy as np

from tol_tpu.api import make_problem
from tol_tpu.parallel import make_mesh
from tol_tpu.solver import canonicalize

assert len(jax.devices()) == 2 * nproc, jax.devices()
mesh = make_mesh()  # all global devices on "dp"
assert mesh.shape["dp"] == 2 * nproc

nlp = make_problem("S10", aircraft="tempest", ts=8, wind_model=1)
can = canonicalize(nlp, scaling="auto")

# Host-local slice of the global scenario batch: 4 perturbed seeds per
# process, decorrelated by process id.
local_batch = 4
v0 = can.initial_point()
dv = 0.001 * jax.random.normal(jax.random.PRNGKey(100 + pid),
                               (local_batch, can.n), dtype=v0.dtype)
v0s_local = v0[None, :] + dv

v0s = local_batch_to_global(mesh, v0s_local)
assert v0s.shape[0] == nproc * local_batch

c_fn = jax.jit(jax.vmap(lambda v: jnp.max(jnp.abs(can.c(v, can.nlp.inst0)))))
with mesh:
    viols = c_fn(v0s)

# Cross-host reduction (DCN-equivalent collective on the smoke cluster).
total = float(global_psum(mesh, viols))
host_view = np.asarray(global_stats_to_host(viols))
assert host_view.shape == (nproc * local_batch,)
assert abs(total - float(host_view.sum())) < 1e-9 * max(1.0, abs(total))
assert np.all(np.isfinite(host_view))

print(f"RESULT {pid} {total:.17g} {len(jax.devices())}", flush=True)
