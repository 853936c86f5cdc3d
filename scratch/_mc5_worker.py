"""Round-5 Monte-Carlo worker: one process ("host") of the multi-process
convergence-mode run (VERDICT r04 task 2).

Differences from the r04 mechanism worker (_mc_worker.py):
  * solves to the REAL gate (KKT certificate + scaled viol < 1e-4 +
    cost gap < 1e-2 vs an f64 oracle solved in-process, untimed) through
    the production grouped+drain path (tol_tpu.solver.batch) — not a
    fixed 40-iteration budget;
  * the heavy compute is process-local (scenario-DP has no intra-solve
    communication by design, SURVEY 2.4); the multi-host boundary
    exercised in the TIMED region is the global-mesh assembly of the
    per-lane gate statistics + the cross-process ``global_psum``
    reduction — exactly what a fleet run reduces over DCN;
  * the parent pins each worker to its own core (taskset), including
    the 1-process baseline, so 1 -> 2 processes is an honest weak-
    scaling measurement on disjoint silicon.

argv: pid nproc port local_batch ts
"""
import os
import sys
import time

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
local_batch = int(sys.argv[4])
ts = int(sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

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
from tol_tpu.parallel import make_mesh  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.alm import ALMOptions, ALMParams, solve as alm_solve  # noqa: E402
from tol_tpu.solver.batch import make_grouped_solver  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402

dtype = jnp.float64
mesh = make_mesh()   # global mesh over all processes' devices

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1)
can = canonicalize(nlp, scaling="auto")
kkt = make_condensed_kkt(can, refine=1, chain="cr")
opts = ALMOptions(max_iter=2000, dual_refine_k=4, max_ls=8)


def params(max_iter, **kw):
    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=6e-5, mu_min=1e-5,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=2.5e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=2.0, delta_decay=0.2, gamma_eager=1.0)
    base.update(kw)
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(max_iter, jnp.int32))


# f64 oracle for the cost-gap gate (untimed; identical on every process).
oracle_opts = ALMOptions(tol=1e-7, feas_tol=1e-8, max_iter=2000,
                         gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                         prox=3e-3, dual_refine_k=4, gamma_eager=True,
                         gamma_shrink=0.2)
orc = alm_solve(can, kkt, oracle_opts)
f_star = float(orc.f)

GB, DB = 256, 128
gsolve = make_grouped_solver(can, kkt, opts, group_size=GB, drain_size=DB)

v0 = can.initial_point()
lb, ub, fixed = can.bounds(can.nlp.inst0)
dv = 0.01 * jax.random.normal(jax.random.PRNGKey(1000 + pid),
                              (local_batch, can.n), dtype=v0.dtype)
v0s = jnp.where(fixed[None], lb[None],
                jnp.clip(v0[None] + dv, lb[None], ub[None]))

p1 = params(250, tol=1e-12, feas_tol=1e-12, prox=0.0, gamma_eager=0.0,
            mu_init=1e-5, kappa_inner=1.0)
p2 = params(145)
p2d = params(250)

inst1 = can.nlp.inst0
g_insts = [inst1] * (local_batch // GB)


def run_once():
    res = gsolve(g_insts, jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (local_batch,) + jnp.shape(x)),
        inst1), v0s, p1, p2, p2d, 90, -1.0)
    gap = (res.f - f_star) / max(abs(f_star), 1e-9)
    gate = res.converged & (res.constr_viol < 1e-4) & (gap < 1e-2)
    # Multi-host boundary: assemble per-lane gate flags on the global
    # mesh and reduce across processes (the DCN-style collective).
    gate_g = local_batch_to_global(mesh, jnp.asarray(gate, jnp.float64))
    total = float(global_psum(mesh, gate_g))
    feas_g = local_batch_to_global(
        mesh, jnp.asarray(res.constr_viol < 1e-4, jnp.float64))
    feas_total = float(global_psum(mesh, feas_g))
    return total, feas_total, res


t0 = time.time()
total, feas_total, res = run_once()
compile_s = time.time() - t0

t0 = time.time()
total, feas_total, res = run_once()
wall = time.time() - t0

print(f"RESULT {pid} wall={wall:.3f} compile={compile_s:.1f} "
      f"n_global={nproc * local_batch} gated={total:.0f} "
      f"feas={feas_total:.0f} "
      f"median_iters={float(np.median(res.iterations)):.0f}", flush=True)
