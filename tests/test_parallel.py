"""Sharded-execution tests on the 8-virtual-device CPU mesh (conftest).

The reference has no distributed runtime (SURVEY.md section 2.4); these
tests cover this framework's replacement: scenario-DP batched solves over a
("dp","sp") jax.sharding.Mesh, and time-axis ("sp") halo sharding of the
collocation horizon.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tol_tpu.api import make_problem
from tol_tpu.parallel import (
    make_mesh,
    shard_instances,
    sharded_batch_solve,
)
from tol_tpu.solver import canonicalize
from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
from tol_tpu.solver.kkt_condensed import make_condensed_kkt


def test_mesh_axes_and_placement():
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8 and mesh.shape["sp"] == 1
    mesh2 = make_mesh(n_dp=2, n_sp=4)
    assert mesh2.shape["dp"] == 2 and mesh2.shape["sp"] == 4
    x = jnp.zeros((16, 3))
    tree = shard_instances(mesh, {"a": x, "b": jnp.zeros(())})
    shard_set = {d.device for d in tree["a"].addressable_shards}
    assert len(shard_set) == 8  # batch axis really spans all devices


def test_sharded_batch_solve_converges():
    """End-to-end: 16 S10 instances sharded over 8 devices, all converge,
    outputs land sharded over "dp"."""
    mesh = make_mesh()
    nlp = make_problem("S10", aircraft="tempest", ts=8, wind_model=1)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=1, chain="cr")
    opts = ALMOptions(tol=1e-5, feas_tol=1e-6, max_iter=400, gamma_init=0.01,
                      mu_init=1e-5, mu_shrink=0.1, dual_refine_k=4)

    batch = 16
    v0 = can.initial_point()
    lb, ub, fixed = can.bounds(can.nlp.inst0)
    dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (batch, can.n),
                                  dtype=v0.dtype)
    v0s = jnp.clip(v0[None] + dv, lb[None], ub[None])
    v0s = jnp.where(fixed[None], lb[None], v0s)

    out = sharded_batch_solve(
        mesh, lambda inst, v: alm_solve(can, kkt, opts, v0=v), None, v0s)
    conv = np.asarray(out.converged)
    assert conv.all(), (conv, np.asarray(out.kkt_err))
    # outputs sharded over dp
    assert len({d.device for d in out.v.addressable_shards}) == 8


def test_psum_reduction_over_dp():
    """Explicit cross-device reduction of convergence statistics (the
    BASELINE "collectives for merit reductions" deliverable)."""
    mesh = make_mesh()
    x = jnp.arange(64, dtype=jnp.float64)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    def blk(xb):
        return jax.lax.psum(jnp.sum(xb), "dp")[None]

    total = jax.shard_map(blk, mesh=mesh, in_specs=P("dp"),
                          out_specs=P("dp"))(xs)
    assert float(total[0]) == float(jnp.sum(x))
