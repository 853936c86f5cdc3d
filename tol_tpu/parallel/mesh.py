"""Sharded execution over device meshes.

The reference has no distributed runtime at all (SURVEY.md section 2.4: its
only concurrency is a commented-out OpenMP pragma, a fork per solve, and
network I/O).  Here scaling is first-class and TPU-native:

  * the primary axis is **scenario data parallelism** ("dp"): thousands of
    independent NLP instances (winds x airframes x goals x initial states)
    batch under ``vmap`` and shard across chips with
    ``jax.sharding.NamedSharding``; XLA inserts any collectives needed for
    reductions (convergence statistics, Monte-Carlo aggregates) over ICI,
  * a secondary axis ("sp") is reserved for time-axis sharding of very long
    horizons (the defect Jacobian is block-bidiagonal in time, so only a
    one-node halo crosses shard boundaries — see SURVEY.md section 5).

Multi-host: initialize ``jax.distributed`` before calling ``make_mesh``;
``jax.devices()`` then spans hosts and the same code paths shard over DCN.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_sp: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Mesh with ("dp", "sp") axes; defaults to all devices on "dp"."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_sp
    grid = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def shard_instances(mesh: Mesh, tree):
    """Place a stacked instance/initial-point pytree with the batch axis
    sharded over "dp" (leaves without a batch axis are replicated)."""
    def put(x):
        x = jax.numpy.asarray(x)
        spec = P("dp") if x.ndim >= 1 and x.shape[0] % mesh.shape["dp"] == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def sharded_batch_solve(mesh: Mesh, solve_one, insts, v0s=None):
    """jit a vmapped solve with the batch axis sharded over "dp".

    ``solve_one(inst, v0) -> result pytree``; ``insts`` is a stacked
    Instance pytree (batch leading axis).  Returns the compiled callable's
    output with outputs sharded the same way.
    """
    insts = shard_instances(mesh, insts)
    if v0s is not None:
        v0s = shard_instances(mesh, v0s)

    out_sharding = NamedSharding(mesh, P("dp"))

    @jax.jit
    def run(insts, v0s):
        if v0s is None:
            return jax.vmap(lambda i: solve_one(i, None))(insts)
        return jax.vmap(solve_one)(insts, v0s)

    with mesh:
        return run(insts, v0s)
