"""Multi-host (multi-process) execution over DCN.

The reference is a single-process optimizer (SURVEY.md section 2.4: its
only "distribution" is a fork per solve plus MongoDB/MAVLink sockets).
Here multi-host scaling is a first-class code path, per the BASELINE
"10k-scenario Monte-Carlo across >= 2 hosts" config: each host runs one
process, ``jax.distributed`` stitches the processes into one global device
mesh, and the *same* ``make_mesh``/``sharded_batch_solve`` code paths then
shard the scenario batch over every chip on every host — XLA routes
intra-host reductions over ICI and inter-host ones over DCN.

Nothing in the solver changes between single- and multi-host runs; these
helpers only cover process bring-up and host-local <-> global array
conversion at the mission boundary (loading instances host-side, gathering
Monte-Carlo statistics).

Smoke-tested without real multi-host hardware by launching N local
processes with CPU devices and gloo collectives (tests/test_multihost.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str, num_processes: int, process_id: int,
                   cpu_collectives: str | None = None) -> None:
    """Join this process into a ``jax.distributed`` cluster.

    Call before any other JAX operation (device initialization).  On TPU
    pods ``jax.distributed.initialize()`` can infer everything from the
    environment; this explicit form also covers CPU smoke clusters
    (``cpu_collectives="gloo"``) and manual bring-up.
    """
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_to_global(mesh: Mesh, tree, local_batch: int | None = None):
    """Assemble per-process batch shards into one global "dp"-sharded array.

    Each process passes the slice of the scenario batch it loaded (e.g.
    its share of Monte-Carlo initial states); the result is a global array
    of leading dimension ``num_processes * local_batch`` usable inside
    ``jit`` under ``mesh``.

    A leaf is treated as batched (concatenated across processes along axis
    0) only when its leading dimension is the per-process batch: pass
    ``local_batch`` explicitly, or leave ``None`` to infer it by a
    rank-weighted vote over leading dimensions (each leaf votes with
    weight = its rank, so a stack of same-length replicated 1-D parameter
    vectors cannot outvote genuinely batched 2-D leaves; ties/ambiguity
    still raise).  Heterogeneous trees where the batch leaves are not the
    highest-rank ones should pass ``local_batch`` explicitly.  Everything
    else (scalars, shared parameter vectors identical on each host) is
    replicated — the same contract as
    :func:`tol_tpu.parallel.mesh.shard_instances`.
    """
    from collections import Counter

    from jax.experimental import multihost_utils

    leaves = [jnp.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
    if local_batch is None:
        batched_leaves = [x for x in leaves if x.ndim >= 1]
        if not batched_leaves:
            return jax.tree_util.tree_map(
                lambda x: multihost_utils.host_local_array_to_global_array(
                    jnp.asarray(x), mesh, P()), tree)
        counts = Counter()
        for x in batched_leaves:
            counts[x.shape[0]] += x.ndim   # rank-weighted vote
        top = counts.most_common()
        local_batch = max(d for d, c in top if c == top[0][1])
        if len(counts) > 1:
            # Mixed leading dims: the weighted vote can still be wrong for
            # exotic trees, so require an unambiguous majority before
            # trusting it.
            others = sum(c for d, c in counts.items() if d != local_batch)
            if counts[local_batch] <= others:
                raise ValueError(
                    "local_batch_to_global: cannot infer the per-process "
                    f"batch dim (rank-weighted leading-dim votes: "
                    f"{dict(counts)}); pass local_batch= explicitly")

    def put(x):
        x = jnp.asarray(x)
        spec = P("dp") if (x.ndim >= 1 and x.shape[0] == local_batch) else P()
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    return jax.tree_util.tree_map(put, tree)


def global_stats_to_host(tree):
    """Gather (possibly sharded) result statistics onto every host.

    Returns host-local numpy-convertible arrays with the global batch axis
    intact — the mission/Monte-Carlo layer aggregates from there.
    """
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.process_allgather(x, tiled=True), tree)


def global_psum(mesh: Mesh, x, axis: str = "dp"):
    """Explicit cross-host reduction of a "dp"-sharded array — the
    merit/Monte-Carlo reduction deliverable.  Sums over *all* elements of
    ``x`` (batch axis and any trailing axes) and returns the scalar total,
    replicated to every process.
    """
    def blk(xb):
        return jax.lax.psum(jnp.sum(xb), axis)[None]

    with mesh:
        tot = jax.jit(jax.shard_map(blk, mesh=mesh, in_specs=P(axis),
                                    out_specs=P(axis)))(x)
    return global_stats_to_host(tot)[0]
