"""Time-axis ("sp") sharding of the collocation horizon.

The defect Jacobian is block-bidiagonal in time — defect row i touches only
nodes i and i+1 (src/problem.cpp:1012-1019 / models/dynamics.py) — so
sharding the horizon across devices needs exactly a ONE-NODE halo at each
shard boundary.  This module implements that halo exchange with
``shard_map`` + ``lax.ppermute`` over the mesh's "sp" axis: each shard
evaluates its local defect rows after receiving its right neighbour's first
node.

Scope note (the "sp" design decision): at the reference horizon (ts=100,
11-wide nodes) the whole chain factorization is ~100 x 11^3 flops and fits
in VMEM — sharding the *factorization* across chips would be ICI-latency
bound and slower than computing it redundantly.  Time sharding therefore
targets the O(T) *evaluation* work (defects, residuals, Jacobian blocks,
line-search merit terms) for very long horizons, composed with scenario DP
on the "dp" axis; the per-shard results feed the same reductions
(``psum``) the dp axis uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tol_tpu.models.dynamics import NUM_STATES


def sharded_all_defects(mesh: Mesh, nlp, Z: jax.Array, dt, inst=None):
    """(T, 8) defect residuals with the time axis sharded over "sp".

    ``Z``: (T+1, 11) node variables; T must be divisible by the "sp" axis
    size.  Equivalent to ``nlp.all_defects`` (tested to machine precision);
    the body runs one shard per device with a single ppermute for the halo.
    """
    inst = nlp._inst(inst)
    T = Z.shape[0] - 1
    nsp = mesh.shape["sp"]
    if T % nsp != 0:
        raise ValueError(f"T={T} not divisible by sp={nsp}")

    Zmain = Z[:-1]          # (T, 11): node i for defect row i
    z_tail = Z[-1]          # global final node (halo for the last shard)

    perm = [((i + 1) % nsp, i) for i in range(nsp)]  # shard i+1 -> shard i

    def blk(Zb, z_tail, dt, inst):
        # Zb: (T/nsp, 11) local rows.  Halo: neighbour's first node.
        nxt = jax.lax.ppermute(Zb[0:1], "sp", perm)[0]
        idx = jax.lax.axis_index("sp")
        z_after = jnp.where(idx == nsp - 1, z_tail, nxt)
        Znext = jnp.concatenate([Zb[1:], z_after[None]], axis=0)
        return jax.vmap(nlp.defect_fn, in_axes=(0, 0, None, None))(
            Zb, Znext, dt, inst)

    fn = jax.shard_map(
        blk, mesh=mesh,
        in_specs=(P("sp", None), P(), P(), P()),
        out_specs=P("sp", None))
    return fn(Zmain, z_tail, dt, inst)


def sharded_constraint_norm(mesh: Mesh, nlp, Z, dt, inst=None):
    """max |defect| with the reduction crossing shards via psum/pmax
    (demonstrates the collective path the merit/convergence checks ride)."""
    inst = nlp._inst(inst)
    T = Z.shape[0] - 1
    nsp = mesh.shape["sp"]
    if T % nsp != 0:
        raise ValueError(f"T={T} not divisible by sp={nsp}")
    Zmain = Z[:-1]
    z_tail = Z[-1]
    perm = [((i + 1) % nsp, i) for i in range(nsp)]

    def blk(Zb, z_tail, dt, inst):
        nxt = jax.lax.ppermute(Zb[0:1], "sp", perm)[0]
        idx = jax.lax.axis_index("sp")
        z_after = jnp.where(idx == nsp - 1, z_tail, nxt)
        Znext = jnp.concatenate([Zb[1:], z_after[None]], axis=0)
        d = jax.vmap(nlp.defect_fn, in_axes=(0, 0, None, None))(
            Zb, Znext, dt, inst)
        return jax.lax.pmax(jnp.max(jnp.abs(d)), "sp")[None]

    fn = jax.shard_map(
        blk, mesh=mesh,
        in_specs=(P("sp", None), P(), P(), P()),
        out_specs=P("sp"))
    return fn(Zmain, z_tail, dt, inst)[0]
