"""Decision-vector layout.

Internally trajectories are a pair ``(Z, dt)`` with ``Z`` of shape
``(ts+1, 11)`` (nodes x per-node variables) and a single global time step
``dt`` — the reference packs the same data as one flat SNOPT vector with
``x[0] = dt`` and node-major 11-blocks (``n = numinp*(ts+1)+1``,
src/problem.cpp:151; per-node index map src/problem.cpp:211-222).  These
helpers convert between the two for I/O parity and oracle comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tol_tpu.models.dynamics import NUM_VARS


def flatten_decision(Z: jax.Array, dt: jax.Array) -> jax.Array:
    """(ts+1, 11) + scalar -> flat reference-ordered vector of length 11*(ts+1)+1."""
    return jnp.concatenate([jnp.reshape(dt, (1,)), Z.reshape(-1)])


def unflatten_decision(x: jax.Array):
    """Flat reference-ordered vector -> ((ts+1, 11), dt)."""
    dt = x[0]
    Z = x[1:].reshape(-1, NUM_VARS)
    return Z, dt
