"""Block-tridiagonal solves via cyclic reduction — O(log T) depth on TPU.

The condensed KKT chain (kkt_condensed.py) is symmetric block tridiagonal:

    eq i:  O_{i-1}^T x_{i-1} + M_i x_i + O_i x_{i+1} = f_i,   i = 0..n-1

A sequential ``lax.scan`` block-LDL' has O(n) depth: on TPU, with 11x11
blocks, every scan step is a chain of tiny fused kernels each paying fixed
dispatch cost (the KKT solve measured 25ms of a 34ms solver iteration at
batch 1024).  Even-odd cyclic reduction eliminates all odd blocks per
level: log2(n) levels, each a handful of *batched* ops over the level's
blocks, putting the block index on the VPU batch dimension instead of the
clock.  Total arithmetic is ~2x the scan's; measured 2x faster end-to-end
on TPU (T=100, batch 1024) with the unrolled-FMA matmuls from smallalg —
with ``jnp.matmul``/dot_general it is *slower* (MXU tile padding), so keep
these ops on the bmm/bmm_tn path.

Stability: for SPD chains cyclic reduction is block elimination in a
nested-dissection order — backward stable without pivoting; indefinite
inputs surface as NaN from the unrolled Cholesky inverse exactly like the
scan path (the solvers use NaN as an inertia signal).

Functions are written for one instance ((n, b, b) blocks) and arbitrary
trailing rhs columns; batch with ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

from tol_tpu.ops.smallalg import bmm, bmm_tn, spd_inverse


def _pad_pow2(M, O, n):
    """Pad the chain with identity blocks (decoupled dummy equations)."""
    p = 1
    while p < n:
        p *= 2
    if p == n:
        return M, O, n
    b = M.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(b, dtype=M.dtype), (p - n, b, b))
    M = jnp.concatenate([M, eye])
    O = jnp.concatenate([O, jnp.zeros((p - n, b, b), M.dtype)])
    return M, O, p


def cr_factor(M, O):
    """Factor the chain.  ``M``: (n, b, b) diagonal blocks; ``O``: (n, b, b)
    with ``O[i]`` coupling x_i to x_{i+1} (``O[n-1]`` ignored/zero).

    Returns an opaque factor (tuple of per-level tensors) for
    :func:`cr_solve`.  NaNs propagate from non-SPD pivots.
    """
    n = M.shape[0]
    M, O, p = _pad_pow2(M, O, n)
    O = O.at[p - 1].set(0.0)
    levels = []
    while p > 1:
        Minv = spd_inverse(M[1::2])          # (p/2, b, b) odd pivots
        OL = O[0::2]                          # couples even 2k <-> odd 2k+1
        OR = O[1::2]                          # couples odd 2k+1 <-> even 2k+2
        MinvOLT = bmm(Minv, jnp.swapaxes(OL, -1, -2))
        MinvOR = bmm(Minv, OR)
        M_next = M[0::2] - bmm(OL, MinvOLT)
        M_next = M_next.at[1:].add(-bmm_tn(OR[:-1], MinvOR[:-1]))
        O_next = -bmm(OL, MinvOR)             # even 2k <-> even 2k+2
        levels.append((Minv, OL, OR))
        M, O = M_next, O_next
        p //= 2
    root_inv = spd_inverse(M[0])
    return (n, levels, root_inv)


def cr_solve(factor, f):
    """Solve the factored chain for ``f``: (n, b, m) -> (n, b, m)."""
    n, levels, root_inv = factor
    b = f.shape[1]
    p = (2 ** len(levels)) if levels else 1
    if p != n:
        f = jnp.concatenate(
            [f, jnp.zeros((p - n, b, f.shape[2]), f.dtype)])
    stack = []
    for (Minv, OL, OR) in levels:
        g = bmm(Minv, f[1::2])
        f_even = f[0::2] - bmm(OL, g)
        f_even = f_even.at[1:].add(-bmm_tn(OR[:-1], g[:-1]))
        stack.append(f)
        f = f_even
    x = bmm(root_inv, f[0])[None]
    for (Minv, OL, OR), f_orig in zip(reversed(levels), reversed(stack)):
        rhs = f_orig[1::2] - bmm_tn(OL, x)
        rhs = rhs.at[:-1].add(-bmm(OR[:-1], x[1:]))
        x_odd = bmm(Minv, rhs)
        # interleave evens and odds
        m = f_orig.shape[0]
        x = jnp.stack([x, x_odd], axis=1).reshape(m, b, -1)
    return x[:n]
