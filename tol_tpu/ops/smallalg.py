"""Batched small-matrix linear algebra, unrolled for TPU.

XLA:TPU lowers ``jnp.linalg.cholesky`` / ``triangular_solve`` on tiny
batched matrices to loops that effectively serialize over the batch —
measured on the condensed KKT chain (11x11 blocks) the solver throughput
was *flat* in batch size, i.e. thousands of NLP instances gained nothing
from vmap.  These routines unroll the factor/solve recurrences over the
(static, tiny) matrix dimension into plain vector arithmetic, so the batch
dimension maps onto VPU lanes and everything downstream of the factors is
an MXU einsum.

All functions treat the last two axes as the matrix and broadcast over any
leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def bmm(A, B):
    """Batched tiny matmul ``A @ B`` unrolled over the contraction axis.

    ``A``: (..., n, k), ``B``: (..., k, m), k static and small.  On TPU a
    batched ``dot_general`` with 11-wide operands pays MXU tile padding
    (measured 56us for (1024,11,11)@(1024,11,13)); the unrolled
    broadcast-FMA form is one fusable elementwise kernel (17us) and fuses
    into neighbouring ops.
    """
    k = A.shape[-1]
    out = A[..., :, 0, None] * B[..., 0, None, :]
    for j in range(1, k):
        out = out + A[..., :, j, None] * B[..., j, None, :]
    return out


def bmm_tn(A, B):
    """``swapaxes(A, -1, -2) @ B`` unrolled: (..., k, n), (..., k, m)."""
    k = A.shape[-2]
    out = A[..., 0, :, None] * B[..., 0, None, :]
    for j in range(1, k):
        out = out + A[..., j, :, None] * B[..., j, None, :]
    return out


def bmv(A, x):
    """Batched tiny matvec ``A @ x``: (..., n, k), (..., k)."""
    k = A.shape[-1]
    out = A[..., :, 0] * x[..., 0, None]
    for j in range(1, k):
        out = out + A[..., :, j] * x[..., j, None]
    return out


def bmv_t(A, x):
    """``swapaxes(A, -1, -2) @ x``: (..., k, n), (..., k)."""
    k = A.shape[-2]
    out = A[..., 0, :] * x[..., 0, None]
    for j in range(1, k):
        out = out + A[..., j, :] * x[..., j, None]
    return out


def chol_unrolled(A):
    """Lower-triangular Cholesky factor of SPD ``A`` (..., n, n).

    O(n^3/6) fused multiply-adds over (...,)-shaped vectors; NaN on
    non-PD input (used as an inertia signal by the solvers).
    """
    n = A.shape[-1]
    cols = []  # cols[j]: (..., n) column j of L (rows < j are zero)
    for j in range(n):
        s = A[..., :, j]
        for k in range(j):
            s = s - cols[k][..., j:j + 1] * cols[k]
        d = jnp.sqrt(s[..., j])
        col = s / d[..., None]
        # zero the strictly-upper part of the column
        mask = jnp.arange(n) >= j
        col = jnp.where(mask, col, 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def tri_solve_unrolled(L, B, lower=True, trans=False):
    """Solve ``L X = B`` (or ``L^T X = B`` with ``trans``) for triangular L.

    ``L``: (..., n, n); ``B``: (..., n, m).  Unrolled forward/backward
    substitution; every step is a broadcasted multiply-add on (..., m).
    """
    n = L.shape[-1]
    rows = [None] * n
    order = range(n) if (lower ^ trans) else range(n - 1, -1, -1)
    for i in order:
        s = B[..., i, :]
        if lower and not trans:
            for k in range(i):
                s = s - L[..., i, k:k + 1] * rows[k]
        elif lower and trans:
            for k in range(i + 1, n):
                s = s - L[..., k, i:i + 1] * rows[k]
        elif not lower and not trans:
            for k in range(i + 1, n):
                s = s - L[..., i, k:k + 1] * rows[k]
        else:
            for k in range(i):
                s = s - L[..., k, i:i + 1] * rows[k]
        diag = L[..., i, i] if not trans else L[..., i, i]
        rows[i] = s / diag[..., None]
    return jnp.stack(rows, axis=-2)


def spd_solve(A, B):
    """Solve SPD ``A X = B`` via unrolled Cholesky."""
    L = chol_unrolled(A)
    Y = tri_solve_unrolled(L, B, lower=True)
    return tri_solve_unrolled(L, Y, lower=True, trans=True)


def spd_inverse(A):
    """Explicit inverse of SPD ``A`` via unrolled Cholesky.

    Slightly less accurate than paired solves, but turns every subsequent
    application into a batched matmul (MXU-friendly); the condensed KKT
    backend compensates with saddle-level iterative refinement.
    """
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return spd_solve(A, eye)
