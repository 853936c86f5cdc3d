"""Partitioned block-tridiagonal solves (SPIKE / nested block dissection).

Third chain backend next to the sequential scan and cyclic reduction
(ops/blocktri.py), combining the strengths of both for the TPU hot loop:

  * The chain of N blocks is cut into K segments of length L (N = K*L,
    identity-padded).  The L-1 interior blocks of every segment are
    eliminated **in parallel over segments**: one ``lax.scan`` of L-1
    steps whose slab ops carry a (K, ...) leading axis — under ``vmap``
    the compiler sees (B, K, b, b) tensors, so each sequential step is a
    handful of wide fused kernels instead of the 1-instance-wide steps of
    the plain scan (L-1 ~ 9 dispatched steps instead of N ~ 100).
  * Eliminating interiors reduces the system to the K segment-separator
    blocks — a block-tridiagonal chain of length K solved by cyclic
    reduction (tiny: K ~ 10).
  * Error growth is O(L + log K) elimination depth (vs O(N) for the
    sequential scan): measured on the ts=100 flagship NLP the sequential
    orderings lose the small-curvature valley components of the Newton
    direction to the f32 noise floor (final cost gap ~1.4e-2) while
    low-depth orderings preserve them (cyclic reduction ~0.85e-2, below
    the 1e-2 bench optimality gate); SPIKE matches the low-depth class at
    roughly 1/6 of cyclic reduction's arithmetic.

Flop count per instance (b=11, N=100, L=K=10, border+rhs columns ~13):
interior factor ~0.22 MFLOP + reduced CR ~0.03 vs CR's ~1.5 MFLOP.

Functions are single-instance ((N, b, b) blocks, (N, b, m) rhs) like
``cr_factor``/``cr_solve``; batch with ``jax.vmap``.  Same symmetric
convention:  eq i:  O_{i-1}^T x_{i-1} + M_i x_i + O_i x_{i+1} = f_i.
Non-SPD pivots surface as NaN (inertia signal), exactly like the other
backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tol_tpu.ops.blocktri import cr_factor, cr_solve
from tol_tpu.ops.smallalg import bmm, bmm_tn, spd_inverse


def _pad_mult(M, O, n, L):
    """Pad the chain with decoupled identity blocks to a multiple of L."""
    K = -(-n // L)
    p = K * L
    if p == n:
        return M, O, K
    b = M.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(b, dtype=M.dtype), (p - n, b, b))
    M = jnp.concatenate([M, eye])
    O = jnp.concatenate([O, jnp.zeros((p - n, b, b), M.dtype)])
    return M, O, K


def spike_factor(M, O, L: int = 10):
    """Factor the chain.  ``M``: (n, b, b) diagonal blocks; ``O``: (n, b, b)
    with ``O[i]`` coupling x_i to x_{i+1} (``O[n-1]`` ignored/zero).

    ``L``: segment length (the last block of each segment is a separator).
    Returns an opaque factor for :func:`spike_solve`.
    """
    if L < 2:
        raise ValueError("segment length L must be >= 2 (every segment needs "
                         "at least one interior block; use cr_factor for a "
                         "pure separator chain)")
    n, b = M.shape[0], M.shape[1]
    M, O, K = _pad_mult(M, O, n, L)
    O = O.at[K * L - 1].set(0.0)
    dtype = M.dtype

    Mk = M.reshape(K, L, b, b)
    Ok = O.reshape(K, L, b, b)

    Mi = jnp.swapaxes(Mk[:, : L - 1], 0, 1)          # (L-1, K, b, b)
    # interior couplings j -> j+1 (zero for the last interior row)
    Oi = jnp.swapaxes(
        Ok[:, : L - 1].at[:, L - 2].set(0.0), 0, 1)  # (L-1, K, b, b)
    UR = Ok[:, L - 2]                                # (K, b, b) row L-2 -> s_k
    ULT = jnp.concatenate(                           # (K, b, b): O[kL-1]^T,
        [jnp.zeros((1, b, b), dtype),                # zero for segment 0
         jnp.swapaxes(Ok[:-1, L - 1], -1, -2)])
    Ms = Mk[:, L - 1]                                # (K, b, b) separators

    # Column block W_j (K, b, 2b): [UL^T at j=0 | UR at j=L-2].
    W = jnp.zeros((L - 1, K, b, 2 * b), dtype)
    W = W.at[0, :, :, :b].set(ULT)
    W = W.at[L - 2, :, :, b:].add(UR)

    def factor_step(carry, inp):
        dcorr, wcorr, s_acc = carry
        Mj, Wj, Oj = inp
        Dt = Mj - dcorr
        Wt = Wj - wcorr
        Dinv = spd_inverse(Dt)
        tW = bmm(Dinv, Wt)
        t2 = bmm(Dinv, Oj)
        s_acc = s_acc + bmm_tn(Wt, tW)
        return (bmm_tn(Oj, t2), bmm_tn(Oj, tW), s_acc), (Dinv, t2, tW)

    (_, _, S2), (Dinv, t2, tW) = jax.lax.scan(
        factor_step,
        (jnp.zeros((K, b, b), dtype), jnp.zeros((K, b, 2 * b), dtype),
         jnp.zeros((K, 2 * b, 2 * b), dtype)),
        (Mi, W, Oi))

    # Reduced separator chain: diag and off-diagonal from the Schur blocks.
    pad1 = jnp.zeros((1, 2 * b, 2 * b), dtype)
    S2n = jnp.concatenate([S2[1:], pad1])            # S2 of segment k+1
    Mred = Ms - S2[:, b:, b:] - S2n[:, :b, :b]
    Ored = -S2n[:, :b, b:]                           # couples s_k -> s_{k+1}
    red = cr_factor(Mred, Ored)

    return (n, K, L, Dinv, t2, tW, Oi, red)


def spike_solve(factor, f):
    """Solve the factored chain for ``f``: (n, b, m) -> (n, b, m)."""
    n, K, L, Dinv, t2, tW, Oi, red = factor
    b = f.shape[1]
    m = f.shape[2]
    p = K * L
    dtype = f.dtype
    if p != n:
        f = jnp.concatenate([f, jnp.zeros((p - n, b, m), dtype)])
    fk = f.reshape(K, L, b, m)
    fI = jnp.swapaxes(fk[:, : L - 1], 0, 1)          # (L-1, K, b, m)
    fS = fk[:, L - 1]                                # (K, b, m)

    def fwd(carry, inp):
        rcorr, acc = carry
        Dinv_j, tW_j, Oj, rj = inp
        rt = rj - rcorr
        tr = bmm(Dinv_j, rt)
        # W~^T D^-1 r~ = (D^-1 W~)^T r~ (D symmetric)
        acc = acc + bmm_tn(tW_j, rt)
        return (bmm_tn(Oj, tr), acc), tr

    (_, acc), trs = jax.lax.scan(
        fwd, (jnp.zeros((K, b, m), dtype), jnp.zeros((K, 2 * b, m), dtype)),
        (Dinv, tW, Oi, fI))

    accn = jnp.concatenate([acc[1:], jnp.zeros((1, 2 * b, m), dtype)])
    g = fS - acc[:, b:, :] - accn[:, :b, :]
    s = cr_solve(red, g)                             # (K, b, m) separators

    # beta = [s_{k-1}; s_k] per segment for the interior back-substitution
    beta = jnp.concatenate(
        [jnp.concatenate([jnp.zeros((1, b, m), dtype), s[:-1]]), s], axis=1)

    def bwd(x_next, inp):
        tr, tW_j, t2_j = inp
        x = tr - bmm(tW_j, beta) - bmm(t2_j, x_next)
        return x, x

    _, xI = jax.lax.scan(bwd, jnp.zeros((K, b, m), dtype),
                         (trs, tW, t2), reverse=True)

    X = jnp.concatenate([jnp.swapaxes(xI, 0, 1), s[:, None]], axis=1)
    return X.reshape(p, b, m)[:n]
