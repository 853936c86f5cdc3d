"""Cyclic reduction as fused Pallas TPU kernels (batch-last layout).

Why this exists: the ts=100 flagship solves need BOTH
  * cyclic reduction's elimination ORDER — its O(log T) elimination depth
    preserves the small-curvature valley components of the Newton
    direction that sequential O(T) orderings lose to the f32 noise floor
    (measured end-to-end: final cost gap 0.85e-2 for CR vs 1.37e-2 for
    the sequential orderings, against the 1e-2 bench optimality gate),
  * the Pallas execution model — the XLA lowering of ops/blocktri.py
    dispatches hundreds of small kernels per solve (measured 23 ms per
    solver iteration at B=1024 vs 15 ms for the fused sequential kernel).

Here every CR level runs as Pallas kernels over a batch-LAST slab layout
``(a, b, p*B)``: the level's p independent blocks fold into the
vectorized trailing axis next to the instance batch (entry (i, j, k*B+n)
= block k, instance n), so each of the ~log2(T) levels is a handful of
full-width VPU launches instead of XLA's fine-grained op stream.  The
math is the same elimination order and the same unrolled-Cholesky pivots
as ``cr_factor``/``cr_solve``.

Public API mirrors blocktri: :func:`crp_factor` / :func:`crp_solve`,
single-instance signatures batched via ``jax.vmap`` (custom_vmap).  The
factor is returned instance-major so the pair composes across separate
vmapped calls; each call transposes at the boundary (bandwidth-cheap
relative to the level math).  Unbatched / B % 128 != 0 falls back to the
plain XLA cyclic reduction.  Non-SPD pivots surface as NaN (the solver's
inertia signal) exactly like the other backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tol_tpu.ops.blocktri import _pad_pow2
from tol_tpu.ops.smallalg import bmm, bmm_tn, spd_inverse
from tol_tpu.ops.chainkern import (_interpret, _mm_slab, _mm_tn_slab,
                                   _spd_inverse_slab)


def _mm_nt_slab(A, Bm):
    """A @ B^T for slabs: (n, k, B), (m, k, B) -> (n, m, B)."""
    k = A.shape[1]
    out = None
    for j in range(k):
        t = jax.lax.slice_in_dim(A, j, j + 1, axis=1) \
            * jnp.swapaxes(jax.lax.slice_in_dim(Bm, j, j + 1, axis=1), 0, 1)
        out = t if out is None else out + t
    return out


# ---------------------------------------------------------------------------
# slab plumbing: (B, p, a, b) instance-major <-> (a, b, p*B) block-major slab
# ---------------------------------------------------------------------------

def _to_slab(x):
    Bb, p = x.shape[0], x.shape[1]
    return jnp.transpose(x, (2, 3, 1, 0)).reshape(x.shape[2], x.shape[3],
                                                  p * Bb)


def _from_slab(x, Bb):
    a, b, pB = x.shape
    return jnp.transpose(x.reshape(a, b, pB // Bb, Bb), (3, 2, 0, 1))


def _split_oe(x, Bb):
    """slab (a, b, p*B) -> (even, odd) slabs (a, b, p/2*B)."""
    a, b, pB = x.shape
    x4 = x.reshape(a, b, pB // Bb // 2, 2, Bb)
    return (x4[:, :, :, 0].reshape(a, b, -1),
            x4[:, :, :, 1].reshape(a, b, -1))


def _shift_fwd(x, Bb):
    """out[k] = x[k-1] along the block-major fused axis (zero fill)."""
    a, b, pB = x.shape
    x4 = x.reshape(a, b, pB // Bb, Bb)
    pad = jnp.zeros((a, b, 1, Bb), x.dtype)
    return jnp.concatenate([pad, x4[:, :, :-1]], axis=2).reshape(a, b, pB)


def _shift_bwd(x, Bb):
    """out[k] = x[k+1] (zero fill at the end)."""
    a, b, pB = x.shape
    x4 = x.reshape(a, b, pB // Bb, Bb)
    pad = jnp.zeros((a, b, 1, Bb), x.dtype)
    return jnp.concatenate([x4[:, :, 1:], pad], axis=2).reshape(a, b, pB)


def _interleave(xe, xo, Bb):
    a, b, hB = xe.shape
    h = hB // Bb
    out = jnp.stack([xe.reshape(a, b, h, Bb), xo.reshape(a, b, h, Bb)],
                    axis=3)
    return out.reshape(a, b, 2 * h * Bb)


# Fused-batch lanes per grid step.  128 is the Pallas floor (last block
# dim must be 128-divisible) and also the measured optimum: the r05
# in-loop sweep (scratch/time_iter.py, TOL_CRP_CHUNK env) gives
# 2.91 / 3.17 / 3.33 ms per 256-lane solver iteration at chunk
# 128 / 256 / 512 — smaller grid steps pipeline better and keep the
# unrolled Cholesky-inverse temporaries (~2-3 (b, chunk) matrices; 16M
# scoped-vmem budget, 44M demand at 4096) comfortably resident.
import os as _os

_LANE_CHUNK = int(_os.environ.get("TOL_CRP_CHUNK", "128"))


def _call_level(kernel, ins, n_out, out_dims, pB, dtype):
    """Run a level kernel chunked along the fused batch axis.

    ``ins``: list of slabs (a_i, b_i, pB); ``out_dims``: [(a, b), ...].
    All blocks are independent — the grid only tiles the fused axis.
    """
    chunk = min(pB, _LANE_CHUNK)
    while pB % chunk:
        chunk //= 2

    def spec(a, b):
        return pl.BlockSpec((a, b, chunk), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    out_specs = tuple(spec(a, b) for a, b in out_dims)
    out_shape = tuple(jax.ShapeDtypeStruct((a, b, pB), dtype)
                      for a, b in out_dims)
    res = pl.pallas_call(
        kernel, grid=(pB // chunk,),
        in_specs=[spec(x.shape[0], x.shape[1]) for x in ins],
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shape if n_out > 1 else out_shape[0],
        interpret=_interpret(),
    )(*ins)
    return res


# ---------------------------------------------------------------------------
# level kernels
# ---------------------------------------------------------------------------

def _factor_kernel(modd_ref, meven_ref, ol_ref, or_ref,
                   minv_ref, mhalf_ref, onext_ref, s_ref):
    """One CR level (all blocks independent).

    Inputs per block k: odd pivot M_{2k+1}, even diag M_{2k}, couplings
    OL_k = O_{2k} (even 2k <-> odd 2k+1) and OR_k = O_{2k+1} (odd 2k+1 <->
    even 2k+2).  Outputs:
        Minv  = M_odd^-1
        Mhalf = M_even - OL Minv OL^T      (missing the k-1 contribution,
                                            applied host-side via S)
        Onext = -OL Minv OR
        S     = OR^T Minv OR               (host shifts by one block and
                                            subtracts from Mhalf)
    """
    Minv = _spd_inverse_slab(modd_ref[...])
    OL = ol_ref[...]
    OR = or_ref[...]
    MinvOR = _mm_slab(Minv, OR)
    mhalf_ref[...] = meven_ref[...] - _mm_slab(OL, _mm_nt_slab(Minv, OL))
    onext_ref[...] = -_mm_slab(OL, MinvOR)
    s_ref[...] = _mm_tn_slab(OR, MinvOR)
    minv_ref[...] = Minv


def _factor_fwd_kernel(modd_ref, meven_ref, ol_ref, or_ref,
                       fodd_ref, feven_ref,
                       minv_ref, mhalf_ref, onext_ref, s_ref,
                       fe_ref, br_ref):
    """One CR level, factor + rhs forward-elimination FUSED (round 5).

    The separate forward pass re-reads Minv/OL/OR from HBM for every rhs
    column; the border columns (and the first Newton rhs) are known
    before the factor, so eliminating them here reuses the in-register
    pivot inverse and saves one full pass over the factor data per
    iteration.  Math identical to _factor_kernel + _fwd_kernel.
    """
    Minv = _spd_inverse_slab(modd_ref[...])
    OL = ol_ref[...]
    OR = or_ref[...]
    MinvOR = _mm_slab(Minv, OR)
    mhalf_ref[...] = meven_ref[...] - _mm_slab(OL, _mm_nt_slab(Minv, OL))
    onext_ref[...] = -_mm_slab(OL, MinvOR)
    s_ref[...] = _mm_tn_slab(OR, MinvOR)
    minv_ref[...] = Minv
    g = _mm_slab(Minv, fodd_ref[...])
    fe_ref[...] = feven_ref[...] - _mm_slab(OL, g)
    br_ref[...] = _mm_tn_slab(OR, g)


def _fwd_kernel(minv_ref, ol_ref, or_ref, fodd_ref, feven_ref,
                g_ref, fe_ref, br_ref):
    """Forward solve at one level: g = Minv f_odd; even updates
    f_even_k -= OL_k g_k (here) and f_even_{k+1} -= OR_k^T g_k (host
    shift of br)."""
    g = _mm_slab(minv_ref[...], fodd_ref[...])
    g_ref[...] = g
    fe_ref[...] = feven_ref[...] - _mm_slab(ol_ref[...], g)
    br_ref[...] = _mm_tn_slab(or_ref[...], g)


def _bwd_kernel(minv_ref, ol_ref, or_ref, fodd_ref, xe_ref, xs_ref,
                xo_ref):
    """Backward solve: x_odd = Minv (f_odd - OL^T x_even - OR x_even_next).
    xs_ref holds x_even shifted back by one block (x at even 2k+2)."""
    rhs = (fodd_ref[...] - _mm_tn_slab(ol_ref[...], xe_ref[...])
           - _mm_slab(or_ref[...], xs_ref[...]))
    xo_ref[...] = _mm_slab(minv_ref[...], rhs)


def _root_kernel(m_ref, minv_ref):
    minv_ref[...] = _spd_inverse_slab(m_ref[...])


def _root_solve_kernel(rinv_ref, f_ref, x_ref):
    x_ref[...] = _mm_slab(rinv_ref[...], f_ref[...])


# ---------------------------------------------------------------------------
# batched drivers (slab space)
# ---------------------------------------------------------------------------

def _factor_slab(M, O, Bb):
    b = M.shape[0]
    dtype = M.dtype
    levels = []
    p = M.shape[2] // Bb
    while p > 1:
        Me, Mo = _split_oe(M, Bb)
        OL, OR = _split_oe(O, Bb)
        half = Mo.shape[2]
        Minv, Mhalf, Onext, S = _call_level(
            _factor_kernel, [Mo, Me, OL, OR], 4,
            [(b, b)] * 4, half, dtype)
        M = Mhalf - _shift_fwd(S, Bb)
        O = Onext
        levels.append((Minv, OL, OR))
        p //= 2
    root_inv = _call_level(_root_kernel, [M], 1, [(b, b)], Bb, dtype)
    return levels, root_inv


def _factor_fwd_slab(M, O, F, Bb):
    """Fused factor + forward-elimination of F, then backward sweep.

    Returns (levels, root_inv, X) in slab space; X solves the chain for
    the rhs F in ONE pass over the level data (vs factor + separate
    forward).  The backward sweep reuses _bwd_kernel.
    """
    b, m = M.shape[0], F.shape[1]
    dtype = M.dtype
    levels = []
    stack = []
    p = M.shape[2] // Bb
    while p > 1:
        Me, Mo = _split_oe(M, Bb)
        OL, OR = _split_oe(O, Bb)
        Fe, Fo = _split_oe(F, Bb)
        half = Mo.shape[2]
        Minv, Mhalf, Onext, S, Fe2, brF = _call_level(
            _factor_fwd_kernel, [Mo, Me, OL, OR, Fo, Fe], 6,
            [(b, b)] * 4 + [(b, m)] * 2, half, dtype)
        M = Mhalf - _shift_fwd(S, Bb)
        O = Onext
        F = Fe2 - _shift_fwd(brF, Bb)
        levels.append((Minv, OL, OR))
        stack.append(Fo)
        p //= 2
    root_inv = _call_level(_root_kernel, [M], 1, [(b, b)], Bb, dtype)
    x = _call_level(_root_solve_kernel, [root_inv, F], 1, [(b, m)],
                    F.shape[2], dtype)
    for (Minv, OL, OR), fo in zip(reversed(levels), reversed(stack)):
        half = fo.shape[2]
        xs = _shift_bwd(x, Bb)
        xo = _call_level(_bwd_kernel, [Minv, OL, OR, fo, x, xs], 1,
                         [(b, m)], half, dtype)
        x = _interleave(x, xo, Bb)
    return levels, root_inv, x


def _solve_slab(levels, root_inv, f, Bb):
    b, m = f.shape[0], f.shape[1]
    dtype = f.dtype
    stack = []
    for (Minv, OL, OR) in levels:
        fe, fo = _split_oe(f, Bb)
        half = fo.shape[2]
        g, fe2, br = _call_level(
            _fwd_kernel, [Minv, OL, OR, fo, fe], 3,
            [(b, m)] * 3, half, dtype)
        f = fe2 - _shift_fwd(br, Bb)
        stack.append(fo)
    x = _call_level(_root_solve_kernel, [root_inv, f], 1, [(b, m)],
                    f.shape[2], dtype)
    for (Minv, OL, OR), fo in zip(reversed(levels), reversed(stack)):
        half = fo.shape[2]
        xs = _shift_bwd(x, Bb)
        xo = _call_level(_bwd_kernel, [Minv, OL, OR, fo, x, xs], 1,
                         [(b, m)], half, dtype)
        x = _interleave(x, xo, Bb)
    return x


# ---------------------------------------------------------------------------
# XLA reference (single instance) — same level math, used as the
# custom_vmap fallback so factors stay structurally identical.
# ---------------------------------------------------------------------------

def _factor_ref(M, O):
    n = M.shape[0]
    M, O, p = _pad_pow2(M, O, n)
    O = O.at[p - 1].set(0.0)
    levels = []
    while p > 1:
        Mo = M[1::2]
        Me = M[0::2]
        OL = O[0::2]
        OR = O[1::2]
        Minv = spd_inverse(Mo)
        MinvOR = bmm(Minv, OR)
        Mhalf = Me - bmm(OL, bmm(Minv, jnp.swapaxes(OL, -1, -2)))
        S = bmm_tn(OR, MinvOR)
        M = Mhalf.at[1:].add(-S[:-1])
        O = -bmm(OL, MinvOR)
        levels.append((Minv, OL, OR))
        p //= 2
    root_inv = spd_inverse(M[0:1])
    return levels, root_inv


def _factor_solve_ref(M, O, F):
    """XLA reference for the fused factor+solve (single instance)."""
    n = M.shape[0]
    M, O, p = _pad_pow2(M, O, n)
    if F.shape[0] != p:
        F = jnp.concatenate(
            [F, jnp.zeros((p - F.shape[0],) + F.shape[1:], F.dtype)])
    O = O.at[p - 1].set(0.0)
    levels = []
    stack = []
    while p > 1:
        Mo = M[1::2]
        Me = M[0::2]
        OL = O[0::2]
        OR = O[1::2]
        Fo = F[1::2]
        Fe = F[0::2]
        Minv = spd_inverse(Mo)
        MinvOR = bmm(Minv, OR)
        Mhalf = Me - bmm(OL, bmm(Minv, jnp.swapaxes(OL, -1, -2)))
        S = bmm_tn(OR, MinvOR)
        M = Mhalf.at[1:].add(-S[:-1])
        O = -bmm(OL, MinvOR)
        g = bmm(Minv, Fo)
        Fe = Fe - bmm(OL, g)
        Fe = Fe.at[1:].add(-bmm_tn(OR[:-1], g[:-1]))
        F = Fe
        levels.append((Minv, OL, OR))
        stack.append(Fo)
        p //= 2
    root_inv = spd_inverse(M[0:1])
    x = bmm(root_inv, F[0:1])
    for (Minv, OL, OR), fo in zip(reversed(levels), reversed(stack)):
        xs = jnp.concatenate([x[1:], jnp.zeros_like(x[0:1])])
        rhs = fo - bmm_tn(OL, x) - bmm(OR, xs)
        xo = bmm(Minv, rhs)
        h = fo.shape[0]
        x = jnp.stack([x, xo], axis=1).reshape(2 * h, *x.shape[1:])
    return tuple(levels), root_inv, x


def _solve_ref(levels, root_inv, f):
    stack = []
    for (Minv, OL, OR) in levels:
        fo = f[1::2]
        g = bmm(Minv, fo)
        fe = f[0::2] - bmm(OL, g)
        fe = fe.at[1:].add(-bmm_tn(OR[:-1], g[:-1]))
        stack.append(fo)
        f = fe
    x = bmm(root_inv, f[0:1])
    for (Minv, OL, OR), fo in zip(reversed(levels), reversed(stack)):
        xs = jnp.concatenate([x[1:], jnp.zeros_like(x[0:1])])
        rhs = fo - bmm_tn(OL, x) - bmm(OR, xs)
        xo = bmm(Minv, rhs)
        h = fo.shape[0]
        x = jnp.stack([x, xo], axis=1).reshape(2 * h, *x.shape[1:])
    return x


# ---------------------------------------------------------------------------
# public custom_vmap API
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def crp_factor(M, O):
    """Factor the symmetric block-tridiagonal chain (single instance).

    M, O: (n, b, b), O[i] coupling x_i -> x_{i+1}.  Returns
    (levels, root_inv) with levels a tuple of (Minv, OL, OR) per CR level
    (block counts halving).  Batched under vmap -> Pallas level kernels.
    """
    levels, root_inv = _factor_ref(M, O)
    return tuple(levels), root_inv


@crp_factor.def_vmap
def _crp_factor_vmap(axis_size, in_batched, M, O):
    mb, ob = in_batched
    if not mb:
        M = jnp.broadcast_to(M, (axis_size,) + M.shape)
    if not ob:
        O = jnp.broadcast_to(O, (axis_size,) + O.shape)
    Bb = axis_size
    n, b = M.shape[1], M.shape[2]
    if Bb % 128 != 0:
        levels, root = jax.lax.map(lambda a: _factor_ref(*a), (M, O))
        out = (tuple(levels), root)
        return out, jax.tree_util.tree_map(lambda _: True, out)
    # pad to power of two (batched)
    p = 1
    while p < n:
        p *= 2
    if p != n:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=M.dtype),
                               (Bb, p - n, b, b))
        M = jnp.concatenate([M, eye], axis=1)
        O = jnp.concatenate([O, jnp.zeros((Bb, p - n, b, b), M.dtype)],
                            axis=1)
    O = O.at[:, p - 1].set(0.0)
    levels, root_inv = _factor_slab(_to_slab(M), _to_slab(O), Bb)
    out = (tuple((_from_slab(Mi, Bb), _from_slab(OLi, Bb),
                  _from_slab(ORi, Bb)) for (Mi, OLi, ORi) in levels),
           _from_slab(root_inv, Bb))
    return out, jax.tree_util.tree_map(lambda _: True, out)


@jax.custom_batching.custom_vmap
def crp_factor_solve(M, O, F):
    """Fused factor + multi-rhs solve (single instance).

    M, O as :func:`crp_factor`; F: (n, b, m) rhs columns known BEFORE
    the factor (the condensed border columns + the first Newton rhs).
    Returns (levels, root_inv, X) where X (n_pad, b, m) solves the chain
    for F (caller slices [:n]) and (levels, root_inv) are reusable by
    :func:`crp_solve` for later rhs (refinement passes).  One pass over
    the level data instead of factor + separate forward solve.
    """
    return _factor_solve_ref(M, O, F)


@crp_factor_solve.def_vmap
def _crp_factor_solve_vmap(axis_size, in_batched, M, O, F):
    mb, ob, fb = in_batched
    if not mb:
        M = jnp.broadcast_to(M, (axis_size,) + M.shape)
    if not ob:
        O = jnp.broadcast_to(O, (axis_size,) + O.shape)
    if not fb:
        F = jnp.broadcast_to(F, (axis_size,) + F.shape)
    Bb = axis_size
    n, b = M.shape[1], M.shape[2]
    if Bb % 128 != 0:
        out = jax.lax.map(lambda a: _factor_solve_ref(*a), (M, O, F))
        return out, jax.tree_util.tree_map(lambda _: True, out)
    p = 1
    while p < n:
        p *= 2
    if p != n:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=M.dtype),
                               (Bb, p - n, b, b))
        M = jnp.concatenate([M, eye], axis=1)
        O = jnp.concatenate([O, jnp.zeros((Bb, p - n, b, b), M.dtype)],
                            axis=1)
    if F.shape[1] != p:
        F = jnp.concatenate(
            [F, jnp.zeros((Bb, p - F.shape[1]) + F.shape[2:], F.dtype)],
            axis=1)
    O = O.at[:, p - 1].set(0.0)
    levels, root_inv, x = _factor_fwd_slab(_to_slab(M), _to_slab(O),
                                           _to_slab(F), Bb)
    out = (tuple((_from_slab(Mi, Bb), _from_slab(OLi, Bb),
                  _from_slab(ORi, Bb)) for (Mi, OLi, ORi) in levels),
           _from_slab(root_inv, Bb), _from_slab(x, Bb))
    return out, jax.tree_util.tree_map(lambda _: True, out)


@jax.custom_batching.custom_vmap
def crp_solve(levels, root_inv, f):
    """Solve with a :func:`crp_factor` factor.  f: (n_pad, b, m) zero-
    padded to the factor's power-of-two length by :func:`crp_pad_rhs`;
    returns (n_pad, b, m) (caller slices [:n_orig])."""
    return _solve_ref(list(levels), root_inv, f)


@crp_solve.def_vmap
def _crp_solve_vmap(axis_size, in_batched, levels, root_inv, f):
    Bb = axis_size
    lv_b, ri_b, f_b = in_batched

    def bc(batched, x):
        return x if batched else jnp.broadcast_to(x, (Bb,) + x.shape)

    levels = jax.tree_util.tree_map(bc, lv_b, levels)
    root_inv = bc(ri_b, root_inv)
    f = bc(f_b, f)
    if Bb % 128 != 0:
        out = jax.lax.map(lambda a: _solve_ref(a[0], a[1], a[2]),
                          (levels, root_inv, f))
        return out, True
    slab_levels = [(_to_slab(Mi), _to_slab(OLi), _to_slab(ORi))
                   for (Mi, OLi, ORi) in levels]
    x = _solve_slab(slab_levels, _to_slab(root_inv), _to_slab(f), Bb)
    return _from_slab(x, Bb), True


def crp_pad_rhs(f, n_pad):
    """Zero-pad the rhs block axis to the factor's power-of-two length."""
    if f.shape[0] == n_pad:
        return f
    return jnp.concatenate(
        [f, jnp.zeros((n_pad - f.shape[0],) + f.shape[1:], f.dtype)])
