"""Fused Pallas kernels for the condensed KKT chain (TPU hot loop).

The condensed system (kkt_condensed.py) is a block-tridiagonal chain
(T blocks of 11x11) plus a ~14-wide border.  In stock XLA the block
elimination runs as a ``lax.scan`` whose every step issues dozens of tiny
kernels — fixed dispatch cost dominates (measured ~19ms per batched KKT
solve at T=100, B=1024, ~80% of solver iteration time).

Here the whole elimination is ONE ``pallas_call`` with:

  * batch-LAST layout ``(T, n, m, B)``: with B = 1024 = 8 sublanes x 128
    lanes, every scalar step of the unrolled Cholesky/matmul recurrences
    is a single full-width VPU op on a contiguous f32 tile;
  * a sequential grid over T (Pallas TPU executes grid steps in order),
    per-step slabs streamed HBM->VMEM by the automatic pipeline;
  * carries (previous-step corrections, border Schur accumulator) in VMEM
    scratch that persists across grid steps.

Two kernels: forward factor+eliminate (border columns and rhs are
eliminated together as extra columns) and backward substitution.
Iterative-refinement passes re-run the elimination with the fresh rhs —
still ~10x cheaper than the XLA scan it replaces.

The public entry :func:`chain_factor_solve` is a ``custom_vmap``: called
per-instance inside ``jax.vmap``-batched solvers, the batch rule fires the
batch-wide kernels (the unbatched fallback uses plain XLA scans).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Pallas TPU kernels only lower on TPU; elsewhere (CPU tests) run the
    # interpreter so the same code path stays exercised.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# slab algebra: arrays (..., n, m, B) with vectors on the trailing lane axis
# ---------------------------------------------------------------------------

def _col(A, j):
    """(n, m, B) -> column j as (n, B) via slice+reshape (Mosaic lowers
    scalar middle-axis indexing of 3D arrays as an unsupported gather)."""
    n, _, B = A.shape
    return jnp.reshape(jax.lax.slice_in_dim(A, j, j + 1, axis=1), (n, B))


def _chol_slab(A):
    """Cholesky of SPD slab ``A``: (n, n, B) -> columns list [(n, B)]."""
    n = A.shape[0]
    cols = []
    for j in range(n):
        s = _col(A, j)                   # (n, B)
        for k in range(j):
            s = s - cols[k][j] * cols[k]
        # NOT lax.rsqrt: the TPU rsqrt is a fast approximation and the
        # solver endgame needs full f32 pivots (measured: rsqrt pivots
        # stall the ALM at ~1e-4 feasibility).
        d = 1.0 / jnp.sqrt(s[j])         # (B,)
        cols.append(s * d)
    return cols


def _spd_inverse_slab(A):
    """Explicit inverse of SPD slab (n, n, B) via unrolled Cholesky."""
    n, B = A.shape[0], A.shape[2]
    L = _chol_slab(A)                    # L[j]: column j, rows (n, B)
    # Solve L Y = I column by column (forward), then L^T X = Y (backward).
    # Y[:, c] columns of Y for unit rhs e_c.
    X = []
    for c in range(n):
        # forward: y_i = (e_c[i] - sum_{k<i} L[k][i] y_k) / L[i][i]
        y = []
        for i in range(n):
            s = None
            for k in range(i):
                t = L[k][i] * y[k]
                s = t if s is None else s + t
            e = 1.0 if i == c else 0.0
            num = (e - s) if s is not None else (e + jnp.zeros_like(L[i][i]))
            y.append(num / L[i][i])
        # backward: x_i = (y_i - sum_{k>i} L[i][k] x_k) / L[i][i]
        x = [None] * n
        for i in range(n - 1, -1, -1):
            s = None
            for k in range(i + 1, n):
                t = L[i][k] * x[k]
                s = t if s is None else s + t
            num = (y[i] - s) if s is not None else y[i]
            x[i] = num / L[i][i]
        X.append(jnp.stack(x, axis=0))   # (n, B) column c of A^-1
    return jnp.stack(X, axis=1)          # (n, n, B)


def _mm_slab(A, Bm):
    """(n, k, B) @ (k, m, B) -> (n, m, B), unrolled over k.

    Written with pure slices (no scalar indexing of 3D operands): Mosaic
    lowers those as >2D gathers, which are unsupported.
    """
    k = A.shape[1]
    out = None
    for j in range(k):
        t = jax.lax.slice_in_dim(A, j, j + 1, axis=1) \
            * jax.lax.slice_in_dim(Bm, j, j + 1, axis=0)  # (n,1,B)*(1,m,B)
        out = t if out is None else out + t
    return out


def _mm_tn_slab(A, Bm):
    """(k, n, B)^T @ (k, m, B) -> (n, m, B), unrolled over k."""
    k = A.shape[0]
    out = None
    for j in range(k):
        a_j = jnp.swapaxes(jax.lax.slice_in_dim(A, j, j + 1, axis=0), 0, 1)
        t = a_j * jax.lax.slice_in_dim(Bm, j, j + 1, axis=0)
        out = t if out is None else out + t
    return out


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _factor_kernel(M_ref, R_ref, O_ref, dinv_ref, t2_ref, tR_ref, s_ref,
                   dcorr, rcorr, s_acc):
    """Forward block elimination, one chain block per grid step.

    carries: dcorr (n,n,B), rcorr (n,nC,B), s_acc (nC,nC,B).
    R = [W | r] border columns + rhs; s_acc accumulates R~^T D~^-1 R~,
    whose [:nB,:nB] block is the border Schur correction and whose last
    column carries the reduced border rhs.
    """
    i = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dcorr[...] = jnp.zeros_like(dcorr)
        rcorr[...] = jnp.zeros_like(rcorr)
        s_acc[...] = jnp.zeros_like(s_acc)

    Dt = M_ref[0] - dcorr[...]
    Rt = R_ref[0] - rcorr[...]
    Oi = O_ref[0]
    Dinv = _spd_inverse_slab(Dt)
    tR = _mm_slab(Dinv, Rt)              # D~^-1 [W | r]
    t2 = _mm_slab(Dinv, Oi)              # D~^-1 O_i
    s_acc[...] = s_acc[...] + _mm_tn_slab(Rt, tR)
    OiT = jnp.swapaxes(Oi, 0, 1)
    dcorr[...] = _mm_slab(OiT, t2)
    rcorr[...] = _mm_slab(OiT, tR)
    dinv_ref[0] = Dinv
    t2_ref[0] = t2
    tR_ref[0] = tR

    @pl.when(i == T - 1)
    def _():
        s_ref[...] = s_acc[...]


def _rhs_forward_kernel(dinv_ref, o_ref, trw_ref, r_ref, tr_ref, sb_ref,
                        rcorr, sb_acc):
    """Forward elimination of ONE rhs column reusing stored factors.

    Same recurrence as :func:`_factor_kernel` restricted to the rhs column:
        r~_j = r_j - O_{j-1}^T tr_{j-1},   tr_j = Dinv_j r~_j,
        sb  += tRw_j^T r~_j                (border-reduction accumulator,
                                            valid since D is symmetric:
                                            W~^T D^-1 r~ = (D^-1 W~)^T r~).
    The O(n^3) inverse work of the factor pass is skipped — a refinement
    pass costs O(n^2) per block instead of O(n^3).
    """
    i = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        rcorr[...] = jnp.zeros_like(rcorr)
        sb_acc[...] = jnp.zeros_like(sb_acc)

    rt = r_ref[0] - rcorr[...]                      # (n, 1, B)
    tr = _mm_slab(dinv_ref[0], rt)                  # (n, 1, B)
    sb_acc[...] = sb_acc[...] + _mm_tn_slab(trw_ref[0], rt)
    rcorr[...] = _mm_slab(jnp.swapaxes(o_ref[0], 0, 1), tr)
    tr_ref[0] = tr

    @pl.when(i == T - 1)
    def _():
        sb_ref[...] = sb_acc[...]


def _bwd_kernel(tR_ref, t2_ref, coef_ref, x_ref, x_next):
    """Backward substitution, reverse grid order.

    x_i = tR_i @ coef - t2_i @ x_{i+1}, coef = [-beta; 1] (nC, 1, B).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        x_next[...] = jnp.zeros_like(x_next)

    x = _mm_slab(tR_ref[0], coef_ref[...]) - _mm_slab(t2_ref[0], x_next[...])
    x_ref[0] = x
    x_next[...] = x


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _rhs_forward_batched(Dinv, O, tRw, r):
    """Dinv, O: (T, n, n, B); tRw: (T, n, nB, B); r: (T, n, 1, B).

    Returns (tr (T, n, 1, B), sb (nB, 1, B))."""
    T, n, _, B = Dinv.shape
    nB = tRw.shape[2]
    dtype = Dinv.dtype
    slab = lambda a, b: pl.BlockSpec((1, a, b, B), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rhs_forward_kernel,
        grid=(T,),
        in_specs=[slab(n, n), slab(n, n), slab(n, nB), slab(n, 1)],
        out_specs=(slab(n, 1),
                   pl.BlockSpec((nB, 1, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T, n, 1, B), dtype),
                   jax.ShapeDtypeStruct((nB, 1, B), dtype)),
        scratch_shapes=[
            pltpu.VMEM((n, 1, B), dtype),
            pltpu.VMEM((nB, 1, B), dtype),
        ],
        interpret=_interpret(),
    )(Dinv, O, tRw, r)

def _factor_eliminate_batched(M, O, R):
    """M, O: (T, n, n, B); R: (T, n, nC, B).

    Returns (Dinv, t2, tR, S) with S: (nC, nC, B) = sum R~^T D~^-1 R~.
    """
    T, n, _, B = M.shape
    nC = R.shape[2]
    dtype = M.dtype
    grid = (T,)
    slab = lambda a, b: pl.BlockSpec((1, a, b, B), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((T, n, n, B), dtype),
        jax.ShapeDtypeStruct((T, n, n, B), dtype),
        jax.ShapeDtypeStruct((T, n, nC, B), dtype),
        jax.ShapeDtypeStruct((nC, nC, B), dtype),
    )
    return pl.pallas_call(
        _factor_kernel,
        grid=grid,
        in_specs=[slab(n, n), slab(n, nC), slab(n, n)],
        out_specs=(slab(n, n), slab(n, n), slab(n, nC),
                   pl.BlockSpec((nC, nC, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((n, n, B), dtype),
            pltpu.VMEM((n, nC, B), dtype),
            pltpu.VMEM((nC, nC, B), dtype),
        ],
        interpret=_interpret(),
    )(M, R, O)


def _back_substitute_batched(tR, t2, coef):
    """tR: (T, n, nC, B), t2: (T, n, n, B), coef: (nC, 1, B) -> x (T, n, B)."""
    T, n, nC, B = tR.shape
    dtype = tR.dtype
    rev = lambda a, b: pl.BlockSpec((1, a, b, B),
                                    lambda i: (T - 1 - i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[rev(n, nC), rev(n, n),
                  pl.BlockSpec((nC, 1, B), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=rev(n, 1),
        out_shape=jax.ShapeDtypeStruct((T, n, 1, B), dtype),
        scratch_shapes=[pltpu.VMEM((n, 1, B), dtype)],
        interpret=_interpret(),
    )(tR, t2, coef)
    return x[:, :, 0, :]


# ---------------------------------------------------------------------------
# public custom-vmap entry
# ---------------------------------------------------------------------------

def _scan_eliminate(M, O, R):
    """Reference/unbatched path: same outputs as _factor_eliminate_batched
    for a single instance (T, n, n), (T, n, nC)."""
    from tol_tpu.ops.smallalg import bmm, bmm_tn, spd_inverse

    T, n, _ = M.shape
    nC = R.shape[2]
    dtype = M.dtype

    def step(carry, inp):
        dcorr, rcorr, s_acc = carry
        Mi, Ri, Oi = inp
        Dt = Mi - dcorr
        Rt = Ri - rcorr
        Dinv = spd_inverse(Dt)
        tR = bmm(Dinv, Rt)
        t2 = bmm(Dinv, Oi)
        s_acc = s_acc + bmm_tn(Rt, tR)
        return (bmm_tn(Oi, t2), bmm_tn(Oi, tR), s_acc), (Dinv, t2, tR)

    (_, _, S), (Dinv, t2, tR) = jax.lax.scan(
        step,
        (jnp.zeros((n, n), dtype), jnp.zeros((n, nC), dtype),
         jnp.zeros((nC, nC), dtype)),
        (M, R, O))
    return Dinv, t2, tR, S


def _scan_back_sub(tR, t2, coef):
    """Reference/unbatched backward substitution: (T, n, nC), (T, n, n),
    coef (nC,) -> (T, n)."""
    from tol_tpu.ops.smallalg import bmv

    n = tR.shape[1]

    def step(x_next, inp):
        tRi, t2i = inp
        x = bmv(tRi, coef) - bmv(t2i, x_next)
        return x, x

    _, xs = jax.lax.scan(step, jnp.zeros((n,), tR.dtype), (tR, t2),
                         reverse=True)
    return xs


@jax.custom_batching.custom_vmap
def chain_eliminate(M, O, R):
    """Forward elimination of the bordered chain (single instance).

    M, O: (T, n, n); R: (T, n, nC).  Returns (Dinv, t2, tR, S)."""
    return _scan_eliminate(M, O, R)


@chain_eliminate.def_vmap
def _chain_eliminate_vmap(axis_size, in_batched, M, O, R):
    mb, ob, rb = in_batched
    if not (mb and ob and rb):
        M = M if mb else jnp.broadcast_to(M, (axis_size,) + M.shape)
        O = O if ob else jnp.broadcast_to(O, (axis_size,) + O.shape)
        R = R if rb else jnp.broadcast_to(R, (axis_size,) + R.shape)
    B = axis_size
    if B % 128 != 0:
        out = jax.lax.map(lambda args: _scan_eliminate(*args), (M, O, R))
        return out, (True, True, True, True)
    # (B, T, n, m) -> (T, n, m, B)
    tb = lambda a: jnp.transpose(a, (1, 2, 3, 0))
    Dinv, t2, tR, S = _factor_eliminate_batched(tb(M), tb(O), tb(R))
    fb = lambda a: jnp.transpose(a, (3, 0, 1, 2))
    return (fb(Dinv), fb(t2), fb(tR), jnp.transpose(S, (2, 0, 1))), \
        (True, True, True, True)


def _scan_rhs_forward(Dinv, O, tRw, r):
    """Unbatched reference for :func:`chain_rhs_forward`: (T, n, n),
    (T, n, n), (T, n, nB), (T, n) -> (tr (T, n), sb (nB,))."""
    from tol_tpu.ops.smallalg import bmv, bmv_t

    nB = tRw.shape[2]

    def step(carry, inp):
        rcorr, sb = carry
        Dinv_i, O_i, tRw_i, r_i = inp
        rt = r_i - rcorr
        tr = bmv(Dinv_i, rt)
        sb = sb + bmv_t(tRw_i, rt)
        return (bmv_t(O_i, tr), sb), tr

    (_, sb), trs = jax.lax.scan(
        step, (jnp.zeros((Dinv.shape[1],), Dinv.dtype),
               jnp.zeros((nB,), Dinv.dtype)),
        (Dinv, O, tRw, r))
    return trs, sb


@jax.custom_batching.custom_vmap
def chain_rhs_forward(Dinv, O, tRw, r):
    """Forward-eliminate one rhs column with stored factors (single
    instance): Dinv, O: (T, n, n); tRw: (T, n, nB); r: (T, n).

    Returns (tr (T, n), sb (nB,)) with sb the border-reduction
    accumulator sum_j W~_j^T D_j^-1 r~_j."""
    return _scan_rhs_forward(Dinv, O, tRw, r)


@chain_rhs_forward.def_vmap
def _chain_rhs_forward_vmap(axis_size, in_batched, Dinv, O, tRw, r):
    db, ob, wb, rb = in_batched
    if not db:
        Dinv = jnp.broadcast_to(Dinv, (axis_size,) + Dinv.shape)
    if not ob:
        O = jnp.broadcast_to(O, (axis_size,) + O.shape)
    if not wb:
        tRw = jnp.broadcast_to(tRw, (axis_size,) + tRw.shape)
    if not rb:
        r = jnp.broadcast_to(r, (axis_size,) + r.shape)
    B = axis_size
    if B % 128 != 0:
        out = jax.lax.map(lambda args: _scan_rhs_forward(*args),
                          (Dinv, O, tRw, r))
        return out, (True, True)
    tb = lambda a: jnp.transpose(a, (1, 2, 3, 0))
    tr, sb = _rhs_forward_batched(
        tb(Dinv), tb(O), tb(tRw),
        jnp.transpose(r[..., None], (1, 2, 3, 0)))
    return (jnp.transpose(tr[:, :, 0, :], (2, 0, 1)),
            jnp.transpose(sb[:, 0, :], (1, 0))), (True, True)


@jax.custom_batching.custom_vmap
def chain_back_sub(tR, t2, coef):
    """Backward substitution (single instance): x_i = tR_i@coef - t2_i@x_{i+1}."""
    return _scan_back_sub(tR, t2, coef)


@chain_back_sub.def_vmap
def _chain_back_sub_vmap(axis_size, in_batched, tR, t2, coef):
    tb_, t2b, cb = in_batched
    if not tb_:
        tR = jnp.broadcast_to(tR, (axis_size,) + tR.shape)
    if not t2b:
        t2 = jnp.broadcast_to(t2, (axis_size,) + t2.shape)
    if not cb:
        coef = jnp.broadcast_to(coef, (axis_size,) + coef.shape)
    B = axis_size
    if B % 128 != 0:
        out = jax.lax.map(lambda args: _scan_back_sub(*args), (tR, t2, coef))
        return out, True
    tb = lambda a: jnp.transpose(a, (1, 2, 3, 0))
    x = _back_substitute_batched(tb(tR), tb(t2),
                                 jnp.transpose(coef, (1, 0))[:, None, :])
    return jnp.transpose(x, (2, 0, 1)), True
