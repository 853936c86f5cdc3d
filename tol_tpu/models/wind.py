"""Wind-field models.

The reference computes per-node wind samples ``u,v,w`` (ENU) and their nine
spatial gradients in ``problem::modelWind`` (src/problem.cpp:475-757), then
swizzles to NED inside ``dynamicConstraints`` (src/problem.cpp:970-981).
Model selection by ``Pwindmodel``:

    0 zero wind                       (src/problem.cpp:480-498)
    1 linear boundary layer           (src/problem.cpp:501-531)
    2 single thermal                  (sketched, src/problem.cpp:534-541)
    3 gridded storm field, trilinear  (src/problem.cpp:544-693)
    4 dual thermals (source+sink)     (sketched, src/problem.cpp:698-706)
    5 cyclic wind                     (sketched, src/problem.cpp:709-730)

Here each model is a *differentiable* pure function of ENU position: the
gradient tensor is obtained by ``jax.jacfwd`` instead of hand-coded shape
function derivatives — model 3's trilinear interpolation derivative is
algebraically identical to the reference's eight-node hexahedron ``NwrtX/Y/Z``
tables (src/problem.cpp:643-670, derived in matlab/tools/
trilinear_shapefunctions.m), and comes for free here.

The gridded field replaces the reference's MongoDB cache
(``problem::cacheWind``, src/problem.cpp:371-469) with an in-memory array
pytree loaded host-side (see tol_tpu.io and the native loader).  The
reference keeps only the v-component live in model 3 (u/w accumulations
commented out, src/problem.cpp:631-635, 682-692); ``WindGrid.live`` carries
that mask and defaults to reference behaviour.

All positions here are *aircraft-local NED* at the public API
(``wind_ned``); conversion to the ENU field frame mirrors
src/problem.cpp:550-553: ``x_enu = y_ned + east0, y_enu = x_ned + north0,
z_enu = -z_ned + up0``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class WindGrid(NamedTuple):
    """Uniform ENU wind grid (replaces the Mongo ``straka`` cache).

    ``u/v/w`` have shape (nx, ny, nz) indexed by (east, north, up) cells;
    ``origin`` is the ENU position of node [0,0,0]; ``spacing`` the (dx,dy,dz)
    cell sizes (reference uses 150 m in all axes, include/problem.h:86-88).
    ``live`` masks components, default (0,1,0) matching the reference's
    v-only interpolation (src/problem.cpp:631-635).
    """

    origin: jax.Array   # (3,) ENU
    spacing: jax.Array  # (3,)
    u: jax.Array        # (nx, ny, nz)
    v: jax.Array
    w: jax.Array
    live: jax.Array     # (3,) float mask over (u, v, w)


@dataclasses.dataclass(frozen=True)
class WindConfig:
    """Parameters for all wind models; ``model`` selects behaviour.

    Registered as a pytree with ``model`` as *static* metadata: the model
    index selects code (the ``switch (Pwindmodel)`` of src/problem.cpp:477)
    and therefore must not be traced or batched; all numeric fields are
    ordinary leaves that can carry batch axes.
    """

    model: int = 1
    # model-3 interpolation strategy (static; selects code):
    #   "gather"     k^3-corner fused stencil gather (any grid size)
    #   "onehot"     one-hot contraction against pre-shifted corner
    #                tables (MXU matmul; ~3x cheaper than gather for
    #                small grids, superseded by "separable")
    #   "separable"  axis-separated dense contraction (no gather, ~80x
    #                fewer FLOPs than onehot at bench-scale grids; the
    #                measured-fastest lowering for solver query shapes)
    #   "auto"       "separable" when the grid has <= 65536 cells else
    #                "gather"
    interp: str = "auto"
    # model-3 interpolation order (static; selects code):
    #   1  trilinear (reference parity: the C0 8-node hexahedron shape
    #      functions of src/problem.cpp:617-635)
    #   2  uniform quadratic B-spline (C1, 27-node stencil, linear
    #      precision) — the TPU-first choice for *optimizing* through a
    #      gridded field: trilinear wind kinks at cell faces destroy
    #      pointwise KKT stationarity when the optimal path crosses
    #      cells (measured: f64 dual residual stalls ~1e+1 on a
    #      nonuniform field); the C1 field restores the certificate.
    order: int = 1
    # model 1: linear boundary layer v_north = -vref * z_up / href
    # (src/problem.cpp:504-505: Vref=2.4, href=10)
    vref: float = 2.4
    href: float = 10.0
    # models 2/4: thermal centers / strengths (ref sketch src/problem.cpp:536-541)
    xth: float = 0.0
    yth: float = 0.0
    vcore: float = 3.0
    rlift: float = 30.0
    xth2: float = 200.0
    yth2: float = 0.0
    vcore2: float = -3.0
    rlift2: float = 30.0
    # datum offset for gridded fields: local NED origin in field-ENU coords
    # (ref override values src/problem.cpp:411-413)
    east0: float = 17400.0
    north0: float = 25800.0
    up0: float = 200.0
    grid: Optional[WindGrid] = None


jax.tree_util.register_dataclass(
    WindConfig,
    data_fields=["vref", "href", "xth", "yth", "vcore", "rlift",
                 "xth2", "yth2", "vcore2", "rlift2",
                 "east0", "north0", "up0", "grid"],
    meta_fields=["model", "interp", "order"],
)


def _local_ned_to_field_enu(cfg: WindConfig, p_ned: jax.Array) -> jax.Array:
    """src/problem.cpp:550-553 (model 3) / :522 (model 1 uses z only)."""
    x_e = p_ned[1] + cfg.east0
    y_n = p_ned[0] + cfg.north0
    z_u = -p_ned[2] + cfg.up0
    return jnp.stack([x_e, y_n, z_u])


def _zero_wind(cfg: WindConfig, p_enu: jax.Array) -> jax.Array:
    return jnp.zeros(3, dtype=p_enu.dtype)


def _boundary_layer(cfg: WindConfig, p_enu: jax.Array) -> jax.Array:
    """Linear boundary layer: v = -Vref*z/href (src/problem.cpp:522-524).

    Note the reference evaluates this with the *local* altitude ``zs=-z_ned``
    (no datum offset); we therefore subtract ``up0`` back out so model 1 is
    datum-independent.
    """
    z_local = p_enu[2] - cfg.up0
    v = -cfg.vref * z_local / cfg.href
    zero = jnp.zeros((), dtype=p_enu.dtype)
    return jnp.stack([zero, v, zero])


def _thermal_updraft(p_enu, xth, yth, vcore, rlift):
    """Gaussian thermal w_up = vcore * exp(-r^2 / rlift^2).

    The reference sketch (src/problem.cpp:536-538) writes the NED-down
    component ``wz = -Vcore*exp(...)``; in our ENU convention that is an
    updraft of +vcore.
    """
    r2 = (p_enu[0] - xth) ** 2 + (p_enu[1] - yth) ** 2
    return vcore * jnp.exp(-r2 / (rlift * rlift))


def _thermal(cfg: WindConfig, p_enu: jax.Array) -> jax.Array:
    w = _thermal_updraft(p_enu, cfg.xth, cfg.yth, cfg.vcore, cfg.rlift)
    zero = jnp.zeros((), dtype=p_enu.dtype)
    return jnp.stack([zero, zero, w])


def _dual_thermal(cfg: WindConfig, p_enu: jax.Array) -> jax.Array:
    """Source + sink pair (ref sketch src/problem.cpp:700-704)."""
    w = _thermal_updraft(p_enu, cfg.xth, cfg.yth, cfg.vcore, cfg.rlift)
    w = w + _thermal_updraft(p_enu, cfg.xth2, cfg.yth2, cfg.vcore2, cfg.rlift2)
    zero = jnp.zeros((), dtype=p_enu.dtype)
    return jnp.stack([zero, zero, w])


def _cyclic(cfg: WindConfig, p_enu: jax.Array) -> jax.Array:
    """Horizontal vortex about (xth, yth) (ref sketch src/problem.cpp:711-719)."""
    dx = p_enu[0] - cfg.xth
    dy = p_enu[1] - cfg.yth
    r = jnp.sqrt(dx * dx + dy * dy)
    safe_r = jnp.where(r > 0, r, 1.0)
    wx = jnp.where(r > 0, -cfg.vcore * dy / safe_r, 0.0)
    wy = jnp.where(r > 0, cfg.vcore * dx / safe_r, 0.0)
    zero = jnp.zeros((), dtype=p_enu.dtype)
    return jnp.stack([wx, wy, zero])


def _axis_weights(grid: WindGrid, p_enu: jax.Array, order: int):
    """Stencil base index + per-axis weights for the gridded field.

    ``order=1``: trilinear — the reference's 8-node hexahedron shape
    functions N1..N8 (src/problem.cpp:617-635), C0 across cell faces.
    ``order=2``: uniform quadratic B-spline — 27-node stencil, C1
    everywhere, with *linear precision* (any field that is globally
    linear — e.g. the model-1 boundary layer sampled on a grid — is
    reproduced exactly, like trilinear).  C1 matters for optimization:
    trilinear wind kinks at cell faces leave the storm NLP without
    pointwise stationarity when the optimal orbit crosses cells (f64
    KKT stalls at ~1e+1 measured), while the spline field restores the
    certificate.  Positions clamp to the grid interior so queries
    outside the cache extrapolate from the edge cells (the reference
    would read out of bounds there, src/problem.cpp:556-572).

    Returns (base node index per axis (3,) int32, per-axis weight
    stacks [3 x (k,)], stencil width k).
    """
    rel = (p_enu - grid.origin) / grid.spacing
    nx, ny, nz = grid.u.shape
    shape = jnp.array((nx, ny, nz))
    if order == 1:
        idx = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, shape - 2)
        frac = rel - idx.astype(rel.dtype)
        w_ax = [jnp.stack([1.0 - frac[a], frac[a]]) for a in range(3)]
        return idx, w_ax, 2
    if order == 2:
        jc = jnp.clip(jnp.round(rel).astype(jnp.int32), 1, shape - 2)
        f = rel - jc.astype(rel.dtype)
        w_ax = [jnp.stack([0.5 * (0.5 - f[a]) ** 2,
                           0.75 - f[a] ** 2,
                           0.5 * (0.5 + f[a]) ** 2]) for a in range(3)]
        return jc - 1, w_ax, 3
    raise ValueError(f"unsupported interpolation order {order}")


def _cell_weights(grid: WindGrid, p_enu: jax.Array, order: int):
    """Flat stencil addressing for the gather/onehot paths: collapse the
    per-axis weights of :func:`_axis_weights` into the x-major k^3
    tensor-product weight vector and flat stencil offsets."""
    base_idx, w_ax, k = _axis_weights(grid, p_enu, order)
    nx, ny, nz = grid.u.shape
    wgt = (w_ax[0][:, None, None] * w_ax[1][None, :, None]
           * w_ax[2][None, None, :]).reshape(k ** 3)           # x-major
    base = (base_idx[0] * ny + base_idx[1]) * nz + base_idx[2]
    offs = [(dx * ny + dy) * nz + dz
            for dx in range(k) for dy in range(k) for dz in range(k)]
    return base, wgt, offs


def _grid_interp_separable(grid: WindGrid, p_enu: jax.Array,
                           order: int) -> jax.Array:
    """Gridded-field interpolation by axis-separated contraction.

    The tensor-product structure of the stencil means the k^3-point
    interpolation factors into three rank-1 contractions: scatter the k
    per-axis weights into a DENSE length-n_axis vector (k compares
    against iota — no gather), then contract the (3, nx, ny, nz) field
    tensor one spatial axis at a time.  Per query this costs
    O(nx*ny*nz) broadcast multiply-reduce on the VPU instead of the
    onehot path's O(ncells * 3k^3) matmul row or the gather path's k^3
    dynamic gather — at the bench's 8x8x6 storm grid that is ~80x
    fewer FLOPs than onehot, and it is the measured-fastest lowering
    for the batched (lane x node) query shapes the solver emits.
    Derivatives flow through the weights exactly as in the other
    lowerings (the iota comparison is piecewise constant).
    """
    base_idx, w_ax, k = _axis_weights(grid, p_enu, order)
    nx, ny, nz = grid.u.shape
    dt = w_ax[0].dtype
    s = []
    for a, n_ax in enumerate((nx, ny, nz)):
        iota = jnp.arange(n_ax, dtype=jnp.int32)
        sel = (iota[None, :]
               == (base_idx[a] + jnp.arange(k, dtype=jnp.int32))[:, None])
        # dense axis weights via masked sum (exact — no matmul rounding)
        s.append((w_ax[a][:, None] * sel.astype(dt)).sum(0))
    # Contract (y, z) in ONE matvec against the field reshaped
    # (3*nx, ny*nz) — under vmap this is a single (Q, ny*nz) x
    # (ny*nz, 3*nx) MXU matmul — then reduce the x axis elementwise.
    # (A per-axis tensordot chain was measured 5x SLOWER on TPU: three
    # tiny batched contractions are latency-bound, one matmul is not.)
    # HIGHEST: the default bf16 matmul pass rounds the field values and
    # amplifies through extrapolative (|w|>1) edge weights — measured
    # 0.7% wind errors vs f64 truth.
    s_yz = (s[1][:, None] * s[2][None, :]).reshape(ny * nz)
    F = jnp.stack([grid.u, grid.v, grid.w]).astype(dt)
    t1 = jnp.matmul(F.reshape(3 * nx, ny * nz), s_yz,
                    precision=jax.lax.Precision.HIGHEST)
    uvw = (t1.reshape(3, nx) * s[0][None, :]).sum(axis=1)
    return uvw * grid.live.astype(uvw.dtype)


def _grid_interp_onehot(grid: WindGrid, p_enu: jax.Array,
                        order: int) -> jax.Array:
    """Gridded-field interpolation as a one-hot contraction (MXU path).

    Same math as :func:`_grid_interp_gather`, but the stencil gather is
    replaced by ``onehot(cell) @ corner_table``: the per-cell stencil
    values (8 or 27 corners x 3 components) are pre-shifted into one
    ``(ncells, 3*k^3)`` table — a loop-invariant XLA hoists out of the
    solver while-loop — and each query contracts a one-hot cell vector
    against it.  On TPU the batched contraction runs on the MXU and is
    ~3x cheaper per constraint evaluation than the gather lowering for
    bench-scale grids; the derivative w.r.t. position flows through the
    weights exactly as in the gather form (the one-hot is piecewise
    constant).
    """
    nx, ny, nz = grid.u.shape
    n = nx * ny * nz
    base, wgt, offs = _cell_weights(grid, p_enu, order)
    flat = jnp.stack([grid.u.reshape(-1), grid.v.reshape(-1),
                      grid.w.reshape(-1)])                     # (3, n)
    flatp = jnp.pad(flat, ((0, 0), (0, offs[-1])))
    table = jnp.stack([jax.lax.dynamic_slice_in_dim(flatp, o, n, axis=1)
                       for o in offs])                         # (k^3, 3, n)
    onehot = (jnp.arange(n, dtype=jnp.int32) == base).astype(wgt.dtype)
    corners = jnp.einsum("ocn,n->co", table.astype(wgt.dtype), onehot,
                         precision=jax.lax.Precision.HIGHEST)  # (3, k^3)
    uvw = jnp.matmul(corners, wgt, precision=jax.lax.Precision.HIGHEST)
    return uvw * grid.live.astype(uvw.dtype)


def _grid_interp_gather(grid: WindGrid, p_enu: jax.Array,
                        order: int) -> jax.Array:
    """Gridded-field interpolation via ONE fused stencil gather.

    Flatten the fields, address the stencil cube by flat offsets, and
    contract with the tensor-product weights — instead of 24 (or 81)
    scalar gathers (the scalar-gather form made wind-model-3 solves ~10x
    slower per iteration than model 1; measured r04).
    """
    base, wgt, offs = _cell_weights(grid, p_enu, order)
    flat = jnp.stack([grid.u.reshape(-1), grid.v.reshape(-1),
                      grid.w.reshape(-1)])                     # (3, N)
    corners = flat[:, base + jnp.asarray(offs, jnp.int32)]     # (3, k^3)
    # HIGHEST: the TPU default bf16 matmul pass rounds the corner values
    # (~0.4% relative) — measured 8.5e-3 m/s wind errors at bench fields.
    uvw = jnp.matmul(corners, wgt, precision=jax.lax.Precision.HIGHEST)
    return uvw * grid.live.astype(uvw.dtype)


def wind_enu(cfg: WindConfig, p_enu: jax.Array) -> jax.Array:
    """ENU wind (u east, v north, w up) at a field-ENU position.

    ``cfg.model`` must be a static Python int (it selects code, mirroring the
    ``switch (Pwindmodel)`` at src/problem.cpp:477).
    """
    model = int(cfg.model)
    if model == 0:
        return _zero_wind(cfg, p_enu)
    if model == 1:
        return _boundary_layer(cfg, p_enu)
    if model == 2:
        return _thermal(cfg, p_enu)
    if model == 3:
        if cfg.grid is None:
            raise ValueError("wind model 3 requires a WindGrid")
        ncells = int(cfg.grid.u.shape[0] * cfg.grid.u.shape[1]
                     * cfg.grid.u.shape[2])
        if (cfg.interp == "separable"
                or (cfg.interp == "auto" and ncells <= 65536)):
            return _grid_interp_separable(cfg.grid, p_enu, cfg.order)
        if cfg.interp == "onehot":
            return _grid_interp_onehot(cfg.grid, p_enu, cfg.order)
        return _grid_interp_gather(cfg.grid, p_enu, cfg.order)
    if model == 4:
        return _dual_thermal(cfg, p_enu)
    if model == 5:
        return _cyclic(cfg, p_enu)
    raise ValueError(f"unknown wind model {model}")


def wind_ned(cfg: WindConfig, p_ned: jax.Array) -> jax.Array:
    """NED wind at an aircraft-local NED position.

    Swizzle (Wx, Wy, Wz) = (v, u, -w), mirroring src/problem.cpp:970-972.
    Fully differentiable in ``p_ned``.
    """
    w_enu = wind_enu(cfg, _local_ned_to_field_enu(cfg, p_ned))
    return jnp.stack([w_enu[1], w_enu[0], -w_enu[2]])


def wind_with_gradient_ned(cfg: WindConfig, p_ned: jax.Array):
    """Wind vector and 3x3 spatial gradient in NED.

    ``grad[i, j] = dW_i/dp_j`` — equivalent to the reference's swizzled
    gradient table (src/problem.cpp:973-981) but computed by forward-mode AD
    through the (differentiable) field model.
    """
    w = wind_ned(cfg, p_ned)
    grad = jax.jacfwd(lambda p: wind_ned(cfg, p))(p_ned)
    return w, grad
