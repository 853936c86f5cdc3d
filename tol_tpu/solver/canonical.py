"""Canonical NLP form for the solvers.

Transforms a :class:`tol_tpu.problems.base.CollocationNLP` into

    minimize   f(v, inst)
    subject to c(v, inst) = 0,       lb(inst) <= v <= ub(inst)

with decision vector ``v = [dt, Z.flat, s]`` (reference SNOPT ordering
``x[0]=dt`` + node-major blocks, src/problem.cpp:151, plus one slack per
inequality boundary row).  Inequality rows ``b_k(v) <= 0`` (G7's
``dist - dmax``, src/problem.cpp:345-350) become ``b_k(v) + s_k = 0`` with
``s_k >= 0``.

Fixed variables (``lb == ub``: node-0 position and flight-path angle,
src/problem.cpp:256-260) are detected dynamically and pinned by the solver.

All callables take the per-scenario :class:`Instance` pytree, so batched
solves are ``jax.vmap`` over stacked instances / initial points.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS
from tol_tpu.problems.base import CollocationNLP, Instance


class Scaling(NamedTuple):
    """Diagonal nondimensionalization of the NLP.

    The solver works on ``u = v / d`` with constraint rows divided by
    ``r``; physically the decision variables span four orders of magnitude
    (positions in meters ~1e2, angles/rates ~3e-1, thrust ~1e1, dt ~2e-1),
    so the unscaled Lagrangian Hessian has eigenvalue spread ~1e8: the
    energy-management direction (altitude/thrust trade) has curvature
    ~1e-4 in meters and any uniform regularization shift freezes it —
    observed as an ~800-iteration creep.  In scaled units the spread
    collapses and the same shift is harmless; float32 also gains uniform
    headroom (the SNOPT reference relies on SNOPT's internal row/column
    scaling for exactly this).
    """

    d_z: jax.Array    # (11,) per-kind variable scales
    d_dt: jax.Array   # scalar dt scale
    r_b: jax.Array    # (nb,) boundary row scales
    # Objective scale: the solver minimizes s_f * f.  Without it a
    # thrust-quadratic cost like G7's (kT=100, |grad f| ~ 2e3 in scaled
    # variables) needs multipliers ~1e6 that first-order AL updates reach
    # only after thousands of outer rounds — observed as convergence to a
    # locally-infeasible glide with the penalty never winning.  SNOPT
    # applies objective row scaling for exactly this reason.  1.0 when the
    # seed gradient is already O(1) (e.g. S10).
    s_f: jax.Array = None  # type: ignore[assignment]


def default_scaling(nlp: CollocationNLP, dtype=None) -> Scaling:
    """Physics-derived scales from the default instance (concrete values)."""
    inst = nlp.inst0
    dtype = dtype or inst.z_lo.dtype
    ac = inst.aircraft
    pos = jnp.maximum(jnp.asarray(inst.goal.rg, dtype), 100.0)
    d_z = jnp.stack([
        pos, pos, pos,
        jnp.asarray(ac.Vamax, dtype) / 2.0,
        jnp.asarray(ac.gammamax, dtype),
        jnp.asarray(3.0, dtype),                    # course chi ~ pi
        jnp.asarray(ac.phimax, dtype),
        jnp.maximum(jnp.abs(jnp.asarray(ac.CLmax, dtype)), 0.5),
        jnp.asarray(ac.phidotmax, dtype),
        jnp.asarray(ac.phidotmax, dtype),           # dCL bound reuses phidotmax
        jnp.maximum(jnp.asarray(ac.Tmax, dtype) / 4.0, 1.0),
    ]).astype(dtype)
    d_dt = (0.5 * (jnp.asarray(inst.dt_lo, dtype) + jnp.asarray(inst.dt_hi, dtype)))
    # Boundary rows: norm of the scaled Jacobian row at the seed point
    # (row units vary per mission: meters for position/periodicity rows,
    # radians for angle rows, meters for G7's dist row).  The norms are
    # evaluated at a deterministically PERTURBED seed: at the exact seed a
    # row can be directionally degenerate — e.g. G7's y-displacement row
    # zT[1]-z0[1]-dist*sin(chi_d) has zero gradient when the seed path is
    # exactly along the desired course — and a near-zero norm here would
    # amplify that row ~100x (the clip floor), pushing its float32
    # evaluation noise above the feasibility tolerance (measured: G7 ts=100
    # f32 infeasibility floor ~4e-4 with the degenerate scale, fixed by
    # the perturbation).
    Z0, dt0 = nlp.seed_fn(inst)
    key = jax.random.PRNGKey(0)
    k0, kT, kdt = jax.random.split(key, 3)
    z0p = Z0[0] + 0.1 * d_z * jax.random.normal(k0, (d_z.shape[0],), dtype)
    zTp = Z0[-1] + 0.1 * d_z * jax.random.normal(kT, (d_z.shape[0],), dtype)
    dtp = dt0 * (1.0 + 0.05 * jax.random.normal(kdt, (), dtype))
    G0, GT, Gdt = jax.jacfwd(nlp.boundary_fn, argnums=(0, 1, 2))(
        z0p, zTp, dtp, inst)
    row = jnp.sqrt((G0 * d_z[None, :]) ** 2 @ jnp.ones(d_z.shape[0], dtype)
                   + (GT * d_z[None, :]) ** 2 @ jnp.ones(d_z.shape[0], dtype)
                   + (Gdt * d_dt) ** 2)
    r_b = jnp.clip(row, 1e-2, 1e6).astype(dtype)
    # Objective scale from the seed gradient in scaled variables
    # (chain rule: grad_u f = d * grad_v f).
    gZ, gdt = jax.grad(nlp.total_cost, argnums=(0, 1))(Z0, dt0, inst)
    g_inf = jnp.maximum(jnp.max(jnp.abs(gZ * d_z[None, :])),
                        jnp.abs(gdt * d_dt))
    s_f = 1.0 / jnp.clip(g_inf, 1.0, 1e12)
    return Scaling(d_z=d_z, d_dt=d_dt.astype(dtype), r_b=r_b,
                   s_f=s_f.astype(dtype))


def unit_scaling(nlp: CollocationNLP, dtype=None) -> Scaling:
    dtype = dtype or nlp.inst0.z_lo.dtype
    return Scaling(d_z=jnp.ones(NUM_VARS, dtype),
                   d_dt=jnp.ones((), dtype),
                   r_b=jnp.ones(nlp.nb, dtype),
                   s_f=jnp.ones((), dtype))


@dataclasses.dataclass(frozen=True)
class CanonicalNLP:
    nlp: CollocationNLP
    n: int                       # total variables (1 + (T+1)*11 + n_slack)
    m: int                       # equality rows (8*T + nb)
    n_slack: int
    f: Callable[[jax.Array, Instance], jax.Array]
    c: Callable[[jax.Array, Instance], jax.Array]
    bounds: Callable[[Instance], tuple]
    scaling: Scaling | None = None
    nlp_phys: CollocationNLP | None = None   # pre-scaling original

    def split(self, v: jax.Array):
        """v -> (Z, dt, s)."""
        T = self.nlp.T
        dt = v[0]
        Z = v[1:1 + (T + 1) * NUM_VARS].reshape(T + 1, NUM_VARS)
        s = v[1 + (T + 1) * NUM_VARS:]
        return Z, dt, s

    def join(self, Z: jax.Array, dt: jax.Array, s: jax.Array) -> jax.Array:
        return jnp.concatenate([jnp.reshape(dt, (1,)), Z.reshape(-1), s])

    def initial_point(self, inst: Instance | None = None) -> jax.Array:
        """Seed trajectory + interior slack initialization."""
        inst = self.nlp._inst(inst)
        Z, dt = self.nlp.seed_fn(inst)
        b = self.nlp.boundary(Z[0], Z[-1], dt, inst)
        ineq = np.flatnonzero(self.nlp.boundary_is_ineq)
        if self.n_slack:
            s = jnp.maximum(-b[jnp.asarray(ineq)], 1e-2)
        else:
            s = jnp.zeros((0,), dtype=Z.dtype)
        return self.join(Z, dt, s)

    def v_scale(self) -> jax.Array:
        """Per-entry scale of the full decision vector (1s when unscaled)."""
        T = self.nlp.T
        if self.scaling is None:
            n = 1 + (T + 1) * NUM_VARS + self.n_slack
            return jnp.ones(n, self.nlp.inst0.z_lo.dtype)
        sc = self.scaling
        ineq = np.flatnonzero(self.nlp.boundary_is_ineq)
        d_s = sc.r_b[jnp.asarray(ineq, dtype=jnp.int32)] if self.n_slack else \
            jnp.zeros((0,), sc.d_z.dtype)
        return jnp.concatenate([
            jnp.reshape(sc.d_dt, (1,)),
            jnp.tile(sc.d_z, T + 1),
            d_s,
        ])

    def to_physical(self, v: jax.Array) -> jax.Array:
        """Scaled solver iterate -> physical units (identity if unscaled)."""
        return v * self.v_scale() if self.scaling is not None else v

    def from_physical(self, v: jax.Array) -> jax.Array:
        return v / self.v_scale() if self.scaling is not None else v


def _scale_nlp(nlp: CollocationNLP, sc: Scaling) -> CollocationNLP:
    """Scaled twin of ``nlp``: functions take/return nondimensional values.

    Instances stay physical; only the decision variables and constraint
    rows are transformed (v = d * u, rows / r).  The block structure is
    preserved exactly (diagonal, per-variable-kind), so the structured KKT
    backends apply unchanged.
    """
    d_z, d_dt = sc.d_z, sc.d_dt
    r_d = sc.d_z[:NUM_STATES]        # defect row i has units of state i
    r_b = sc.r_b
    s_f = sc.s_f if sc.s_f is not None else 1.0

    raw_node, raw_glob = nlp.node_cost_fn, nlp.global_cost_fn
    raw_defect, raw_boundary, raw_seed = nlp.defect_fn, nlp.boundary_fn, nlp.seed_fn

    def node_cost(z, dt, inst):
        return s_f * raw_node(d_z * z, d_dt * dt, inst)

    def global_cost(z0, zT, dt, inst):
        return s_f * raw_glob(d_z * z0, d_z * zT, d_dt * dt, inst)

    def defect(z_i, z_ip1, dt, inst):
        return raw_defect(d_z * z_i, d_z * z_ip1, d_dt * dt, inst) / r_d

    def boundary(z0, zT, dt, inst):
        return raw_boundary(d_z * z0, d_z * zT, d_dt * dt, inst) / r_b

    def seed(inst):
        Z, dt = raw_seed(inst)
        return Z / d_z[None, :], dt / d_dt

    return dataclasses.replace(
        nlp, node_cost_fn=node_cost, global_cost_fn=global_cost,
        defect_fn=defect, boundary_fn=boundary, seed_fn=seed)


def canonicalize(
    nlp: CollocationNLP,
    scaling: Scaling | str | None = None,
) -> CanonicalNLP:
    """Canonical form; ``scaling="auto"`` nondimensionalizes (recommended —
    the solvers then see O(1) variables/rows; map iterates back with
    ``can.to_physical``)."""
    if isinstance(scaling, str):
        if scaling != "auto":
            raise ValueError(f"unknown scaling mode {scaling!r}")
        scaling = default_scaling(nlp)
    nlp_phys = nlp if scaling is not None else None
    if scaling is not None:
        nlp = _scale_nlp(nlp, scaling)

    T = nlp.T
    dtype = nlp.inst0.z_lo.dtype
    ineq_idx = np.flatnonzero(nlp.boundary_is_ineq)
    n_slack = len(ineq_idx)
    n = 1 + (T + 1) * NUM_VARS + n_slack
    m = NUM_STATES * T + nlp.nb

    slack_scatter_np = np.zeros((nlp.nb, n_slack))
    for j, r in enumerate(ineq_idx):
        slack_scatter_np[r, j] = 1.0

    def split(v):
        dt = v[0]
        Z = v[1:1 + (T + 1) * NUM_VARS].reshape(T + 1, NUM_VARS)
        s = v[1 + (T + 1) * NUM_VARS:]
        return Z, dt, s

    def f(v, inst):
        Z, dt, _ = split(v)
        return nlp.total_cost(Z, dt, inst)

    def c(v, inst):
        Z, dt, s = split(v)
        d = nlp.all_defects(Z, dt, inst).reshape(-1)
        b = nlp.boundary(Z[0], Z[-1], dt, inst)
        if n_slack:
            b = b + jnp.asarray(slack_scatter_np, dtype=v.dtype) @ s
        return jnp.concatenate([d, b])

    if scaling is None:
        def bounds(inst):
            lb = jnp.concatenate([
                jnp.reshape(inst.dt_lo, (1,)), inst.z_lo.reshape(-1),
                jnp.zeros(n_slack, dtype=dtype),
            ])
            ub = jnp.concatenate([
                jnp.reshape(inst.dt_hi, (1,)), inst.z_up.reshape(-1),
                jnp.full((n_slack,), 1e20, dtype=dtype),
            ])
            return lb, ub, lb == ub
    else:
        sc = scaling
        d_s = (sc.r_b[jnp.asarray(ineq_idx, dtype=jnp.int32)]
               if n_slack else jnp.zeros((0,), dtype))

        def bounds(inst):
            # Infinite bounds must stay infinite after scaling (the solver
            # tests `> -_BIG`), so divide only finite entries.
            z_lo = jnp.where(jnp.abs(inst.z_lo) < 1e19,
                             inst.z_lo / sc.d_z[None, :], inst.z_lo)
            z_up = jnp.where(jnp.abs(inst.z_up) < 1e19,
                             inst.z_up / sc.d_z[None, :], inst.z_up)
            lb = jnp.concatenate([
                jnp.reshape(inst.dt_lo / sc.d_dt, (1,)), z_lo.reshape(-1),
                jnp.zeros(n_slack, dtype=dtype),
            ])
            ub = jnp.concatenate([
                jnp.reshape(inst.dt_hi / sc.d_dt, (1,)), z_up.reshape(-1),
                jnp.full((n_slack,), 1e20, dtype=dtype),
            ])
            return lb, ub, lb == ub

    return CanonicalNLP(
        nlp=nlp, n=n, m=m, n_slack=n_slack, f=f, c=c, bounds=bounds,
        scaling=scaling, nlp_phys=nlp_phys,
    )
