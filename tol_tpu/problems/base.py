"""Declarative collocation-NLP specification.

The reference expresses each mission as a C++ subclass of ``problem``
(include/problem.h:16-47) whose methods mutate shared state.  Here a mission
is a pytree-of-closures ``CollocationNLP`` over pure functions:

    minimize    sum_i node_cost(z_i, dt) + global_cost(z_0, z_T, dt)
    subject to  defect(z_i, z_{i+1}, dt) = 0          i = 0..T-1
                boundary(z_0, z_T, dt)  (=0 | <=0)    per-row kind
                z_lo <= z_i <= z_up,  dt_lo <= dt <= dt_hi

with ``z_i`` the 11 per-node decision variables.  The structure (defects
couple only neighbouring nodes plus the global ``dt``; boundary rows couple
only the first/last node) is what the solver's block factorization exploits
— it is the same block-bidiagonal-in-time Jacobian sparsity the reference
detects numerically with its O(neF*n) ``countG`` sweep
(src/problem.cpp:813-919); here it is known by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.config import Goal, ProblemConfig
from tol_tpu.models.dynamics import (
    NUM_STATES,
    NUM_VARS,
    state_derivatives,
)
from tol_tpu.models.wind import WindConfig, wind_with_gradient_ned
from tol_tpu.problems import g7 as _g7
from tol_tpu.problems import s10 as _s10


@dataclasses.dataclass(frozen=True)
class CollocationNLP:
    """One mission NLP family; all callables are pure and jit/vmap friendly."""

    mission: str
    T: int                               # collocation segments (ts)
    nb: int                              # boundary rows
    boundary_is_ineq: np.ndarray         # (nb,) bool, True = row <= 0
    z_lo: jax.Array                      # (T+1, 11)
    z_up: jax.Array
    dt_lo: jax.Array
    dt_hi: jax.Array
    seed: Callable[[], Tuple[jax.Array, jax.Array]]
    node_cost: Callable[[jax.Array, jax.Array], jax.Array]
    global_cost: Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
    defect: Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
    boundary: Callable[[jax.Array, jax.Array, jax.Array], jax.Array]

    # ---- whole-trajectory conveniences (vmapped over nodes) ----

    def total_cost(self, Z: jax.Array, dt: jax.Array) -> jax.Array:
        node = jax.vmap(self.node_cost, in_axes=(0, None))(Z, dt)
        return jnp.sum(node) + self.global_cost(Z[0], Z[-1], dt)

    def all_defects(self, Z: jax.Array, dt: jax.Array) -> jax.Array:
        """(T, 8) forward-Euler defect residuals (src/problem.cpp:1012-1019)."""
        return jax.vmap(self.defect, in_axes=(0, 0, None))(Z[:-1], Z[1:], dt)

    def constraints(self, Z: jax.Array, dt: jax.Array) -> jax.Array:
        """All rows stacked: (T*8 + nb,) — reference F[1:] ordering."""
        d = self.all_defects(Z, dt).reshape(-1)
        b = self.boundary(Z[0], Z[-1], dt)
        return jnp.concatenate([d, b])


def _node_bounds(cfg: ProblemConfig, dtype) -> Tuple[jax.Array, jax.Array]:
    """Variable boxes per node (``problem::setLimits``, src/problem.cpp:198-285).

    Node 0 uses the hardcoded wide mission boxes with position pinned to the
    leg origin (src/problem.cpp:254-268 — the tighter stitching path there is
    commented out); nodes >= 1 use aircraft/limit boxes with free winding
    course (src/problem.cpp:272-285).  Note dCL's bound reuses ``phidotmax``
    exactly as the reference does (src/problem.cpp:283).
    """
    ac, lm, bx = cfg.aircraft, cfg.limits, cfg.boxes
    lo0 = [0.0, 0.0, 0.0, bx.Va1, bx.gamma1, bx.chi1, bx.phi1, bx.CL1,
           bx.phidot1, bx.CLdot1, 0.0]
    up0 = [0.0, 0.0, 0.0, bx.Va2, bx.gamma2, bx.chi2, bx.phi2, bx.CL2,
           bx.phidot2, bx.CLdot2, 1e20]
    lo = [lm.xmin, lm.ymin, lm.zmin, ac.Vamin, -ac.gammamax, -1e20,
          -ac.phimax, ac.CLmin, -ac.phidotmax, -ac.phidotmax, ac.Tmin]
    up = [lm.xmax, lm.ymax, lm.zmax, ac.Vamax, ac.gammamax, 1e20,
          ac.phimax, ac.CLmax, ac.phidotmax, ac.phidotmax, ac.Tmax]
    T = cfg.dims.ts
    z_lo = jnp.concatenate([
        jnp.asarray(lo0, dtype=dtype)[None, :],
        jnp.tile(jnp.asarray(lo, dtype=dtype)[None, :], (T, 1)),
    ])
    z_up = jnp.concatenate([
        jnp.asarray(up0, dtype=dtype)[None, :],
        jnp.tile(jnp.asarray(up, dtype=dtype)[None, :], (T, 1)),
    ])
    return z_lo, z_up


def build_nlp(
    cfg: ProblemConfig,
    goal: Goal,
    wind: WindConfig,
    dtype=jnp.float64,
) -> CollocationNLP:
    """Assemble the mission NLP (ctor equivalents src/problemG7.cpp:9-13,
    src/problemS10.cpp:9-13, over the base ctor src/problem.cpp:13-192)."""

    if cfg.mission == "G7":
        mod = _g7
    elif cfg.mission == "S10":
        mod = _s10
    else:
        raise ValueError(f'Problem "{cfg.mission}" not recognized.')

    ac = cfg.aircraft
    freeze_wind = cfg.jacobian_mode == "reference"

    def defect(z_i, z_ip1, dt):
        """Forward-Euler defect rows (src/problem.cpp:1012-1019).

        In "reference" Jacobian mode the wind sample is frozen w.r.t.
        position (stop_gradient), reproducing the hand-derived ``tabG``
        tables which carry no wind-induced position columns
        (src/problem.cpp:1080-1186); residual values are unaffected.
        """
        p = z_i[0:3]
        if freeze_wind:
            p = jax.lax.stop_gradient(p)
        w, gw = wind_with_gradient_ned(wind, p)
        zdot = state_derivatives(z_i, w, gw, ac)
        return z_ip1[:NUM_STATES] - zdot * dt - z_i[:NUM_STATES]

    z_lo, z_up = _node_bounds(cfg, dtype)
    node_cost, global_cost, boundary, is_ineq, seed = mod.make(cfg, goal, dtype)

    nb = int(cfg.dims.numbounds)
    assert is_ineq.shape == (nb,), (is_ineq.shape, nb)

    return CollocationNLP(
        mission=cfg.mission,
        T=int(cfg.dims.ts),
        nb=nb,
        boundary_is_ineq=is_ineq,
        z_lo=z_lo,
        z_up=z_up,
        dt_lo=jnp.asarray(cfg.limits.dtmin, dtype=dtype),
        dt_hi=jnp.asarray(cfg.limits.dtmax, dtype=dtype),
        seed=seed,
        node_cost=node_cost,
        global_cost=global_cost,
        defect=defect,
        boundary=boundary,
    )
