"""Declarative collocation-NLP specification.

The reference expresses each mission as a C++ subclass of ``problem``
(include/problem.h:16-47) whose methods mutate shared state.  Here a mission
is a set of pure functions over an explicit :class:`Instance` parameter
pytree:

    minimize    sum_i node_cost(z_i, dt, inst) + global_cost(z_0, z_T, dt, inst)
    subject to  defect(z_i, z_{i+1}, dt, inst) = 0        i = 0..T-1
                boundary(z_0, z_T, dt, inst)  (=0 | <=0)  per-row kind
                inst.z_lo <= z_i <= inst.z_up,  inst.dt_lo <= dt <= inst.dt_hi

Because every per-scenario quantity (airframe, gains, goal, wind, bounds)
lives in ``inst`` rather than in closures, whole solves batch with
``jax.vmap`` over stacked instances — the multi-airframe / Monte-Carlo
sweeps of BASELINE.json are one ``vmap`` (+ ``pjit`` sharding) away.

The structure (defects couple only neighbouring nodes plus the global
``dt``; boundary rows couple only the first/last node) is what the solver's
block factorization exploits — the same block-bidiagonal-in-time Jacobian
sparsity the reference detects numerically with its O(neF*n) ``countG``
sweep (src/problem.cpp:813-919); here it is known by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.config import (
    AircraftParams,
    Gains,
    Goal,
    Limits,
    MissionBoxes,
    ProblemConfig,
    StitchState,
)
from tol_tpu.models.dynamics import (
    NUM_STATES,
    NUM_VARS,
    state_derivatives,
)
from tol_tpu.models.wind import WindConfig, wind_with_gradient_ned
from tol_tpu.problems import g7 as _g7
from tol_tpu.problems import s10 as _s10


class Instance(NamedTuple):
    """Per-scenario parameters — a pytree; batch axes allowed on all leaves.

    ``wind.model`` is ignored at solve time (the wind model index selects
    code and is captured statically by :func:`build_nlp`); pass
    ``in_axes=None`` for it when vmapping, or just broadcast it.
    """

    aircraft: AircraftParams
    gains: Gains
    goal: Goal
    wind: WindConfig
    z_lo: jax.Array      # (T+1, 11) variable lower bounds
    z_up: jax.Array
    dt_lo: jax.Array     # scalars
    dt_hi: jax.Array


def node_bounds(
    boxes: MissionBoxes,
    aircraft: AircraftParams,
    limits: Limits,
    ts: int,
    start_ned=(0.0, 0.0, 0.0),
    dtype=jnp.float64,
) -> Tuple[jax.Array, jax.Array]:
    """Variable boxes per node (``problem::setLimits``, src/problem.cpp:198-285).

    Node 0 uses the hardcoded wide mission boxes with position pinned to the
    leg origin (src/problem.cpp:254-268 — the tighter stitching path there
    is commented out); nodes >= 1 use aircraft/limit boxes with free winding
    course (src/problem.cpp:272-285).  Note dCL's bound reuses ``phidotmax``
    exactly as the reference does (src/problem.cpp:283).
    """
    # Pure-numpy host-side construction: instance bounds are data prep,
    # and eager jnp ops here would each pay a device dispatch (and a
    # first-call kernel compile) on a remote TPU backend — measured ~5 s
    # on the first stitched mission leg before this was host-side.
    ac, lm, bx = aircraft, limits, boxes
    fl = lambda x: float(np.asarray(x))
    xi, yi, zi = [fl(c) for c in start_ned]
    lo0 = np.array([xi, yi, zi, fl(bx.Va1), fl(bx.gamma1), fl(bx.chi1),
                    fl(bx.phi1), fl(bx.CL1), fl(bx.phidot1), fl(bx.CLdot1),
                    0.0])
    up0 = np.array([xi, yi, zi, fl(bx.Va2), fl(bx.gamma2), fl(bx.chi2),
                    fl(bx.phi2), fl(bx.CL2), fl(bx.phidot2), fl(bx.CLdot2),
                    1e20])
    lo = np.array([fl(lm.xmin), fl(lm.ymin), fl(lm.zmin), fl(ac.Vamin),
                   -fl(ac.gammamax), -1e20, -fl(ac.phimax), fl(ac.CLmin),
                   -fl(ac.phidotmax), -fl(ac.phidotmax), fl(ac.Tmin)])
    up = np.array([fl(lm.xmax), fl(lm.ymax), fl(lm.zmax), fl(ac.Vamax),
                   fl(ac.gammamax), 1e20, fl(ac.phimax), fl(ac.CLmax),
                   fl(ac.phidotmax), fl(ac.phidotmax), fl(ac.Tmax)])
    z_lo = np.concatenate([lo0[None, :], np.tile(lo[None, :], (ts, 1))])
    z_up = np.concatenate([up0[None, :], np.tile(up[None, :], (ts, 1))])
    return jnp.asarray(z_lo, dtype), jnp.asarray(z_up, dtype)


# Stitching slacks around the previous leg's terminal state
# (src/problem.cpp:33-49): Va +-2 m/s, gamma +-10 deg, phi +-10 deg,
# CL +-0.2, T +-5 N.  The reference also pins chi / dphi / dCL exactly
# (src/problem.cpp:50-59) — but a pinned heading makes any leg whose course
# differs from the previous terminal heading (e.g. a turn-around) INFEASIBLE
# against G7's displacement rows; plausibly why the consumer of those
# bounds is commented out in the reference (src/problem.cpp:238-252).  Here
# the heading gets +-pi and the rate controls stay at their airframe boxes:
# the stitch constrains the energy states, which is what physical
# continuity needs.
_STITCH_SLACK = np.array([
    2.0,                     # Va
    np.deg2rad(10.0),        # gamma
    np.pi,                   # chi
    np.deg2rad(10.0),        # phi
    0.2,                     # CL
    1e3,                     # dphi (airframe box)
    1e3,                     # dCL (airframe box)
    5.0,                     # T
])


def apply_stitch(z_lo: jax.Array, z_up: jax.Array,
                 stitch: StitchState) -> Tuple[jax.Array, jax.Array]:
    """Tighten node-0 bounds around the previous leg's terminal state.

    The reference computes these slack boxes in the ``problem`` ctor
    whenever the python entry passes a nonzero initial airspeed
    (src/arguments.cpp:19-21 -> src/problem.cpp:33-60); position stays
    pinned to the leg origin.  The reference never actually applies them
    (the ``if (ii == 0)`` consumer is commented out, src/problem.cpp:238-252)
    — a bug this framework fixes: they REPLACE the node-0 state bounds,
    clipped into the airframe/limit boxes (the node>=1 rows) so a stitch
    state at an airframe limit cannot produce an empty box.
    """
    # Host-side numpy (see node_bounds): avoids per-op device dispatch
    # and first-call kernel compiles in the mission hot path.
    dtype = z_lo.dtype
    zl = np.array(z_lo)
    zu = np.array(z_up)
    s = np.array([float(np.asarray(v)) for v in stitch])
    lo = np.clip(s - _STITCH_SLACK, zl[1, 3:], zu[1, 3:])
    up = np.clip(s + _STITCH_SLACK, zl[1, 3:], zu[1, 3:])
    zl[0, 3:] = lo
    zu[0, 3:] = up
    return jnp.asarray(zl, dtype), jnp.asarray(zu, dtype)


@dataclasses.dataclass(frozen=True)
class CollocationNLP:
    """One mission NLP family.

    All callables are pure, take the :class:`Instance` pytree as their last
    argument, and are jit/vmap friendly.  ``inst0`` is the default instance
    built from the originating config (convenience wrappers below use it
    when no instance is passed).
    """

    mission: str
    T: int                               # collocation segments (ts)
    nb: int                              # boundary rows
    boundary_is_ineq: np.ndarray         # (nb,) bool, True = row <= 0
    inst0: Instance
    seed_fn: Callable[[Instance], Tuple[jax.Array, jax.Array]]
    node_cost_fn: Callable[..., jax.Array]
    global_cost_fn: Callable[..., jax.Array]
    defect_fn: Callable[..., jax.Array]
    boundary_fn: Callable[..., jax.Array]

    # ---- conveniences (default instance, vmapped over nodes) ----

    def _inst(self, inst):
        return self.inst0 if inst is None else inst

    def seed(self, inst=None):
        return self.seed_fn(self._inst(inst))

    def node_cost(self, z, dt, inst=None):
        return self.node_cost_fn(z, dt, self._inst(inst))

    def global_cost(self, z0, zT, dt, inst=None):
        return self.global_cost_fn(z0, zT, dt, self._inst(inst))

    def defect(self, z_i, z_ip1, dt, inst=None):
        return self.defect_fn(z_i, z_ip1, dt, self._inst(inst))

    def boundary(self, z0, zT, dt, inst=None):
        return self.boundary_fn(z0, zT, dt, self._inst(inst))

    @property
    def z_lo(self):
        return self.inst0.z_lo

    @property
    def z_up(self):
        return self.inst0.z_up

    @property
    def dt_lo(self):
        return self.inst0.dt_lo

    @property
    def dt_hi(self):
        return self.inst0.dt_hi

    def total_cost(self, Z, dt, inst=None):
        inst = self._inst(inst)
        node = jax.vmap(self.node_cost_fn, in_axes=(0, None, None))(Z, dt, inst)
        return jnp.sum(node) + self.global_cost_fn(Z[0], Z[-1], dt, inst)

    def all_defects(self, Z, dt, inst=None):
        """(T, 8) forward-Euler defect residuals (src/problem.cpp:1012-1019)."""
        inst = self._inst(inst)
        return jax.vmap(self.defect_fn, in_axes=(0, 0, None, None))(
            Z[:-1], Z[1:], dt, inst)

    def constraints(self, Z, dt, inst=None):
        """All rows stacked: (T*8 + nb,) — reference F[1:] ordering."""
        inst = self._inst(inst)
        d = self.all_defects(Z, dt, inst).reshape(-1)
        b = self.boundary(Z[0], Z[-1], dt, inst)
        return jnp.concatenate([d, b])


def make_instance(
    cfg: ProblemConfig,
    goal: Goal,
    wind: WindConfig,
    start_ned=(0.0, 0.0, 0.0),
    dtype=jnp.float64,
    stitch: StitchState | None = None,
) -> Instance:
    z_lo, z_up = node_bounds(cfg.boxes, cfg.aircraft, cfg.limits, cfg.dims.ts,
                             start_ned, dtype)
    if stitch is not None:
        z_lo, z_up = apply_stitch(z_lo, z_up, stitch)
    to = lambda x: jnp.asarray(x, dtype=dtype)
    return Instance(
        aircraft=AircraftParams(*[to(x) for x in cfg.aircraft]),
        gains=Gains(*[to(x) for x in cfg.gains]),
        goal=Goal(*[to(x) for x in goal]),
        wind=wind,
        z_lo=z_lo, z_up=z_up,
        dt_lo=to(cfg.limits.dtmin), dt_hi=to(cfg.limits.dtmax),
    )


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

    freeze_wind = cfg.jacobian_mode == "reference"
    wind_model = int(wind.model)  # static: selects code, not data

    def defect(z_i, z_ip1, dt, inst):
        """Forward-Euler defect rows (src/problem.cpp:1012-1019).

        In "reference" Jacobian mode the wind sample is frozen w.r.t.
        position (stop_gradient), reproducing the hand-derived ``tabG``
        tables which carry no wind-induced position columns
        (src/problem.cpp:1080-1186); residual values are unaffected.
        """
        p = z_i[0:3]
        if freeze_wind:
            p = jax.lax.stop_gradient(p)
        wcfg = dataclasses.replace(inst.wind, model=wind_model)
        w, gw = wind_with_gradient_ned(wcfg, p)
        zdot = state_derivatives(z_i, w, gw, inst.aircraft)
        return z_ip1[:NUM_STATES] - zdot * dt - z_i[:NUM_STATES]

    node_cost, global_cost, boundary, is_ineq, seed = mod.make(cfg, dtype)
    inst0 = make_instance(cfg, goal, wind, dtype=dtype)

    nb = int(cfg.dims.numbounds)
    assert is_ineq.shape == (nb,), (is_ineq.shape, nb)

    return CollocationNLP(
        mission=cfg.mission,
        T=int(cfg.dims.ts),
        nb=nb,
        boundary_is_ineq=is_ineq,
        inst0=inst0,
        seed_fn=seed,
        node_cost_fn=node_cost,
        global_cost_fn=global_cost,
        defect_fn=defect,
        boundary_fn=boundary,
    )
