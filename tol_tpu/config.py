"""Typed configuration pytrees.

The reference scatters configuration across four ``.param`` readers
(``include/parameters.h:22-74``, ``src/parameters.cpp:42-148``), hardcoded
per-mission initial-state boxes (``src/problem.cpp:80-134``) and inline
constants.  Here everything lives in one typed config tree so it can be
vmapped / swept (e.g. a batched multi-airframe Monte-Carlo treats
``AircraftParams`` leaves as batch axes).

All angles are radians (the readers convert, mirroring
``src/parameters.cpp:56-60``).  All quantities are floats so the pytrees can
be traced, batched and sharded.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

# Physical constants (ref: include/problem.h:72-73)
GRAVITY = 9.81
RHO = 1.2682

# "Infinity" as used by SNOPT-era bound conventions (ref: src/problem.cpp:279)
INF_BOUND = 1e20


class AircraftParams(NamedTuple):
    """Airframe parameters (ref: ``aircraft/*.param``, src/parameters.cpp:42-69).

    Fields in file order; ``phimax/gammamax/phidotmax`` stored in radians.
    """

    mm: float        # mass (kg)
    b: float         # wing span (m)
    SS: float        # wing area (m^2)
    ee: float        # Oswald efficiency factor
    AR: float        # aspect ratio
    Cd0: float       # parasitic drag coefficient
    CLmin: float
    CLmax: float
    phimax: float    # max bank angle (rad)
    Vamin: float     # min airspeed (m/s)
    Vamax: float     # max airspeed (m/s)
    gammamax: float  # max climb angle (rad)
    phidotmax: float # max roll rate (rad/s)
    Tmin: float      # min thrust (N)
    Tmax: float      # max thrust (N)


class Gains(NamedTuple):
    """Cost-function gains (ref: ``problems/*/gains.param``, src/parameters.cpp:77-94)."""

    kT: float
    kp: float
    kv: float
    ka: float
    kdt: float


class Limits(NamedTuple):
    """Trajectory box limits (ref: ``problems/*/limits.param``, src/parameters.cpp:102-122)."""

    dtmin: float
    dtmax: float
    xmin: float
    xmax: float
    ymin: float
    ymax: float
    zmin: float
    zmax: float


class SolverDims(NamedTuple):
    """NLP sizing + tolerances (ref: ``problems/*/snopt.param``, src/parameters.cpp:130-148)."""

    ts: int          # number of time segments (collocation intervals)
    numinp: int      # decision variables per node (11)
    numstates: int   # dynamic states per node (8)
    numbounds: int   # boundary-constraint rows (11 S10 / 12 G7)
    opt_tol: float
    feas_tol: float


class MissionBoxes(NamedTuple):
    """Hardcoded per-mission node-0 state boxes (ref: src/problem.cpp:80-134).

    These are the *active* node-0 bounds in the reference (the stitching-slack
    path at src/problem.cpp:238-252 is commented out there; see
    ``stitch`` below for the fixed version).
    """

    Va1: float
    Va2: float
    gamma1: float
    gamma2: float
    chi1: float
    chi2: float
    phi1: float
    phi2: float
    CL1: float
    CL2: float
    phidot1: float
    phidot2: float
    CLdot1: float
    CLdot2: float


# Per-mission boxes, numerically identical to the reference ctor blocks.
S10_BOXES = MissionBoxes(
    Va1=4.0, Va2=50.0,
    gamma1=0.0, gamma2=0.0,
    chi1=-1.7453292519943296e18, chi2=1.7453292519943296e18,
    phi1=-1.5707963267948966, phi2=1.5707963267948966,
    CL1=-0.5, CL2=3.0,
    phidot1=-3.4906585039886591, phidot2=3.4906585039886591,
    CLdot1=-200.0, CLdot2=200.0,
)

G7_BOXES = MissionBoxes(
    Va1=4.0, Va2=50.0,
    gamma1=0.0, gamma2=0.0,
    chi1=-INF_BOUND * jnp.pi / 180.0, chi2=INF_BOUND * jnp.pi / 180.0,
    phi1=-jnp.pi / 2.0, phi2=jnp.pi / 2.0,
    CL1=-0.5, CL2=3.0,
    phidot1=-3.4906585039886591, phidot2=3.4906585039886591,
    CLdot1=-200.0, CLdot2=200.0,
)


class Goal(NamedTuple):
    """Mission goal in NED coordinates (ref: src/problem.cpp:23-27 converts
    the ENU CLI arguments: ``xg=north_goal, yg=east_goal, zg=-up_goal``)."""

    xg: float
    yg: float
    zg: float
    rg: float


class StitchState(NamedTuple):
    """Previous-leg terminal state used to warm-start / bound the next leg
    (ref: src/arguments.cpp:9-25 python tuple; src/problem.cpp:33-49 slacks).
    """

    Va: float
    gam: float
    chi: float
    phi: float
    CL: float
    dphi: float
    dCL: float
    T: float


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Full static description of one mission NLP instance family.

    ``mission`` selects G7/S10 behaviour; everything numeric is a pytree leaf
    that may carry batch dimensions.
    """

    mission: str                  # "G7" | "S10"
    aircraft: AircraftParams
    gains: Gains
    limits: Limits
    dims: SolverDims
    boxes: MissionBoxes
    wind_model: int = 1           # ref Pwindmodel (src/problem.cpp:477)
    # Jacobian mode: "exact" (default) differentiates through the wind
    # field — every derivative this framework produces is consistent with
    # the residuals.  "reference" freezes wind w.r.t. position in the
    # linearization, matching the reference's hand-derived tabG which omits
    # all wind-induced position columns (src/problem.cpp:1080-1186); note
    # that inconsistent gradients break line-search solvers (they did not
    # break SNOPT only because SNOPT treats them as a quasi-Newton model),
    # so "reference" is for Jacobian-structure parity studies, not solving.
    jacobian_mode: str = "exact"
