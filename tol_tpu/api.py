"""High-level convenience API.

``make_problem`` assembles a mission NLP from the bundled assets, mirroring
what ``mission_select`` + the ``problem`` ctor do in the reference
(src/tol.cpp:5-36, src/problem.cpp:13-192).  Default goals follow the MSL
mission layer: the S10 loiter goal is 100 m north at radius 100
(msl/mission.py:136, in ENU [0,-100,0,r] => NED (-100, 0)), the G7 goal is
the first scripted waypoint (msl/msl.py:103, ENU (400,0)->NED (0,400)).
"""

from __future__ import annotations

import jax.numpy as jnp

from tol_tpu.config import (
    G7_BOXES,
    S10_BOXES,
    Goal,
    ProblemConfig,
)
from tol_tpu.io.params import (
    assets_root,
    load_aircraft,
    load_gains,
    load_limits,
    load_solver_dims,
)
from tol_tpu.models.wind import WindConfig
from tol_tpu.problems.base import CollocationNLP, build_nlp


def make_config(
    mission: str = "S10",
    aircraft: str = "tempest",
    ts: int | None = None,
    wind_model: int = 1,
    jacobian_mode: str = "exact",
    root_path: str | None = None,
    scale_dt_limits: bool = True,
) -> ProblemConfig:
    """Build a ProblemConfig from the bundled assets.

    When ``ts`` deviates from the mission's reference horizon,
    ``scale_dt_limits`` rescales the per-step dt box so the *total* time
    budget ``ts*[dtmin, dtmax]`` is preserved — otherwise e.g. a 20-segment
    S10 instance caps the loop period at 8 s, which no admissible airframe
    can fly (the full-turn boundary row chi(tf)-chi(t0)=2*pi needs
    >= 2*pi*Vamin/(g*tan(phimax)) seconds).
    """
    root = root_path or assets_root()
    dims = load_solver_dims(mission, root)
    limits = load_limits(mission, root)
    if ts is not None:
        if scale_dt_limits and ts != dims.ts:
            scale = dims.ts / ts
            limits = limits._replace(dtmin=limits.dtmin * scale,
                                     dtmax=limits.dtmax * scale)
        dims = dims._replace(ts=ts)
    return ProblemConfig(
        mission=mission,
        aircraft=load_aircraft(aircraft, root),
        gains=load_gains(mission, root),
        limits=limits,
        dims=dims,
        boxes=S10_BOXES if mission == "S10" else G7_BOXES,
        wind_model=wind_model,
        jacobian_mode=jacobian_mode,
    )


def default_goal(mission: str) -> Goal:
    if mission == "S10":
        return Goal(xg=-100.0, yg=0.0, zg=0.0, rg=100.0)
    return Goal(xg=0.0, yg=400.0, zg=0.0, rg=0.0)


def make_problem(
    mission: str = "S10",
    aircraft: str = "tempest",
    ts: int | None = None,
    wind_model: int = 1,
    goal: Goal | None = None,
    wind: WindConfig | None = None,
    jacobian_mode: str = "exact",
    dtype=jnp.float64,
) -> CollocationNLP:
    cfg = make_config(mission, aircraft, ts, wind_model, jacobian_mode)
    if goal is None:
        goal = default_goal(mission)
    if wind is None:
        wind = WindConfig(model=wind_model)
    return build_nlp(cfg, goal, wind, dtype=dtype)
