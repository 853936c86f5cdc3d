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
    leg_tol: float = 5e-3        # working KKT tolerance per leg solve
    leg_feas_tol: float = 1e-4   # scaled feasibility per leg solve
    leg_max_iter: int = 400
    # Live wind-field refresh (wind_model 3): path to a TOLWGRID cache
    # re-read before EVERY leg solve when ``wind_refresh`` — the analog of
    # the reference re-querying the storm DB in each problem ctor
    # (src/problem.cpp:371-469).  The grid is instance data (same shapes),
    # so a refresh never recompiles the leg program.
    wind_grid_path: Optional[str] = None
    wind_refresh: bool = False
    # Seed-ensemble leg solves (TPU production path): solve each leg as a
    # batch of leg_ensemble lanes — warm start + perturbed warm + cold
    # seeds — advancing in leg_chunk-iteration slices (ALMState resume)
    # and stopping at the first slice with a converged lane (best-f
    # winner).  Rationale (measured, BENCH_r04): a single-lane solve on
    # TPU pays ~36 ms/iteration (the batched Pallas chain needs
    # B % 128 == 0; B=1 falls back to an XLA op stream), while a 128-lane
    # ensemble pays ~2 ms/iteration-per-batch — so the ensemble is ~4x
    # faster per leg AND replaces the serial cold-retry fallback (cold
    # lanes run concurrently with the warm ones).  0 = single-lane path.
    leg_ensemble: int = 0
    leg_chunk: int = 48
    leg_chain: str = "cr"   # ensemble path wants "crp" on TPU


def default_leg_solver(cfg: MissionConfig) -> Callable:
    """Build the in-process leg solver: mission type + NED goal -> results doc.

    Replaces ``execute_SNOPT`` (src/tol.cpp:58-76).  Problems are built and
    jitted once per mission type; successive legs re-solve with new instance
    parameters (goal, stitch bounds) through the same compiled executable.

    Warm start: when ``cfg.warm_start`` and a previous leg of the same
    mission type exists, the new solve starts from its primal/dual solution
    (the reference always cold-starts SNOPT, src/problem.cpp:1238-1239 —
    warm-started replanning is this framework's fix, BASELINE config 4).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tol_tpu.api import make_config, make_problem
    from tol_tpu.config import Goal
    from tol_tpu.io.results import results_document
    from tol_tpu.models.wind import WindConfig
    from tol_tpu.problems.base import make_instance
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    cache: dict = {}
    warm: dict = {}   # mission_type -> (v, y) from the last converged leg
    wind_cache: dict = {}
    leg_counter = [0]  # per-solver leg index: ensemble noise differs per leg

    def _wind_config() -> WindConfig:
        """Per-leg wind configuration; reloads the TOLWGRID grid from disk
        each call when cfg.wind_refresh (live storm updates)."""
        if cfg.wind_model == 3 and cfg.wind_grid_path:
            if cfg.wind_refresh or "grid" not in wind_cache:
                from tol_tpu.io.native import read_wind_grid

                wind_cache["grid"] = read_wind_grid(cfg.wind_grid_path)
            return WindConfig(model=3, grid=wind_cache["grid"])
        return WindConfig(model=cfg.wind_model)

    def solve_leg(mission_type: str, goal_ned: Goal, stitch=None, v0=None):
        import os as _os

        dbg = _os.environ.get("TOL_LEG_DEBUG", "0") == "1"
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        wind_cfg = _wind_config()
        if mission_type not in cache:
            nlp = make_problem(mission_type, aircraft=cfg.aircraft,
                               ts=cfg.ts, wind_model=cfg.wind_model,
                               wind=wind_cfg, dtype=dtype)
            can = canonicalize(nlp, scaling="auto")
            kkt = make_condensed_kkt(can, refine=1, chain=cfg.leg_chain)
            pcfg = make_config(mission_type, cfg.aircraft, ts=cfg.ts,
                               wind_model=cfg.wind_model)
            # Per-mission production configuration: float32-safe gamma
            # floor 5e-6; r04 retune (scratch/tune_g7b.py, tune_sched.py)
            # — warm barrier start + earlier outer cycling + prox 2.5e-3
            # cut G7 median iterations 438 -> 303 at a HIGHER pass rate.
            opts = ALMOptions(tol=cfg.leg_tol, feas_tol=cfg.leg_feas_tol,
                              max_iter=cfg.leg_max_iter, gamma_init=0.01,
                              gamma_min=5e-6, gamma_shrink=0.2,
                              gamma_eager=True, mu_init=6e-5, mu_shrink=0.1,
                              kappa_inner=2.0, prox=2.5e-3, dual_refine_k=4)

            @jax.jit
            def run(inst, v0, y0):
                return alm_solve(can, kkt, opts, inst=inst, v0=v0, y0=y0)

            from tol_tpu.solver.alm import ALMParams

            pbase = ALMParams.from_options(opts, dtype)

            @jax.jit
            def run_ens(inst, v0s, y0s, p):
                return jax.vmap(
                    lambda v, y: alm_solve(can, kkt, opts, inst=inst, v0=v,
                                           y0=y, params=p,
                                           keep_state=True))(v0s, y0s)

            @jax.jit
            def resume_ens(inst, st, p):
                return jax.vmap(
                    lambda s: alm_solve(can, kkt, opts, inst=inst, params=p,
                                        state0=s, keep_state=True))(st)

            # Single-dispatch helpers: per-leaf host gathers cost ~30 ms
            # each over the tunneled TPU — fusing the ensemble seed build
            # and the winner pick shaves ~1 s off every leg.
            @jax.jit
            def build_seeds(inst, base_v, base_y, key, n_warm):
                # n_warm is a traced scalar: the 1 -> E//2 flip on the
                # first warm leg must not retrace (a retrace costs ~5 s
                # through the remote compiler and lands in that leg's
                # latency).
                E = cfg.leg_ensemble
                lbb, ubb, fxb = can.bounds(inst)
                seed0 = can.initial_point(inst)
                dv = 0.01 * jax.random.normal(key, (E, can.n),
                                              seed0.dtype)
                dv = dv.at[0].set(0.0).at[n_warm].set(0.0)
                bases = jnp.where((jnp.arange(E) < n_warm)[:, None],
                                  base_v[None], seed0[None])
                v0s = jnp.clip(bases + dv, lbb[None], ubb[None])
                v0s = jnp.where(fxb[None], lbb[None], v0s)
                y0s = jnp.where((jnp.arange(E) < n_warm)[:, None],
                                base_y[None],
                                jnp.zeros((1, can.m), seed0.dtype))
                return v0s, y0s

            @jax.jit
            def pick_winner(out):
                conv = out.converged
                fs = jnp.where(conv, out.f, jnp.inf)
                w = jnp.where(jnp.any(conv), jnp.argmin(fs),
                              jnp.argmin(out.constr_viol))
                sel = lambda x: x[w]
                return (w, sel(out.v), sel(out.y), sel(out.f),
                        sel(out.converged), sel(out.kkt_err),
                        sel(out.iterations), sel(out.constr_viol))

            cache[mission_type] = (nlp, can, run, run_ens, resume_ens,
                                   build_seeds, pick_winner, pbase, pcfg)
        (nlp, can, run, run_ens, resume_ens, build_seeds, pick_winner,
         pbase, pcfg) = cache[mission_type]
        inst = make_instance(pcfg, goal_ned, wind_cfg,
                             dtype=dtype, stitch=stitch)
        y0 = jnp.zeros(can.m, dtype)
        used_warm = False
        if v0 is None:
            # Warm-start only when the new leg resembles the warm state's
            # leg (a replan): a previous optimum pointed down a different
            # course is a worse start than the analytic seed.
            if cfg.warm_start and mission_type in warm:
                v_w, y_w, goal_w = warm[mission_type]
                d_chi = abs(math.atan2(float(goal_ned.yg), float(goal_ned.xg))
                            - math.atan2(float(goal_w.yg), float(goal_w.xg)))
                d_chi = min(d_chi, 2.0 * math.pi - d_chi)
                if d_chi < math.pi / 6.0:
                    v0, y0 = v_w, y_w
                    used_warm = True
            if v0 is None and cfg.leg_ensemble <= 0:
                v0 = can.initial_point(inst)
        cold_retry = False
        winner = None
        if cfg.leg_ensemble > 0:
            # Seed-ensemble leg solve (see MissionConfig.leg_ensemble).
            E = cfg.leg_ensemble
            n_warm = E // 2 if used_warm else 1
            # A caller-supplied seed is honored even when the warm cache
            # did not produce it (base lane + perturbations around it).
            base = (jnp.asarray(v0) if v0 is not None
                    else jnp.zeros(can.n, dtype))
            # Fold a per-leg counter into the key so a bad noise draw does
            # not repeat identically on every replan of a mission type.
            leg_counter[0] += 1
            key = jax.random.PRNGKey(leg_counter[0] * 7919 + E)
            t0 = time.time()
            v0s, y0s = build_seeds(inst, base, jnp.asarray(y0), key,
                                   jnp.asarray(n_warm, jnp.int32))
            if dbg:
                jax.block_until_ready(v0s)
                print(f"    seeds: {time.time() - t0:.3f}s", flush=True)
            it = min(cfg.leg_chunk, cfg.leg_max_iter)
            tc = time.time()
            out = run_ens(inst, v0s, y0s,
                          pbase._replace(max_iter=jnp.asarray(it, jnp.int32)))
            while True:
                conv = np.asarray(out.converged)
                if dbg:
                    print(f"    chunk@{it}: {time.time() - tc:.3f}s "
                          f"conv={int(conv.sum())}", flush=True)
                    tc = time.time()
                if conv.any() or it >= cfg.leg_max_iter:
                    break
                it = min(it + cfg.leg_chunk, cfg.leg_max_iter)
                out = resume_ens(
                    inst, out.state,
                    pbase._replace(max_iter=jnp.asarray(it, jnp.int32)))
            tp = time.time()
            picked = pick_winner(out)
            # one batched host pull for all the scalars the doc reads
            (w_, _, _, f_, conv_, kkt_, it_, viol_) = jax.device_get(picked)
            if dbg:
                print(f"    pick: {time.time() - tp:.3f}s", flush=True)

            class _Res:
                v, y = picked[1], picked[2]          # stay on device
                f, converged, kkt_err = float(f_), bool(conv_), float(kkt_)
                iterations, constr_viol = int(it_), float(viol_)

            res = _Res()
            winner = int(w_)
            solve_s = time.time() - t0
        else:
            t0 = time.time()
            res = run(inst, v0, y0)
            jax.block_until_ready(res.v)
            if used_warm and not bool(res.converged):
                # Cold retry: a stale warm start must never lose a leg.
                cold_retry = True
                res = run(inst, can.initial_point(inst),
                          jnp.zeros(can.m, dtype))
                jax.block_until_ready(res.v)
            solve_s = time.time() - t0
        td = time.time()
        Z, dt, _ = can.split(can.to_physical(res.v))
        f_phys = float(res.f) / float(can.scaling.s_f)
        doc = results_document(pcfg, goal_ned, Z, dt, f_phys,
                               aircraft_name=cfg.aircraft)
        doc["converged"] = bool(res.converged)
        doc["kkt_err"] = float(res.kkt_err)
        doc["iterations"] = int(res.iterations)
        doc["solve_s"] = solve_s
        doc["used_warm"] = used_warm
        doc["cold_retry"] = cold_retry
        if winner is not None:
            doc["ensemble"] = cfg.leg_ensemble
            doc["winner_lane"] = winner
        if bool(res.converged):
            warm[mission_type] = (res.v, res.y, goal_ned)
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
        from tol_tpu.config import Goal, StitchState

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

            # Stitch: carry the previous leg's terminal state into the next
            # leg's node-0 slack bounds (src/problem.cpp:33-60, triggered by
            # a nonzero initial airspeed, src/arguments.cpp:19-21).
            stitch = None
            if self.cfg.warm_start and len(self.trajectory):
                s = self.trajectory.end_state()
                stitch = StitchState(
                    Va=s["Va"], gam=s["gam"], chi=s["chi"], phi=s["phi"],
                    CL=s["CL"], dphi=s["dphi"], dCL=s["dCL"], T=s["T"])
            doc = self.solve_leg(mission_type, goal, stitch=stitch)
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
