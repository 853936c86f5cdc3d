"""Command-line entry point.

Mirrors the reference CLI (``src/tol.cpp:38-53``):

    python -m tol_tpu EAST NORTH UP EAST_GOAL NORTH_GOAL UP_GOAL RADIUS \\
        AIRCRAFT MISSION [--out snopt_results.json]

positions/goals in datum-relative ENU meters, mission in {G7, S10}.
Writes a ``snopt_results.json``-compatible document.

Also provides the mission console:

    python -m tol_tpu mission --goal E,N,U,R [--aircraft tempest]
"""

from __future__ import annotations

import argparse
import sys


def solve_cli(argv):
    p = argparse.ArgumentParser(prog="tol_tpu")
    p.add_argument("east", type=float)
    p.add_argument("north", type=float)
    p.add_argument("up", type=float)
    p.add_argument("east_goal", type=float)
    p.add_argument("north_goal", type=float)
    p.add_argument("up_goal", type=float)
    p.add_argument("radius_goal", type=float)
    p.add_argument("aircraft")
    p.add_argument("mission", choices=["G7", "S10"])
    p.add_argument("--out", default="snopt_results.json")
    p.add_argument("--ts", type=int, default=None)
    p.add_argument("--wind-model", type=int, default=1)
    p.add_argument("--tol", type=float, default=None,
                   help="KKT tolerance (default: 1e-6 on f64, 5e-3 f32)")
    p.add_argument("--max-iter", type=int, default=800)
    args = p.parse_args(argv)

    import jax

    from tol_tpu.api import make_config, make_problem
    from tol_tpu.config import Goal
    from tol_tpu.io.results import results_document, write_results_json
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    # ENU -> NED goal conversion (src/problem.cpp:23-27).
    goal = Goal(xg=args.north_goal, yg=args.east_goal, zg=-args.up_goal,
                rg=args.radius_goal)
    print(f"TOL STATUS: Building {args.mission}...", flush=True)
    # Production configuration (the same family as the mission layer):
    # nondimensionalized problem, structured chain, float32-safe
    # schedules — the unscaled path is a CPU/f64 oracle only.
    x64 = jax.config.jax_enable_x64
    tol = args.tol if args.tol is not None else (1e-6 if x64 else 5e-3)
    nlp = make_problem(args.mission, aircraft=args.aircraft, ts=args.ts,
                       wind_model=args.wind_model, goal=goal)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=1, chain="cr")
    print("TOL STATUS: Solving now", flush=True)
    res = alm_solve(can, kkt,
                    ALMOptions(tol=tol, feas_tol=(1e-5 if x64 else 1e-4),
                               max_iter=args.max_iter, gamma_init=0.01,
                               gamma_min=5e-6, gamma_shrink=0.2,
                               gamma_eager=True, mu_init=6e-5,
                               mu_shrink=0.1, kappa_inner=2.0,
                               prox=2.5e-3, dual_refine_k=4))
    Z, dt, _ = can.split(can.to_physical(res.v))
    cfg = make_config(args.mission, args.aircraft, ts=args.ts,
                      wind_model=args.wind_model)
    f_phys = float(res.f) / float(can.scaling.s_f)
    doc = results_document(cfg, goal, Z, dt, f_phys,
                           aircraft_name=args.aircraft,
                           east=args.east, north=args.north, up=args.up)
    doc["converged"] = bool(res.converged)
    doc["kkt_err"] = float(res.kkt_err)
    doc["iterations"] = int(res.iterations)
    write_results_json(args.out, doc)
    status = "Run Complete!" if res.converged else (
        f"NOT CONVERGED (kkt={float(res.kkt_err):.2e})")
    print(f"TOL STATUS: {status}  f={float(res.f):.6f} -> {args.out}")
    return 0 if res.converged else 1


def mission_cli(argv):
    p = argparse.ArgumentParser(prog="tol_tpu mission")
    p.add_argument("--goal", required=True,
                   help="east,north,up,radius (datum-relative ENU meters)")
    p.add_argument("--aircraft", default="tempest")
    p.add_argument("--ts", type=int, default=100)
    p.add_argument("--wind-model", type=int, default=1)
    p.add_argument("--kml", default="trajectory.kml")
    p.add_argument("--json", default="trajectory.json")
    args = p.parse_args(argv)

    from tol_tpu.mission import FakeAutopilot, Mission, MissionConfig

    goal = tuple(float(x) for x in args.goal.split(","))
    cfg = MissionConfig(aircraft=args.aircraft, ts=args.ts,
                        wind_model=args.wind_model)
    m = Mission(cfg, FakeAutopilot())
    traj = m.run(goal)
    for line in m.log:
        print(line)
    traj.write_to_kml(args.kml)
    traj.write_to_json(args.json)
    print(f"mission complete: {len(traj)} samples -> {args.kml}, {args.json}")
    return 0


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "mission":
        raise SystemExit(mission_cli(argv[1:]))
    raise SystemExit(solve_cli(argv))


if __name__ == "__main__":
    main()
