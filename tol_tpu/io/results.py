"""Result serialization — ``snopt_results.json``-compatible.

Writes the same document schema as ``problem::writeJSON``
(src/problem.cpp:1247-1365): args / trajectory arrays / aircraft / gains /
limits / snopt sections plus ``FinalCost`` and ``dt`` — so the reference's
MATLAB ``plotSNOPT`` tooling and the MSL stitching loop
(msl/mission.py:208-240) can consume our output unchanged.
"""

from __future__ import annotations

import json
import math
from typing import Any, Dict

import numpy as np

from tol_tpu.config import Goal, ProblemConfig


def results_document(
    cfg: ProblemConfig,
    goal: Goal,
    Z,
    dt,
    final_cost,
    aircraft_name: str = "",
    east: float = 0.0,
    north: float = 0.0,
    up: float = 0.0,
) -> Dict[str, Any]:
    Z = np.asarray(Z, dtype=np.float64)
    dt = float(dt)
    n_nodes = Z.shape[0]
    time = [i * dt for i in range(n_nodes)]

    def col(k):
        return [float(x) for x in Z[:, k]]

    ac, gn, lm, sn = cfg.aircraft, cfg.gains, cfg.limits, cfg.dims
    return {
        "args": {
            "east": east, "north": north, "up": up,
            "xg": float(goal.xg), "yg": float(goal.yg), "zg": float(goal.zg),
            "rd": float(goal.rg),
            "aircraft": aircraft_name, "problem": cfg.mission,
        },
        "problem": cfg.mission,
        "FinalCost": float(final_cost),
        "dt": dt,
        "trajectory": {
            "time": time,
            "x": col(0), "y": col(1), "z": col(2),
            "Va": col(3), "gam": col(4), "chi": col(5),
            "phi": col(6), "CL": col(7),
            "dphi": col(8), "dCL": col(9), "T": col(10),
        },
        "aircraft": {
            "name": aircraft_name, "mass": float(ac.mm), "b": float(ac.b),
            "S": float(ac.SS), "e": float(ac.ee), "AR": float(ac.AR),
            "Cd0": float(ac.Cd0), "CLmin": float(ac.CLmin),
            "CLmax": float(ac.CLmax), "phimax": float(ac.phimax),
            "Vamin": float(ac.Vamin), "Vamax": float(ac.Vamax),
            "gammamax": float(ac.gammamax), "dphimax": float(ac.phidotmax),
            "Tmin": float(ac.Tmin), "Tmax": float(ac.Tmax),
        },
        "gains": {
            "kT": float(gn.kT), "kp": float(gn.kp), "kv": float(gn.kv),
            "ka": float(gn.ka), "kdt": float(gn.kdt),
        },
        "limits": {
            "dtmin": float(lm.dtmin), "dtmax": float(lm.dtmax),
            "xmin": float(lm.xmin), "xmax": float(lm.xmax),
            "ymin": float(lm.ymin), "ymax": float(lm.ymax),
            "zmin": float(lm.zmin), "zmax": float(lm.zmax),
        },
        "snopt": {
            "ts": int(sn.ts), "numinp": int(sn.numinp),
            "numstates": int(sn.numstates), "numbounds": int(sn.numbounds),
            "opt_tol": float(sn.opt_tol), "feas_tol": float(sn.feas_tol),
        },
    }


def write_results_json(path: str, doc: Dict[str, Any]) -> None:
    with open(path, "w") as f:
        json.dump(doc, f, indent=3)


def read_results_json(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def write_results_txt(path: str, doc: Dict[str, Any]) -> None:
    """Tab-separated text variant (``problem::writeTXT``,
    src/problem.cpp:1371-1418): header comment lines, one column per state
    with ``%-4.7e`` formatting, then dt and FinalCost columns repeated per
    row; time accumulates by dt.  Two reference quirks are deliberately
    fixed rather than reproduced: the header's ``tf_i`` is the actual final
    time (the reference hardcodes 10, :1381) and the mission line reports
    the real problem name (the reference always prints "ProblemS10",
    :1395).
    """
    tr = doc["trajectory"]
    dt = float(doc["dt"])
    names = ["x", "y", "z", "Va", "gamma", "chi", "phi", "CL",
             "dphi", "dCL", "T"]
    keys = ["x", "y", "z", "Va", "gam", "chi", "phi", "CL",
            "dphi", "dCL", "T"]
    n = len(tr["x"])
    tfinal = dt * (n - 1)
    with open(path, "w") as f:
        f.write("% SNOPT Output: Thesis Optimization \n")
        f.write(f"% Simulation: tf_i = {tfinal:4.2f} s, dt_i = {dt:4.2f} s \n")
        f.write("% time \t \t" + "".join(f"{c} \t \t" for c in names)
                + "dt \t \tFinal Cost \n")
        f.write(f"Problem{doc.get('problem', 'S10')} \n")
        t = 0.0
        for i in range(n):
            cells = [f"{t:-4.7e} \t"]
            cells += [f"{float(tr[k][i]):-4.7e} \t" for k in keys]
            cells += [f"{dt:-4.7e} \t", f"{float(doc['FinalCost']):-4.7e} \n"]
            f.write("".join(cells))
            t += dt
