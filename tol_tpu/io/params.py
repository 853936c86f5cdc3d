"""``.param`` file readers.

Line-oriented format compatible with the reference's
``parameters::readparams`` (src/parameters.cpp:14-34): each line holds one
numeric value optionally followed by a comment.  The reference splits each
line on ``'/'`` (its multi-char literal ``'//'`` truncates to ``'/'``,
src/parameters.cpp:18) and parses the head with ``stod`` — which also stops at
trailing junk such as the literal ``\\n`` text embedded in
``aircraft/tempest.param``.  Non-numeric lines are skipped.

We replicate those semantics: split on the first ``'/'``, parse the leading
float (tolerating trailing non-numeric characters), skip lines that do not
start with a number.
"""

from __future__ import annotations

import math
import os
import re
from typing import List

from tol_tpu.config import AircraftParams, Gains, Limits, SolverDims

# Leading float: optional sign, digits, optional fraction/exponent.  Mirrors
# C++ std::stod prefix parsing used at src/parameters.cpp:26.
_FLOAT_PREFIX = re.compile(r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)")


def _parse_line(line: str) -> float | None:
    head = line.split("/", 1)[0]
    m = _FLOAT_PREFIX.match(head)
    if m is None:
        return None
    return float(m.group(1))


def read_param_file(path: str) -> List[float]:
    """Read every numeric line of a ``.param`` file (src/parameters.cpp:14-34)."""
    values: List[float] = []
    with open(path, "r") as f:
        for line in f:
            v = _parse_line(line)
            if v is not None:
                values.append(v)
    return values


def _expect(values: List[float], count: int, what: str) -> None:
    if len(values) != count:
        raise ValueError(
            f"Wrong number of parameters for {what}: expected {count}, got {len(values)}"
        )


_DEG = math.pi / 180.0


def load_aircraft(name: str, root_path: str) -> AircraftParams:
    """Load ``<root>/aircraft/<name>.param`` (15 fields, src/parameters.cpp:42-69).

    Degrees -> radians conversion applied to phimax / gammamax / phidotmax.
    """
    path = os.path.join(root_path, "aircraft", name + ".param")
    v = read_param_file(path)
    _expect(v, 15, f"{name}.param")
    return AircraftParams(
        mm=v[0], b=v[1], SS=v[2], ee=v[3], AR=v[4], Cd0=v[5],
        CLmin=v[6], CLmax=v[7], phimax=v[8] * _DEG,
        Vamin=v[9], Vamax=v[10], gammamax=v[11] * _DEG,
        phidotmax=v[12] * _DEG, Tmin=v[13], Tmax=v[14],
    )


def load_gains(mission: str, root_path: str) -> Gains:
    """Load ``<root>/problems/<mission>/gains.param`` (5 fields, src/parameters.cpp:77-94)."""
    path = os.path.join(root_path, "problems", mission, "gains.param")
    v = read_param_file(path)
    _expect(v, 5, f"problems/{mission}/gains.param")
    return Gains(kT=v[0], kp=v[1], kv=v[2], ka=v[3], kdt=v[4])


def load_limits(mission: str, root_path: str) -> Limits:
    """Load ``<root>/problems/<mission>/limits.param`` (8 fields, src/parameters.cpp:102-122)."""
    path = os.path.join(root_path, "problems", mission, "limits.param")
    v = read_param_file(path)
    _expect(v, 8, f"problems/{mission}/limits.param")
    return Limits(
        dtmin=v[0], dtmax=v[1], xmin=v[2], xmax=v[3],
        ymin=v[4], ymax=v[5], zmin=v[6], zmax=v[7],
    )


def load_solver_dims(mission: str, root_path: str) -> SolverDims:
    """Load ``<root>/problems/<mission>/snopt.param`` (6 fields, src/parameters.cpp:130-148)."""
    path = os.path.join(root_path, "problems", mission, "snopt.param")
    v = read_param_file(path)
    _expect(v, 6, f"problems/{mission}/snopt.param")
    return SolverDims(
        ts=int(v[0]), numinp=int(v[1]), numstates=int(v[2]), numbounds=int(v[3]),
        opt_tol=v[4], feas_tol=v[5],
    )


def assets_root() -> str:
    """Root of this package's bundled parameter assets."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "assets")
