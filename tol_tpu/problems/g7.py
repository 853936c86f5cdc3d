"""Mission G7 — periodic guidance gait toward the goal course (ref: src/problemG7.cpp).

Cost (src/problemG7.cpp:225-250):
    F0 = 0.5 kT sum T_i^2 + kv ts dt / dist
with dist the horizontal displacement between first and last node.  Default
G7 gains (problems/G7/gains.param): kT=100, kv=0 — the speed term vanishes
but is kept for non-default gains.

Boundary (src/problemG7.cpp:258-296), 12 rows:
    0: xf - x0 - dist cos(chi_d) = 0     (net displacement along the desired
    1: yf - y0 - dist sin(chi_d) = 0      course chi_d = atan2(yg, xg),
                                          src/problemG7.cpp:524)
    2-10: z..T periodic
    11: dist - dmax <= 0                 (inequality row; dmax is the
                                          distance from node 0 to the goal)
The reference's "kill shot" branch is stubbed off there
(src/problem.cpp:341, src/problemG7.cpp:266-275) and rows 7/9 use
phi_m = phi_0, dphi_m = dphi_0, i.e. plain periodicity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tol_tpu.config import ProblemConfig
from tol_tpu.models.dynamics import IDX_T, NUM_VARS
from tol_tpu.problems.seed import g7_seed_path, invert_flight_mechanics


def _chi_d(inst):
    # Desired course from the leg origin (xi=yi=0) to the goal.
    return jnp.arctan2(inst.goal.yg, inst.goal.xg)


def _dist(z0, zT):
    return jnp.sqrt((zT[0] - z0[0]) ** 2 + (zT[1] - z0[1]) ** 2)


def make(cfg: ProblemConfig, dtype):
    ts = cfg.dims.ts

    def node_cost(z, dt, inst):
        return 0.5 * inst.gains.kT * z[IDX_T] ** 2

    def global_cost(z0, zT, dt, inst):
        return inst.gains.kv * ts * dt / _dist(z0, zT)

    def boundary(z0, zT, dt, inst):
        """12 boundary rows; displacement-direction constraint reformulated.

        The reference writes the "net displacement along the desired
        course" condition as the PAIR  [dx - dist*cos(chi_d),
        dy - dist*sin(chi_d)]  (src/problemG7.cpp:258-265).  That pair is
        structurally rank-deficient: its Jacobian is the projector
        (I - u u^T) onto the course-perpendicular direction, so the
        along-course combination is in the nullspace everywhere on the
        feasible set.  SNOPT's elastic mode tolerates this; a float32
        first-order multiplier update does not — the degenerate row's
        multiplier crawls and the measured violation floor sits right at
        the 1e-4 working feasibility tolerance (observed on ts=100).

        Equivalent well-conditioned form of the same feasible set
        { displacement parallel to course, non-negative along it }:
            row 0 (eq):    -dx sin(chi_d) + dy cos(chi_d) = 0   (perp)
            row 1 (<= 0):  -(dx cos(chi_d) + dy sin(chi_d))     (along >= 0)
        Both rows have unit-norm position gradients everywhere.  Together
        with perp = 0, along >= 0 implies dist = along, so row 11's
        dist <= dmax keeps its reference meaning (src/problem.cpp:345-350).
        """
        chi_d = _chi_d(inst)
        dx = zT[0] - z0[0]
        dy = zT[1] - z0[1]
        dist = _dist(z0, zT)
        dmax = jnp.sqrt((inst.goal.xg - z0[0]) ** 2 + (inst.goal.yg - z0[1]) ** 2)
        rows = [
            -dx * jnp.sin(chi_d) + dy * jnp.cos(chi_d),
            -(dx * jnp.cos(chi_d) + dy * jnp.sin(chi_d)),
        ]
        rows += [zT[k] - z0[k] for k in range(2, NUM_VARS)]
        rows.append(dist - dmax)
        return jnp.stack(rows)

    is_ineq = np.zeros(NUM_VARS + 1, dtype=bool)
    is_ineq[1] = True   # along-course displacement >= 0
    is_ineq[-1] = True  # dist <= dmax (src/problem.cpp:345-350)

    def seed(inst):
        path = g7_seed_path(ts, _chi_d(inst), vamin=inst.aircraft.Vamin,
                            vamax=inst.aircraft.Vamax, dtype=dtype)
        return invert_flight_mechanics(path, inst.aircraft,
                                       periodic_rates=False)

    return node_cost, global_cost, boundary, is_ineq, seed
