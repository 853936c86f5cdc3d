"""Mission S10 — loiter on a goal circle (ref: src/problemS10.cpp).

Cost (src/problemS10.cpp:227-265):
    F0 = 0.5 kT sum T_i^2 + 0.5 kp sum (r_i - R)^2 + kdt dt
with r_i the horizontal distance from node i to the goal centre and R the
goal radius.  Default S10 gains (problems/S10/gains.param): kT=0, kp=8,
kdt=1.

Boundary (src/problemS10.cpp:273-305): all 11 node variables periodic, with
the course row requiring one full loop  chi(tf) - chi(t0) = 2*pi.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tol_tpu.config import ProblemConfig
from tol_tpu.models.dynamics import IDX_CHI, IDX_T, NUM_VARS
from tol_tpu.problems.seed import (invert_flight_mechanics, s10_seed_path,
                                   s10_zoom_seed_path)


def make(cfg: ProblemConfig, dtype):
    ts = cfg.dims.ts

    def node_cost(z, dt, inst):
        r = jnp.sqrt((z[0] - inst.goal.xg) ** 2 + (z[1] - inst.goal.yg) ** 2)
        return (0.5 * inst.gains.kT * z[IDX_T] ** 2
                + 0.5 * inst.gains.kp * (r - inst.goal.rg) ** 2)

    def global_cost(z0, zT, dt, inst):
        return inst.gains.kdt * dt

    # chi(tf) - chi(t0) = 2*pi full-loop offset (src/problemS10.cpp:289,298);
    # all other rows plain periodicity.
    offset = jnp.zeros(NUM_VARS, dtype=dtype).at[IDX_CHI].set(2.0 * jnp.pi)

    def boundary(z0, zT, dt, inst):
        return zT - z0 - offset

    is_ineq = np.zeros(NUM_VARS, dtype=bool)  # 11 equality rows

    def seed(inst):
        # Level coordinated-turn circle (reference parity; see
        # s10_zoom_seed_path for the energy-exchange alternative — measured
        # to start less feasible and converge to the same basin, so the
        # level seed stays the default).
        path = s10_seed_path(ts, dtype=dtype, aircraft=inst.aircraft)
        return invert_flight_mechanics(path, inst.aircraft, periodic_rates=True)

    return node_cost, global_cost, boundary, is_ineq, seed
