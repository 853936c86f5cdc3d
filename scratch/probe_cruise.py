"""Verify steady-cruise feasibility for G7-Skywalker and its cost."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from tol_tpu.api import make_problem
from tol_tpu.solver import canonicalize

ts = 100
nlp = make_problem("G7", aircraft="skywalker", ts=ts, wind_model=1,
                   dtype=jnp.float64)
can = canonicalize(nlp, scaling="auto")
inst = nlp.inst0
ac = inst.aircraft
g, rho = 9.81, 1.2682
Va = 12.0
q = 0.5 * rho * Va * Va * ac.SS
CL = ac.mm * g / q
Cd = ac.Cd0 + CL ** 2 / (jnp.pi * ac.AR * ac.ee)
D = q * Cd
print(f"Va={Va} CL={float(CL):.3f} (CLmax={float(ac.CLmax)}) "
      f"D={float(D):.3f} N (Tmax={float(ac.Tmax)})")
chi_d = float(jnp.arctan2(inst.goal.yg, inst.goal.xg))
dt = 0.1
Z = np.zeros((ts + 1, 11))
Z[:, 0] = np.arange(ts + 1) * Va * dt * np.cos(chi_d)
Z[:, 1] = np.arange(ts + 1) * Va * dt * np.sin(chi_d)
Z[:, 2] = 0.0
Z[:, 3] = Va
Z[:, 4] = 0.0
Z[:, 5] = chi_d
Z[:, 6] = 0.0
Z[:, 7] = CL
Z[:, 8] = 0.0
Z[:, 9] = 0.0
Z[:, 10] = D
# physical -> scaled decision vector
v_phys = np.concatenate([[dt], Z.reshape(-1), np.zeros(can.n_slack)])
# slack for the ineq row: dist - dmax + s = 0
v = can.from_physical(jnp.asarray(v_phys))
cvec = np.asarray(can.c(v, inst))
# fix the slack so the ineq row closes
ineq_row = 8 * ts + 11
s_needed = -cvec[ineq_row] * 1.0
print("ineq row resid before slack:", cvec[ineq_row])
v = v.at[-1].add(s_needed)
cvec = np.asarray(can.c(v, inst))
print("max |c| =", np.max(np.abs(cvec)),
      "at row", int(np.argmax(np.abs(cvec))))
print("f(cruise) =", float(can.f(v, inst)))
# wind at z=0? model 1: v = -Vref*z/href -> 0 at z=0. good.
lb, ub, fixed = can.bounds(inst)
ok = np.all((np.asarray(v) >= np.asarray(lb) - 1e-9)
            & (np.asarray(v) <= np.asarray(ub) + 1e-9))
print("bounds ok:", bool(ok))
