"""3-D point-mass aircraft dynamics in a wind field.

Re-derivation of ``problem::dynamicConstraints`` (src/problem.cpp:1003-1008)
in compact vector form.  State (NED): position (x north, y east, z down),
airspeed Va, flight-path angle gamma, course chi, bank phi, lift coeff CL;
controls: roll rate dphi, CL rate dCL, thrust T.

With air-velocity direction
    e_a     = [cos(chi) cos(gam),  sin(chi) cos(gam), -sin(gam)]
and the wind-triangle ground velocity  v_g = W + Va * e_a, the reference's
long expressions reduce to (derivation matches term-by-term):

    [x,y,z]dot = v_g
    Va_dot  = T/m - g sin(gam) - D/m       - e_a^T  (gradW v_g)
    gam_dot = ( L cos(phi)/m - g cos(gam)  + e_gam^T(gradW v_g) ) / Va
    chi_dot = ( L sin(phi)/m               - e_chi^T(gradW v_g) ) / (Va cos(gam))
    phi_dot = dphi,   CL_dot = dCL          (direct rate controls,
                                             src/problem.cpp:1018-1019)

where
    e_gam = [cos(chi) sin(gam), sin(chi) sin(gam), cos(gam)]
    e_chi = [-sin(chi), cos(chi), 0]
    L = 0.5 rho S Va^2 CL
    D = 0.5 rho S Va^2 (Cd0 + CL^2 / (pi AR e))   (drag polar,
                                                   src/problem.cpp:1006)
    (gradW v_g)_k = sum_j dW_k/dp_j * v_g_j   — the wind rate seen along the
    ground track; e.g. the reference's repeated factor
    ``dWx_dy cos(chi)cos(gam) - dWz_dy sin(gam) + dWy_dy cos(gam)sin(chi)``
    is exactly ``e_a^T dW/dy``.

Being a plain differentiable function, exact Jacobians/Hessians come from
``jax.jacfwd`` / ``jax.hessian`` — replacing the 174 hand-derived lines of
``problem::dynamicsGradients`` (src/problem.cpp:1035-1208).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tol_tpu.config import GRAVITY, RHO, AircraftParams

# Decision-variable layout within one collocation node (ref index map at
# src/problem.cpp:211-221: 1-based x..T; here 0-based).
IDX_X, IDX_Y, IDX_Z, IDX_VA, IDX_GAM, IDX_CHI, IDX_PHI, IDX_CL = range(8)
IDX_DPHI, IDX_DCL, IDX_T = 8, 9, 10
NUM_VARS = 11     # per-node decision variables (snopt.param "numinp")
NUM_STATES = 8    # dynamic states (snopt.param "numstates")

NODE_VAR_NAMES = ("x", "y", "z", "Va", "gam", "chi", "phi", "CL",
                  "dphi", "dCL", "T")


def state_derivatives(
    z: jax.Array,
    wind: jax.Array,
    wind_grad: jax.Array,
    ac: AircraftParams,
) -> jax.Array:
    """Time derivative of the 8 dynamic states for one node.

    Args:
      z: (11,) node decision variables ``[x,y,z,Va,gam,chi,phi,CL,dphi,dCL,T]``.
      wind: (3,) NED wind at the node position.
      wind_grad: (3,3) NED wind spatial gradient, ``[i,j] = dW_i/dp_j``.
      ac: airframe parameters.

    Returns:
      (8,) ``[xdot, ydot, zdot, Vadot, gamdot, chidot, phidot, CLdot]``
      mirroring src/problem.cpp:1003-1008 (+ the direct rate controls used in
      the phi/CL defect rows, src/problem.cpp:1018-1019).
    """
    Va = z[IDX_VA]
    gam = z[IDX_GAM]
    chi = z[IDX_CHI]
    phi = z[IDX_PHI]
    CL = z[IDX_CL]
    dphi = z[IDX_DPHI]
    dCL = z[IDX_DCL]
    T = z[IDX_T]

    cg, sg = jnp.cos(gam), jnp.sin(gam)
    cc, sc = jnp.cos(chi), jnp.sin(chi)

    e_a = jnp.stack([cc * cg, sc * cg, -sg])
    e_gam = jnp.stack([cc * sg, sc * sg, cg])
    e_chi = jnp.stack([-sc, cc, jnp.zeros_like(sc)])

    v_g = wind + Va * e_a
    wind_rate = wind_grad @ v_g  # dW/dt along the ground track

    q = 0.5 * RHO * ac.SS * Va * Va  # dynamic pressure * area
    L = q * CL
    D = q * (ac.Cd0 + CL * CL / (jnp.pi * ac.AR * ac.ee))

    Va_dot = T / ac.mm - GRAVITY * sg - D / ac.mm - e_a @ wind_rate
    gam_dot = (L * jnp.cos(phi) / ac.mm - GRAVITY * cg + e_gam @ wind_rate) / Va
    chi_dot = (L * jnp.sin(phi) / ac.mm - e_chi @ wind_rate) / (Va * cg)

    return jnp.stack([
        v_g[0], v_g[1], v_g[2],
        Va_dot, gam_dot, chi_dot,
        dphi, dCL,
    ])
