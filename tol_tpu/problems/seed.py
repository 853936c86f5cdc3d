"""Seed-trajectory generation (SNOPT "InitialCond" equivalent).

Both missions seed the solver with an analytic path whose states/controls are
recovered by flight-mechanics inversion:

  * G7: straight-line run toward the goal heading, rotated by the desired
    course ``chi_d`` (src/problemG7.cpp:19-217; sinusoid degenerates to a
    line since yAmp=0, src/problemG7.cpp:41-43).
  * S10: one full circle of radius 100 m tangent at the origin
    (src/problemS10.cpp:19-219).

The inversion (identical blocks src/problemG7.cpp:100-172 and
src/problemS10.cpp:94-175) maps path position/velocity/acceleration to
``(Va, gam, chi, phi, CL, dphi, dCL, T)`` assuming zero wind (the reference
comments out its wind lookup because the seed stays at z=0,
src/problemG7.cpp:94).  Vectorized here: the per-node loop becomes array
ops, and the while-loop course unwrap (src/problemG7.cpp:112-129) becomes
``jnp.unwrap`` (same semantics: shift by 2*pi*m so successive differences
lie in [-pi, pi]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tol_tpu.config import GRAVITY, RHO, AircraftParams
from tol_tpu.models.dynamics import NUM_VARS


class SeedPath(NamedTuple):
    """Analytic path samples at the ts+1 collocation nodes."""

    pos: jax.Array   # (N, 3) NED
    vel: jax.Array   # (N, 3)
    acc: jax.Array   # (N, 3)
    dt: jax.Array    # scalar time step
    chi_offset: jax.Array  # added to raw course before unwrap (G7's chi_d)


def invert_flight_mechanics(path: SeedPath, ac: AircraftParams,
                            periodic_rates: bool) -> tuple[jax.Array, jax.Array]:
    """Recover node decision variables from an analytic path.

    Returns ``(Z, dt)`` with ``Z`` of shape (N, 11).  ``periodic_rates``
    selects the S10 behaviour of back-filling node-0 dphi/dCL with the final
    node's values (src/problemS10.cpp:210-211); G7 leaves them zero
    (commented there, src/problemG7.cpp:212-215).
    """
    v = path.vel                       # zero wind: air-relative = inertial
    speed = jnp.linalg.norm(v, axis=1)
    Va = speed
    chi_raw = jnp.arctan2(v[:, 1], v[:, 0]) + path.chi_offset
    gam = jnp.arctan2(-v[:, 2], jnp.linalg.norm(v[:, :2], axis=1))
    chi = jnp.unwrap(chi_raw)

    r1 = v / speed[:, None]
    # Specific-force demand perpendicular to the path: a_rel = acc - gravity
    # (NED gravity = +g in z), an = (I - r1 r1^T) a_rel
    # (src/problemG7.cpp:139-142).
    a_rel = path.acc - jnp.array([0.0, 0.0, GRAVITY], dtype=v.dtype)
    along = jnp.sum(r1 * a_rel, axis=1)
    an = a_rel - r1 * along[:, None]
    mag_an = jnp.linalg.norm(an, axis=1)
    r3 = -an / mag_an[:, None]
    # Only the z-component of r2 = r3 x r1-ish combination is needed for the
    # bank angle (src/problemG7.cpp:151-155).
    r2_3 = r3[:, 0] * r1[:, 1] - r3[:, 1] * r1[:, 0]
    phi = jnp.arctan2(r2_3, r3[:, 2])

    L = ac.mm * mag_an
    CL = 2.0 * L / (RHO * Va * Va * ac.SS)
    D = 0.5 * RHO * Va * Va * ac.SS * (ac.Cd0 + CL * CL / (jnp.pi * ac.AR * ac.ee))
    T = ac.mm * along + D

    # Finite-difference rate controls (src/problemG7.cpp:161-170).
    dphi = jnp.diff(phi) / path.dt
    dCL = jnp.diff(CL) / path.dt
    if periodic_rates:
        first_dphi, first_dCL = dphi[-1], dCL[-1]
    else:
        first_dphi = jnp.zeros((), dtype=v.dtype)
        first_dCL = jnp.zeros((), dtype=v.dtype)
    dphi = jnp.concatenate([first_dphi[None], dphi])
    dCL = jnp.concatenate([first_dCL[None], dCL])

    Z = jnp.zeros((v.shape[0], NUM_VARS), dtype=v.dtype)
    Z = Z.at[:, 0:3].set(path.pos)
    Z = Z.at[:, 3].set(Va)
    Z = Z.at[:, 4].set(gam)
    Z = Z.at[:, 5].set(chi)
    Z = Z.at[:, 6].set(phi)
    Z = Z.at[:, 7].set(CL)
    Z = Z.at[:, 8].set(dphi)
    Z = Z.at[:, 9].set(dCL)
    Z = Z.at[:, 10].set(T)
    return Z, path.dt


def g7_seed_path(ts: int, chi_d: jax.Array, vamin=None, vamax=None,
                 dtype=jnp.float64) -> SeedPath:
    """Straight-line seed rotated to the goal course (src/problemG7.cpp:38-88).

    The reference flies the seed at xAmp/tfinal = 4 m/s regardless of the
    airframe (src/problemG7.cpp:39-41) — below most airframes' Vamin, so
    the solver starts with every node bound-clipped and every defect
    broken.  When airframe speed limits are provided the seed speed is
    clamped inside them (same 40 m distance, adjusted duration); the
    course-angle treatment matches the reference (positions rotated by
    chi_d, velocities unrotated with chi_d added to the course,
    src/problemG7.cpp:86-88,109).
    """
    xAmp = 40.0
    speed = jnp.asarray(4.0, dtype=dtype)
    if vamin is not None:
        speed = jnp.maximum(speed, 1.1 * jnp.asarray(vamin, dtype=dtype))
    if vamax is not None:
        speed = jnp.minimum(speed, 0.9 * jnp.asarray(vamax, dtype=dtype))
    tfinal = xAmp / speed
    dt = jnp.asarray(tfinal / ts, dtype=dtype)
    t = jnp.arange(ts + 1, dtype=dtype) * dt
    xs = speed * t
    zero = jnp.zeros_like(t)
    # Rotate positions by yaw chi_d (src/problemG7.cpp:520-542).
    pos = jnp.stack([xs * jnp.cos(chi_d), xs * jnp.sin(chi_d), zero], axis=1)
    vel = jnp.stack([speed * jnp.ones_like(t), zero, zero], axis=1)
    acc = jnp.zeros_like(pos)
    return SeedPath(pos=pos, vel=vel, acc=acc, dt=dt,
                    chi_offset=jnp.asarray(chi_d, dtype=dtype))


def s10_zoom_seed_path(ts: int, aircraft: AircraftParams,
                       dtype=jnp.float64, phase: float = 0.5 * jnp.pi,
                       radius: float = 100.0) -> SeedPath:
    """Energy-exchange ("zoom") loiter seed.

    A level coordinated turn caps the loop speed at
    ``V_c = sqrt(g tan(phimax) R)`` — e.g. 17.9 m/s for Tempest on the
    100 m ring, far below its 30 m/s Vamax.  Because the S10 cost charges
    nothing for thrust (gains kT=0, problems/S10/gains.param) and pays
    ``kdt*dt`` for the period, the optimal loiter is a *zoom* loop: climb
    and slow where the bank limit binds, dive back through the start
    altitude fast (verified: the f64 oracle rides 50 m of altitude with
    Va swinging 12<->26 m/s, 1.75% faster than the best level loop).  The
    level-circle seed therefore starts a ~700-Newton-iteration valley walk
    away from the optimum — below float32 per-step progress resolution.
    This seed starts in the zoom basin using only airframe data:

        V(theta) = V_c + (0.9 Vamax - V_c)(1 + cos theta)/2
        z(theta) = -(Vmax^2 - V^2) / (2g)          (kinetic <-> potential)

    with theta the ring angle, theta=0 the (fast, z=0) start node, and
    time recovered from ds = R dtheta: t(theta) = int R / V_h.  Falls back
    to the level circle when the bank limit doesn't bind (V_c >= 0.9 Vamax).
    """
    R = jnp.asarray(radius, dtype)
    g = jnp.asarray(GRAVITY, dtype)
    v_c = jnp.sqrt(g * jnp.tan(0.9 * aircraft.phimax) * R)
    v_c = jnp.clip(v_c, 1.1 * aircraft.Vamin, 0.9 * aircraft.Vamax)
    v_max = jnp.asarray(0.9 * aircraft.Vamax, dtype)
    dv = jnp.maximum(v_max - v_c, 0.0)

    def V(th):
        return v_c + dv * (1.0 + jnp.cos(th)) / 2.0

    def z(th):
        return -(v_max ** 2 - V(th) ** 2) / (2.0 * g)

    def thetadot(th):
        # one fixed-point pass on V_h = sqrt(V^2 - zdot^2)
        dzdth = jax.grad(z)(th)
        zdot0 = dzdth * V(th) / R
        v_h = jnp.sqrt(jnp.maximum(V(th) ** 2 - zdot0 ** 2,
                                   (0.5 * V(th)) ** 2))
        return v_h / R

    def pos(th):
        return jnp.stack([R * jnp.sin(th + phase) - R * jnp.sin(phase),
                          -R * jnp.cos(th + phase) + R * jnp.cos(phase),
                          z(th)])

    # time-of-flight along the ring on a fine grid, then uniform-time nodes
    fine = 32 * ts
    th_f = jnp.linspace(0.0, 2.0 * jnp.pi, fine + 1, dtype=dtype)
    inv_rate = 1.0 / jax.vmap(thetadot)(th_f)
    seg = 0.5 * (inv_rate[1:] + inv_rate[:-1]) * (th_f[1] - th_f[0])
    t_f = jnp.concatenate([jnp.zeros(1, dtype), jnp.cumsum(seg)])
    T_total = t_f[-1]
    dt = T_total / ts
    t_nodes = jnp.arange(ts + 1, dtype=dtype) * dt
    th_nodes = jnp.interp(t_nodes, t_f, th_f)

    dpos = jax.vmap(jax.jacfwd(pos))(th_nodes)          # (N, 3)
    d2pos = jax.vmap(jax.jacfwd(jax.jacfwd(pos)))(th_nodes)
    thd = jax.vmap(thetadot)(th_nodes)
    dthd = jax.vmap(jax.grad(thetadot))(th_nodes)
    vel = dpos * thd[:, None]
    acc = (d2pos * thd[:, None] + dpos * dthd[:, None]) * thd[:, None]
    return SeedPath(pos=jax.vmap(pos)(th_nodes), vel=vel, acc=acc, dt=dt,
                    chi_offset=jnp.zeros((), dtype=dtype))


def s10_seed_path(ts: int, dtype=jnp.float64, phase: float = 0.5 * jnp.pi,
                  aircraft=None, radius: float = 100.0) -> SeedPath:
    """Circular loiter seed (src/problemS10.cpp:38-91).

    tfinal=20s, radius 100m: the reference path x = A sin(wt) - A,
    y = -A cos(wt) is one full lap of the circle centred at (-100, 0) (the
    default S10 loiter goal sent by msl/mission.py:136) starting at
    (-100, -100) — which *violates* the node-0 position pin at the origin
    (src/problem.cpp:256-258), leaving SNOPT to absorb a 140 m
    discontinuity.  The same circle passes through the origin a quarter
    period later, so we default to ``phase = pi/2``: identical geometry and
    winding, but consistent with the pinned first node (an interior-point
    method starts dramatically better from a bound-feasible seed).  Pass
    ``phase=0`` for the reference's exact seed.

    When ``aircraft`` is given, the circle speed is additionally chosen
    flyable: the reference's 31.4 m/s exceeds e.g. Tempest's 30 m/s Vamax
    and needs a 45-degree bank against its 20-degree phimax, so the raw
    seed starts with every node clipped into the bound boxes and all
    defects broken.  A coordinated-turn-feasible speed
    V = sqrt(g tan(0.9 phimax) R), clamped into [1.1 Vamin, 0.9 Vamax],
    starts near the dynamics manifold (and near the optimal loiter period).
    """
    amp = radius
    if aircraft is not None:
        v_turn = jnp.sqrt(GRAVITY * jnp.tan(0.9 * aircraft.phimax) * amp)
        speed = jnp.clip(v_turn, 1.1 * aircraft.Vamin, 0.9 * aircraft.Vamax)
        tfinal = 2.0 * jnp.pi * amp / speed
    else:
        tfinal = 20.0
    dt = jnp.asarray(tfinal / ts, dtype=dtype)
    t = jnp.arange(ts + 1, dtype=dtype) * dt
    w = 2.0 * jnp.pi / tfinal
    th = w * t + phase
    xs = amp * jnp.sin(th) - amp
    ys = -amp * jnp.cos(th)
    zero = jnp.zeros_like(t)
    pos = jnp.stack([xs, ys, zero], axis=1)
    vel = jnp.stack([w * amp * jnp.cos(th), w * amp * jnp.sin(th), zero], axis=1)
    acc = jnp.stack([-w * w * amp * jnp.sin(th), w * w * amp * jnp.cos(th), zero], axis=1)
    return SeedPath(pos=pos, vel=vel, acc=acc, dt=dt,
                    chi_offset=jnp.zeros((), dtype=dtype))
