"""Dynamics parity and AD checks.

The vector-form dynamics in tol_tpu.models.dynamics must reproduce the
reference's expanded scalar expressions (src/problem.cpp:1003-1008)
term-for-term; the oracle below transcribes those expressions independently
in numpy for comparison.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tol_tpu.config import GRAVITY as g, RHO as rho
from tol_tpu.io.params import assets_root, load_aircraft
from tol_tpu.models.dynamics import state_derivatives

AC = load_aircraft("tempest", assets_root())


def reference_derivatives(z, W, GW, ac):
    """Independent numpy transcription of src/problem.cpp:1003-1008.

    W = (Wx, Wy, Wz) NED; GW[i][j] = dW_i/dp_j NED.
    """
    _, _, _, Va, gam, chi, phi, CL, dphi, dCL, T = z
    Wx, Wy, Wz = W
    dWx_dx, dWx_dy, dWx_dz = GW[0]
    dWy_dx, dWy_dy, dWy_dz = GW[1]
    dWz_dx, dWz_dy, dWz_dz = GW[2]
    cg, sg, cc, sc = np.cos(gam), np.sin(gam), np.cos(chi), np.sin(chi)

    dx0 = Wx + Va * cc * cg
    dx1 = Wy + Va * cg * sc
    dx2 = Wz - Va * sg
    dx3 = (T / ac.mm
           - (Wy + Va * cg * sc) * (dWx_dy * cc * cg - dWz_dy * sg + dWy_dy * cg * sc)
           - (Wz - Va * sg) * (dWx_dz * cc * cg - dWz_dz * sg + dWy_dz * cg * sc)
           - (Wx + Va * cc * cg) * (dWx_dx * cc * cg - dWz_dx * sg + dWy_dx * cg * sc)
           - g * sg
           - (rho * ac.SS * Va * Va * (ac.Cd0 + CL * CL / (ac.AR * np.pi * ac.ee))) / (2.0 * ac.mm))
    dx4 = ((Wx + Va * cc * cg) * (dWz_dx * cg + dWx_dx * cc * sg + dWy_dx * sc * sg)
           + (Wy + Va * cg * sc) * (dWz_dy * cg + dWx_dy * cc * sg + dWy_dy * sc * sg)
           + (Wz - Va * sg) * (dWz_dz * cg + dWx_dz * cc * sg + dWy_dz * sc * sg)
           - g * cg + (CL * rho * ac.SS * Va * Va * np.cos(phi)) / (2 * ac.mm)) / Va
    dx5 = -((Wz - Va * sg) * (dWy_dz * cc - dWx_dz * sc)
            + (dWy_dx * cc - dWx_dx * sc) * (Wx + Va * cc * cg)
            + (Wy + Va * cg * sc) * (dWy_dy * cc - dWx_dy * sc)
            - (CL * rho * ac.SS * Va * Va * np.sin(phi)) / (2.0 * ac.mm)) / (Va * cg)
    return np.array([dx0, dx1, dx2, dx3, dx4, dx5, dphi, dCL])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_reference_expansion(seed):
    rng = np.random.default_rng(seed)
    z = np.array([
        rng.uniform(-200, 200), rng.uniform(-200, 200), rng.uniform(-100, 0),
        rng.uniform(8, 25),            # Va
        rng.uniform(-0.3, 0.3),        # gam
        rng.uniform(-6, 6),            # chi
        rng.uniform(-0.3, 0.3),        # phi
        rng.uniform(0.1, 0.9),         # CL
        rng.uniform(-0.3, 0.3),        # dphi
        rng.uniform(-0.3, 0.3),        # dCL
        rng.uniform(0, 20),            # T
    ])
    W = rng.uniform(-5, 5, 3)
    GW = rng.uniform(-0.5, 0.5, (3, 3))
    ours = state_derivatives(jnp.asarray(z), jnp.asarray(W), jnp.asarray(GW), AC)
    theirs = reference_derivatives(z, W, GW, AC)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-12, atol=1e-12)


def test_jacobian_matches_finite_differences():
    z = jnp.array([10.0, -5.0, -50.0, 15.0, 0.1, 2.3, 0.2, 0.6, 0.05, -0.02, 8.0])
    W = jnp.array([1.0, -2.0, 0.5])
    GW = jnp.array([[0.1, -0.2, 0.3], [0.0, 0.05, -0.1], [0.2, 0.0, 0.04]])
    J = jax.jacfwd(lambda zz: state_derivatives(zz, W, GW, AC))(z)
    eps = 1e-6
    for j in range(11):
        dz = jnp.zeros(11).at[j].set(eps)
        fd = (state_derivatives(z + dz, W, GW, AC)
              - state_derivatives(z - dz, W, GW, AC)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, j]), np.asarray(fd),
                                   rtol=1e-5, atol=1e-6)
