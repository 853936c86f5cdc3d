"""Chain-backend unit tests against a dense oracle (no NLP assembly).

Complements tests/test_kkt_backends.py (which exercises the backends
through the full condensed-KKT path): these check the raw block-
tridiagonal factor/solve pairs, including the Pallas batch rules in
interpret mode and the identity-block padding edge cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tol_tpu.ops.crkern import crp_factor, crp_pad_rhs, crp_solve
from tol_tpu.ops.spike import spike_factor, spike_solve


def _chain(rng, N, b, m):
    A = rng.standard_normal((N, b, b))
    M = A @ np.swapaxes(A, 1, 2) + 5.0 * np.eye(b)
    O = 0.3 * rng.standard_normal((N, b, b))
    O[-1] = 0.0
    F = rng.standard_normal((N, b, m))
    D = np.zeros((N * b, N * b))
    for i in range(N):
        D[i * b:(i + 1) * b, i * b:(i + 1) * b] = M[i]
        if i + 1 < N:
            D[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = O[i]
            D[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = O[i].T
    X = np.linalg.solve(D, F.reshape(N * b, m))
    return M, O, F, X


@pytest.mark.parametrize("N,b", [(10, 5), (13, 4), (3, 2)])
def test_crp_matches_dense_unbatched(N, b):
    rng = np.random.default_rng(0)
    M, O, F, Xd = _chain(rng, N, b, 3)
    npad = 1
    while npad < N:
        npad *= 2
    lv, ri = crp_factor(jnp.asarray(M), jnp.asarray(O))
    Xs = np.asarray(crp_solve(lv, ri,
                              crp_pad_rhs(jnp.asarray(F), npad)))[:N]
    err = np.max(np.abs(Xs.reshape(N * b, 3) - Xd))
    assert err < 1e-8 * max(1.0, np.max(np.abs(Xd)))


def test_crp_batched_kernel_path():
    """B=128 triggers the Pallas level kernels (interpret mode on CPU);
    every lane must agree with the dense oracle bit-for-bit across
    lanes."""
    rng = np.random.default_rng(1)
    N, b, m, B = 10, 4, 2, 128
    M, O, F, Xd = _chain(rng, N, b, m)
    npad = 16
    Mb = jnp.asarray(np.repeat(M[None], B, 0))
    Ob = jnp.asarray(np.repeat(O[None], B, 0))
    Fb = jnp.asarray(np.repeat(F[None], B, 0))

    def one(M, O, F):
        lv, ri = crp_factor(M, O)
        return crp_solve(lv, ri, crp_pad_rhs(F, npad))[:N]

    Xb = np.asarray(jax.vmap(one)(Mb, Ob, Fb))
    assert np.max(np.abs(Xb - Xb[0:1])) == 0.0
    err = np.max(np.abs(Xb[0].reshape(N * b, m) - Xd))
    assert err < 1e-8 * max(1.0, np.max(np.abs(Xd)))


@pytest.mark.parametrize("N,b,L", [(10, 5, 4), (7, 3, 10), (16, 4, 4)])
def test_spike_matches_dense(N, b, L):
    rng = np.random.default_rng(2)
    M, O, F, Xd = _chain(rng, N, b, 3)
    fac = spike_factor(jnp.asarray(M), jnp.asarray(O), L=L)
    Xs = np.asarray(spike_solve(fac, jnp.asarray(F)))
    err = np.max(np.abs(Xs.reshape(N * b, 3) - Xd))
    assert err < 1e-8 * max(1.0, np.max(np.abs(Xd)))


@pytest.mark.parametrize("N,b", [(10, 5), (13, 4)])
def test_crp_factor_solve_fused_unbatched(N, b):
    """The fused factor+forward path (round 5) returns the same solution
    and a factor reusable by crp_solve."""
    from tol_tpu.ops.crkern import crp_factor_solve

    rng = np.random.default_rng(2)
    M, O, F, Xd = _chain(rng, N, b, 3)
    npad = 1
    while npad < N:
        npad *= 2
    lv, ri, X = crp_factor_solve(jnp.asarray(M), jnp.asarray(O),
                                 jnp.asarray(F))
    err = np.max(np.abs(np.asarray(X)[:N].reshape(N * b, 3) - Xd))
    assert err < 1e-8 * max(1.0, np.max(np.abs(Xd)))
    # factor reuse: a second rhs solved through crp_solve
    F2 = rng.standard_normal((N, b, 2))
    X2 = np.asarray(crp_solve(lv, ri, crp_pad_rhs(jnp.asarray(F2),
                                                  npad)))[:N]
    lv0, ri0 = crp_factor(jnp.asarray(M), jnp.asarray(O))
    X2_ref = np.asarray(crp_solve(lv0, ri0,
                                  crp_pad_rhs(jnp.asarray(F2), npad)))[:N]
    assert np.max(np.abs(X2 - X2_ref)) < 1e-12


def test_crp_factor_solve_fused_batched_kernel_path():
    """B=128 drives the fused Pallas level kernel; agreement with the
    dense oracle and lane-identical outputs."""
    from tol_tpu.ops.crkern import crp_factor_solve

    rng = np.random.default_rng(3)
    N, b, m, B = 10, 4, 2, 128
    M, O, F, Xd = _chain(rng, N, b, m)
    Mb = jnp.asarray(np.repeat(M[None], B, 0))
    Ob = jnp.asarray(np.repeat(O[None], B, 0))
    Fb = jnp.asarray(np.repeat(F[None], B, 0))

    def one(M, O, F):
        lv, ri, X = crp_factor_solve(M, O, F)
        return X[:N]

    Xb = np.asarray(jax.vmap(one)(Mb, Ob, Fb))
    assert np.max(np.abs(Xb - Xb[0:1])) == 0.0
    err = np.max(np.abs(Xb[0].reshape(N * b, m) - Xd))
    assert err < 1e-8 * max(1.0, np.max(np.abs(Xd)))
