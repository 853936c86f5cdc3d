"""Unrolled small-matrix algebra vs jnp.linalg (ops/smallalg.py)."""

import numpy as np
import jax.numpy as jnp

from tol_tpu.ops.smallalg import chol_unrolled, spd_inverse, spd_solve, tri_solve_unrolled


def _spd(rng, b, n):
    A = rng.normal(size=(b, n, n))
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))


def test_chol_matches_linalg():
    rng = np.random.default_rng(0)
    A = _spd(rng, 5, 11)
    L = chol_unrolled(A)
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(np.asarray(A)),
                               rtol=1e-10, atol=1e-10)


def test_tri_solves():
    rng = np.random.default_rng(1)
    A = _spd(rng, 4, 13)
    L = np.linalg.cholesky(np.asarray(A))
    B = rng.normal(size=(4, 13, 7))
    X = tri_solve_unrolled(jnp.asarray(L), jnp.asarray(B), lower=True)
    np.testing.assert_allclose(np.asarray(np.einsum("bij,bjk->bik", L, np.asarray(X))),
                               B, rtol=1e-9, atol=1e-9)
    Xt = tri_solve_unrolled(jnp.asarray(L), jnp.asarray(B), lower=True, trans=True)
    np.testing.assert_allclose(
        np.einsum("bji,bjk->bik", L, np.asarray(Xt)), B, rtol=1e-9, atol=1e-9)


def test_spd_solve_and_inverse():
    rng = np.random.default_rng(2)
    A = _spd(rng, 3, 11)
    B = jnp.asarray(rng.normal(size=(3, 11, 4)))
    X = spd_solve(A, B)
    np.testing.assert_allclose(np.einsum("bij,bjk->bik", np.asarray(A), np.asarray(X)),
                               np.asarray(B), rtol=1e-8, atol=1e-8)
    Ainv = spd_inverse(A)
    np.testing.assert_allclose(np.einsum("bij,bjk->bik", np.asarray(A), np.asarray(Ainv)),
                               np.broadcast_to(np.eye(11), (3, 11, 11)),
                               rtol=1e-8, atol=1e-8)


def test_chol_nan_signals_indefinite():
    A = jnp.asarray(np.diag([1.0, -1.0, 2.0])[None])
    L = chol_unrolled(A)
    assert np.isnan(np.asarray(L)).any()
