"""Unrolled small-matrix Cholesky tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.ops.linear import (cho_solve_unrolled, cholesky_unrolled,
                                     spd_solve)


def random_spd(rng, n, batch=None):
    shape = (batch, n, n) if batch else (n, n)
    A = rng.standard_normal(shape)
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))


def test_cholesky_matches_lax(rng):
    for n in (3, 6, 7, 12):
        M = random_spd(rng, n)
        L = cholesky_unrolled(M)
        np.testing.assert_allclose(np.asarray(L),
                                   np.linalg.cholesky(np.asarray(M)),
                                   atol=1e-9)


def test_solve_vector_and_matrix(rng):
    n = 6
    M = random_spd(rng, n)
    b = jnp.asarray(rng.standard_normal(n))
    x = spd_solve(M, b)
    np.testing.assert_allclose(np.asarray(M @ x), np.asarray(b),
                               atol=1e-9)
    B = jnp.asarray(rng.standard_normal((n, 4)))
    X = cho_solve_unrolled(cholesky_unrolled(M), B)
    np.testing.assert_allclose(np.asarray(M @ X), np.asarray(B),
                               atol=1e-9)


def test_batched_vmap(rng):
    n = 7
    M = random_spd(rng, n, batch=16)
    b = jnp.asarray(rng.standard_normal((16, n)))
    x = jax.vmap(spd_solve)(M, b)
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", np.asarray(M), np.asarray(x)),
        np.asarray(b), atol=1e-8)


def test_gradients(rng):
    n = 6
    M = random_spd(rng, n)
    b = jnp.asarray(rng.standard_normal(n))

    def loss(M):
        return jnp.sum(spd_solve(M, b) ** 2)

    g = jax.grad(loss)(M)
    # finite difference check on a few entries
    eps = 1e-6
    for (i, j) in ((0, 0), (2, 3), (5, 5)):
        dM = np.zeros((n, n))
        dM[i, j] = eps
        fd = (loss(M + dM) - loss(M - dM)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=1e-4)
