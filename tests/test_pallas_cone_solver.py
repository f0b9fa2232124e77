"""Pallas cone-solver kernel vs the lax reference solver (interpreter
mode on CPU; the compiled path runs on TPU via bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.ops.cone_solver import solve_cone_qp
from dair_pll_tpu.ops.pallas_cone_solver import (solve_cone_qp_pallas,
                                                 solve_contact_impulse_pallas)


def random_batch(rng, batch, k):
    n = 3 * k
    A = rng.standard_normal((batch, n, n))
    Q = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(n)
    q = rng.standard_normal((batch, n)) * 2
    return jnp.asarray(Q, jnp.float32), jnp.asarray(q, jnp.float32)


def test_matches_lax_solver(rng):
    k = 4
    Q, q = random_batch(rng, 8, k)
    x_pallas = solve_cone_qp_pallas(Q, q, 300, True)
    x_lax = jax.vmap(lambda Qi, qi: solve_cone_qp(Qi, qi, 300))(Q, q)
    np.testing.assert_allclose(np.asarray(x_pallas), np.asarray(x_lax),
                               atol=2e-4, rtol=1e-3)


def test_kkt_conditions(rng):
    k = 2
    Q, q = random_batch(rng, 4, k)
    x = np.asarray(solve_cone_qp_pallas(Q, q, 500, True))
    s = np.einsum("bij,bj->bi", np.asarray(Q), x) + np.asarray(q)
    for b in range(4):
        nrm = np.linalg.norm(x[b, k:].reshape(k, 2), axis=-1)
        assert np.all(nrm - x[b, :k] < 1e-4)
        assert abs(float(x[b] @ s[b])) < 1e-3


def test_batch_padding(rng):
    """Batch sizes that are not tile multiples are padded internally."""
    k = 1
    Q, q = random_batch(rng, 5, k)
    x = solve_cone_qp_pallas(Q, q, 200, True)
    assert x.shape == (5, 3)
    x_lax = jax.vmap(lambda Qi, qi: solve_cone_qp(Qi, qi, 200))(Q, q)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_lax),
                               atol=2e-4, rtol=1e-3)


def test_failure_masking(rng):
    k = 1
    D = jnp.broadcast_to(jnp.full((3, 3), jnp.nan, jnp.float32),
                         (2, 3, 3))
    qv = jnp.ones((2, 3), jnp.float32)
    impulse, valid = solve_contact_impulse_pallas(
        D, qv, jnp.float32(1e-4), 100, True)
    assert not bool(valid[0])
    np.testing.assert_allclose(np.asarray(impulse), 0.0)
