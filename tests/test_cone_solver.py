"""Cone-QP solver tests: KKT residuals and IFT gradients (SURVEY.md §4c)."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.ops.cone_solver import solve_cone_qp, solve_contact_impulse
from dair_pll_tpu.ops.tensor import project_lorentz


def random_qp(rng, k):
    n = 3 * k
    A = rng.standard_normal((n, n))
    Q = A @ A.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n) * 2
    return jnp.asarray(Q), jnp.asarray(q)


def cone_violation(v, k):
    n = np.asarray(v[:k])
    t = np.asarray(v[k:]).reshape(k, 2)
    return np.maximum(np.linalg.norm(t, axis=-1) - n, 0).max()


def test_kkt_conditions(rng):
    """Solution satisfies the dual QCQP KKT conditions (reference
    multibody_learnable_system.py:217-249): x in FC, Qx + q in FC
    (self-dual), complementarity x . (Qx + q) = 0."""
    k = 4
    for _ in range(10):
        Q, q = random_qp(rng, k)
        x = solve_cone_qp(Q, q, 400)
        s = Q @ x + q
        assert cone_violation(x, k) < 1e-7
        assert cone_violation(s, k) < 1e-5
        assert abs(float(x @ s)) < 1e-5


def test_interior_solution_matches_unconstrained(rng):
    """When the unconstrained optimum is strictly inside the cone, the
    solver must return it."""
    k = 2
    n = 3 * k
    A = rng.standard_normal((n, n))
    Q = jnp.asarray(A @ A.T + 1.0 * np.eye(n))
    # pick x* strictly inside: normals 2, tangents small
    x_star = jnp.concatenate((jnp.full((k,), 2.0),
                              0.1 * jnp.asarray(rng.standard_normal(2 * k))))
    q = -(Q @ x_star)
    x = solve_cone_qp(Q, q, 600)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_star), atol=1e-6)


def test_ift_gradient_matches_finite_differences(rng):
    k = 3
    n = 3 * k
    Q, q = random_qp(rng, k)
    weights = jnp.arange(1.0, n + 1)

    def loss(Qj, qj):
        return jnp.sum(solve_cone_qp(Qj, qj, 400) * weights)

    g_q = jax.grad(loss, argnums=1)(Q, q)
    eps = 1e-6
    for i in range(n):
        dq = np.zeros(n)
        dq[i] = eps
        fd = (loss(Q, q + dq) - loss(Q, q - dq)) / (2 * eps)
        np.testing.assert_allclose(float(g_q[i]), float(fd), rtol=1e-4,
                                   atol=1e-7)


def test_failure_masking():
    """Non-finite problems produce zero impulse and valid=False
    (reference multibody_learnable_system.py:186-192)."""
    k = 1
    D = jnp.full((3, 3), jnp.nan)
    q = jnp.ones((3,))
    impulse, valid = solve_contact_impulse(D, q, jnp.asarray(1e-4))
    assert not bool(valid)
    np.testing.assert_allclose(np.asarray(impulse), 0.0)


def test_projection_idempotent(rng):
    v = jnp.asarray(rng.standard_normal((16, 12)))
    p1 = project_lorentz(v)
    p2 = project_lorentz(p1)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-12)


def test_batched_vmap(rng):
    k = 4
    Qs, qs = [], []
    for _ in range(8):
        Q, q = random_qp(rng, k)
        Qs.append(Q)
        qs.append(q)
    Qb, qb = jnp.stack(Qs), jnp.stack(qs)
    xb = jax.jit(jax.vmap(lambda Q, q: solve_cone_qp(Q, q, 400)))(Qb, qb)
    for i in range(8):
        x_single = solve_cone_qp(Qb[i], qb[i], 400)
        np.testing.assert_allclose(np.asarray(xb[i]),
                                   np.asarray(x_single), atol=1e-10)
