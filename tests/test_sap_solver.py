"""SAP-Newton solver tests vs the APGD reference solver."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.ops.cone_solver import solve_cone_qp
from dair_pll_tpu.ops.sap_solver import (solve_cone_qp_sap,
                                         solve_contact_impulse_sap)


def random_problem(rng, n_v=6, k=4):
    """Well-conditioned contact-like problem M, J, q."""
    A = rng.standard_normal((n_v, n_v))
    M = A @ A.T + n_v * np.eye(n_v)
    J = rng.standard_normal((3 * k, n_v))
    q = rng.standard_normal(3 * k)
    return (jnp.asarray(M), jnp.asarray(J), jnp.asarray(q))


def dual_cost(Q, q, x):
    return 0.5 * x @ Q @ x + q @ x


def test_matches_apgd_ground_truth(rng):
    eps = 1e-2
    for _ in range(8):
        M, J, q = random_problem(rng)
        Q = J @ jnp.linalg.solve(M, J.T) + eps * jnp.eye(q.shape[0])
        x_gt = solve_cone_qp(Q, q, 4000)
        x_sap = solve_cone_qp_sap(M, J, q, eps, 15)
        f_gt = float(dual_cost(Q, q, x_gt))
        f_sap = float(dual_cost(Q, q, x_sap))
        # suboptimality relative to problem scale
        assert f_sap - f_gt <= 1e-6 * (abs(f_gt) + 1.0)


def test_no_contact_active(rng):
    """q in the cone => zero impulse."""
    M, J, _ = random_problem(rng, k=2)
    k = 2
    q = jnp.concatenate((jnp.full((k,), 5.0),
                         0.1 * jnp.asarray(rng.standard_normal(2 * k))))
    x = solve_cone_qp_sap(M, J, q, 1e-2, 10)
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-10)


def test_failure_masking():
    M = jnp.eye(6)
    J = jnp.full((12, 6), jnp.nan)
    q = jnp.ones(12)
    impulse, valid = solve_contact_impulse_sap(M, J, q, 1e-3, 5)
    assert not bool(valid)
    np.testing.assert_allclose(np.asarray(impulse), 0.0)


def test_vmap_jit(rng):
    eps = 1e-2
    Ms, Js, qs = [], [], []
    for _ in range(4):
        M, J, q = random_problem(rng, k=2)
        Ms.append(M), Js.append(J), qs.append(q)
    f = jax.jit(jax.vmap(lambda M, J, q: solve_cone_qp_sap(
        M, J, q, eps, 12)))
    out = f(jnp.stack(Ms), jnp.stack(Js), jnp.stack(qs))
    assert out.shape == (4, 6)
    assert np.all(np.isfinite(np.asarray(out)))
