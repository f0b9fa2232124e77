"""JUKF tests: agreement with the sigma-point UKF on a linear system."""
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.jukf import JUKF
from dair_pll_tpu.ukf import ManifoldUKF


def build_linear_filters(d=3):
    A = jnp.asarray(np.diag([1.0, 0.95, 1.05]) +
                    0.1 * np.triu(np.ones((d, d)), 1))
    Q = jnp.asarray(0.01 * np.eye(d))
    R = jnp.asarray(0.1 * np.eye(d))

    def f(state, omega, w, dt):
        del omega, dt
        return A @ state + w

    def h(state):
        return state

    add = lambda x, xi: x + xi
    sub = lambda x1, x2: x2 - x1

    ukf = ManifoldUKF(f=f, h=h, phi=add, phi_inv=sub, Q=Q, R=R,
                      alpha=(1.0, 1.0, 1.0), d=d)
    jukf = JUKF(f=f, h=h, phi=add, Q=Q,
                alpha=(1.0, 1.0, 1.0, 1.0, 1.0), d=d,
                red_idxs=tuple(range(d)), red_phi=add, red_phi_inv=sub,
                up_idxs=tuple(range(d)), up_phi=add)
    return ukf, jukf, A, Q, R


def test_jukf_matches_ukf_linear(rng):
    ukf, jukf, A, Q, R = build_linear_filters()
    d = 3
    state_u = jnp.asarray([1.0, -0.5, 0.2])
    state_j = state_u
    P_u = P_j = jnp.eye(d)

    for _ in range(5):
        y = jnp.asarray(rng.standard_normal(d))
        state_u, P_u = ukf.step(state_u, P_u, None, y, 0.1)
        state_j, P_j = jukf.step(state_j, P_j, None, y, jnp.asarray(R),
                                 0.1)
        np.testing.assert_allclose(np.asarray(state_j),
                                   np.asarray(state_u), atol=1e-6)
        np.testing.assert_allclose(np.asarray(P_j), np.asarray(P_u),
                                   atol=1e-5)


def test_jukf_reduced_propagation(rng):
    """With red_idxs restricted to a subset, F is identity elsewhere."""
    _, jukf, A, Q, R = build_linear_filters()
    def red_phi(x, xi):
        # reduced retraction: perturb only coordinates (0, 1)
        return x.at[:2].add(xi)

    def red_phi_inv(x1, x2):
        return (x2 - x1)[:2]

    jukf_reduced = JUKF(
        f=jukf.f, h=jukf.h, phi=jukf.phi, Q=jukf.Q, alpha=jukf.alpha,
        d=3, red_idxs=(0, 1), red_phi=red_phi,
        red_phi_inv=red_phi_inv, up_idxs=(0, 1, 2),
        up_phi=jukf.up_phi)
    state = jnp.asarray([1.0, -0.5, 0.2])
    P = jnp.eye(3)
    new_state, new_P = jukf_reduced.propagation(state, P, None, 0.1)
    assert np.all(np.isfinite(np.asarray(new_P)))
    # propagated mean is the full dynamics regardless of reduction
    np.testing.assert_allclose(np.asarray(new_state),
                               np.asarray(jukf.f(state, None,
                                                 jnp.zeros(3), 0.1)),
                               atol=1e-12)
