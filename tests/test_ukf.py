"""Manifold UKF tests: linear-system agreement with a standard KF and
filtering convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.state_space import FloatingBaseSpace
from dair_pll_tpu.ukf import ManifoldUKF, state_space_retractions


def test_linear_system_matches_kalman(rng):
    """On a Euclidean linear system the UKF must match the exact KF."""
    d = 2
    A = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
    Q = 0.01 * np.eye(d)
    R = 0.1 * np.eye(d)

    def f(state, omega, w, dt):
        del omega, dt
        return A @ state + w

    def h(state):
        return state

    ukf = ManifoldUKF(
        f=f, h=h, phi=lambda x, xi: x + xi,
        phi_inv=lambda x1, x2: x2 - x1,
        Q=jnp.asarray(Q), R=jnp.asarray(R), alpha=(1.0, 1.0, 1.0), d=d)

    state = jnp.asarray([1.0, 0.0])
    P = jnp.eye(d)

    # exact Kalman reference
    kf_x = np.array([1.0, 0.0])
    kf_P = np.eye(d)

    for step in range(5):
        y = jnp.asarray(rng.standard_normal(d))
        state, P = ukf.step(state, P, None, y, 0.1)

        An = np.asarray(A)
        kf_x = An @ kf_x
        kf_P = An @ kf_P @ An.T + Q
        S = kf_P + R
        K = kf_P @ np.linalg.inv(S)
        kf_x = kf_x + K @ (np.asarray(y) - kf_x)
        kf_P = kf_P - K @ S @ K.T

        np.testing.assert_allclose(np.asarray(state), kf_x, atol=1e-6)
        np.testing.assert_allclose(np.asarray(P), kf_P, atol=1e-5)


def test_manifold_filtering_reduces_noise(rng):
    """Filtering a noisy constant-velocity floating-base trajectory gets
    closer to the truth than the raw measurements."""
    space = FloatingBaseSpace(0)
    dt = 0.01
    phi, phi_inv = state_space_retractions(space)
    d = 2 * space.n_v

    def f(state, omega, w, dt_inner):
        del omega
        q, v = space.q_v(state)
        q_next = space.euler_step(q, v, dt_inner)
        return phi(space.x(q_next, v), w)

    zero = space.zero_state(jnp.float64)

    def h(state):
        return space.state_difference(zero, state)

    ukf = ManifoldUKF(
        f=f, h=h, phi=phi, phi_inv=phi_inv,
        Q=jnp.asarray(1e-8 * np.eye(d)),
        R=jnp.asarray(1e-2 * np.eye(d)),
        alpha=(0.1, 0.1, 0.1), d=d)

    # ground truth: constant velocity flight
    v_true = jnp.asarray([0.5, -0.3, 0.2, 1.0, 0.5, -0.2])
    x = space.x(space.q(zero), v_true)
    truth = [x]
    for _ in range(30):
        q_next = space.euler_step(space.q(truth[-1]), v_true, dt)
        truth.append(space.x(q_next, v_true))
    truth = jnp.stack(truth)

    noise = 0.05 * rng.standard_normal((31, d))
    noisy = jax.vmap(space.shift_state)(truth, jnp.asarray(noise))

    # run the scan-based filter over measurements
    ys = jax.vmap(h)(noisy[1:])
    states, _ = ukf.filter_trajectory(
        noisy[0], jnp.asarray(0.01 * np.eye(d)),
        jnp.zeros((30, 1)), ys, dt)

    err_filtered = float(jnp.mean(
        space.state_square_error(states[10:], truth[1:][10:])))
    err_raw = float(jnp.mean(
        space.state_square_error(noisy[1:][10:], truth[1:][10:])))
    assert err_filtered < err_raw
