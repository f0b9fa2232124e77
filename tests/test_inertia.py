"""Property tests for inertial reparameterizations (SURVEY.md §4 inverse
pairs; reference inertia.py:206-302)."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu import inertia


def random_theta(rng, n):
    # Moderate values keep exp() terms well-conditioned.
    return jnp.asarray(rng.uniform(-0.5, 0.5, (n, 10)))


def test_theta_pi_o_roundtrip(rng):
    theta = random_theta(rng, 64)
    pi_o = inertia.theta_to_pi_o(theta)
    theta2 = inertia.pi_o_to_theta(pi_o)
    np.testing.assert_allclose(theta2, theta, atol=1e-9)


def test_pi_o_pi_cm_roundtrip(rng):
    theta = random_theta(rng, 32)
    pi_o = inertia.theta_to_pi_o(theta)
    pi_cm = inertia.pi_o_to_pi_cm(pi_o)
    np.testing.assert_allclose(
        inertia.pi_cm_to_pi_o(pi_cm), pi_o, atol=1e-9)


def test_cube_ground_truth_roundtrip():
    # Cube from assets/contactnets_cube.urdf: m=0.37, I=8.1e-4 diag, com=0.
    pi_cm = jnp.array([0.37, 0, 0, 0, 8.1e-4, 8.1e-4, 8.1e-4, 0, 0, 0])
    theta = inertia.pi_cm_to_theta(pi_cm)
    assert np.all(np.isfinite(theta))
    np.testing.assert_allclose(
        inertia.theta_to_pi_cm(theta), pi_cm, atol=1e-12)


def test_matrix_vector_roundtrip(rng):
    vec = jnp.asarray(rng.standard_normal((8, 6)))
    mat = inertia.inertia_matrix_from_vector(vec)
    assert np.allclose(mat, np.swapaxes(mat, -1, -2))
    np.testing.assert_allclose(
        inertia.inertia_vector_from_matrix(mat), vec, atol=1e-12)
    # spot-check placement
    single = inertia.inertia_matrix_from_vector(
        jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]))
    expected = np.array([[1, 4, 5], [4, 2, 6], [5, 6, 3.0]])
    np.testing.assert_allclose(single, expected)


def test_parallel_axis_theorem(rng):
    m = jnp.asarray(rng.uniform(0.1, 2.0, (4,)))
    d = jnp.asarray(rng.standard_normal((4, 3)))
    I_cm = jnp.eye(3) * jnp.asarray(rng.uniform(1.0, 2.0, (4, 1, 1)))
    I_o = inertia.parallel_axis_theorem(I_cm, m, d, Ba_is_Bcm=True)
    back = inertia.parallel_axis_theorem(I_o, m, d, Ba_is_Bcm=False)
    np.testing.assert_allclose(back, I_cm, atol=1e-12)


def test_theta_always_valid(rng):
    """Any theta yields positive mass and PD rotational inertia."""
    theta = jnp.asarray(rng.standard_normal((64, 10)))
    pi_cm = inertia.theta_to_pi_cm(theta)
    assert np.all(pi_cm[:, 0] > 0)
    I_mat = inertia.inertia_matrix_from_vector(pi_cm[:, 4:])
    eigs = np.linalg.eigvalsh(I_mat)
    assert np.all(eigs > 0)


def test_gradients_finite(rng):
    theta = random_theta(rng, 4)

    def loss(t):
        return jnp.sum(inertia.theta_to_pi_cm(t) ** 2)

    g = jax.grad(loss)(theta)
    assert np.all(np.isfinite(g))
