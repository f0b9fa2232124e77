"""Property tests for quaternion ops (inverse pairs per SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.ops import quaternion as quat


def random_unit_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_multiply_inverse_is_identity(rng):
    q = jnp.asarray(random_unit_quats(rng, 64))
    prod = quat.multiply(q, quat.inverse(q))
    expected = jnp.zeros_like(prod).at[..., 0].set(1.0)
    np.testing.assert_allclose(prod, expected, atol=1e-12)


def test_exp_log_roundtrip(rng):
    r = jnp.asarray(rng.standard_normal((128, 3)))
    np.testing.assert_allclose(quat.log(quat.exp(r)), r, atol=1e-9)


def test_log_exp_roundtrip(rng):
    q = jnp.asarray(random_unit_quats(rng, 128))
    # log maps to rotation vector with angle in [0, 2pi); canonicalize to
    # positive scalar part so the roundtrip is well-defined.
    q = q * np.sign(q[..., 0:1])
    np.testing.assert_allclose(quat.exp(quat.log(q)), q, atol=1e-9)


def test_exp_at_zero_and_gradients():
    r0 = jnp.zeros((3,))
    q0 = quat.exp(r0)
    np.testing.assert_allclose(q0, jnp.array([1.0, 0, 0, 0]), atol=1e-15)
    jac = jax.jacobian(quat.exp)(r0)
    assert np.all(np.isfinite(jac))
    # d q_xyz / d r at 0 is I/2.
    np.testing.assert_allclose(jac[1:, :], 0.5 * np.eye(3), atol=1e-9)
    jac_log = jax.jacobian(quat.log)(q0)
    assert np.all(np.isfinite(jac_log))


def test_rotate_matches_matrix(rng):
    q = jnp.asarray(random_unit_quats(rng, 32))
    p = jnp.asarray(rng.standard_normal((32, 3)))
    R = quat.to_rotation_matrix(q)
    np.testing.assert_allclose(
        quat.rotate(q, p), jnp.einsum("bij,bj->bi", R, p), atol=1e-12)


def test_rotation_matrix_roundtrip(rng):
    q = jnp.asarray(random_unit_quats(rng, 64))
    q = q * np.sign(q[..., 0:1])
    R = quat.to_rotation_matrix(q)
    np.testing.assert_allclose(quat.from_rotation_matrix(R), q, atol=1e-7)


def test_rotation_matrix_special_cases():
    # 180-degree rotations exercise every Shepperd branch.
    for axis in range(3):
        r = np.zeros(3)
        r[axis] = np.pi
        q = quat.exp(jnp.asarray(r))
        R = quat.to_rotation_matrix(q)
        q2 = quat.from_rotation_matrix(R)
        R2 = quat.to_rotation_matrix(q2)
        np.testing.assert_allclose(R, R2, atol=1e-9)


def test_vmap_jit_consistency(rng):
    q = jnp.asarray(random_unit_quats(rng, 16))
    p = jnp.asarray(rng.standard_normal((16, 3)))
    direct = quat.rotate(q, p)
    vmapped = jax.jit(jax.vmap(quat.rotate))(q, p)
    np.testing.assert_allclose(direct, vmapped, atol=1e-12)


def test_sinc():
    x = jnp.array([0.0, 1e-9, 0.5, np.pi])
    expected = np.array([1.0, 1.0, np.sin(0.5) / 0.5, np.sin(np.pi) / np.pi])
    np.testing.assert_allclose(quat.sinc(x), expected, atol=1e-12)
    g = jax.grad(lambda v: quat.sinc(v))(0.0)
    assert np.isfinite(g) and abs(g) < 1e-6
