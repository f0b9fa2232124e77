r"""Quaternion-based :math:`SO(3)` operations, TPU-native.

Pure ``jax.numpy`` implementations of batched quaternion algebra. All
functions are jit/vmap-safe: branching in the reference implementation
(boolean-mask updates in ``/root/reference/dair_pll/quaternion.py:224-229,
269-272``) is replaced by branchless ``jnp.where`` forms with the
"double-where" trick so gradients are NaN-free at the singular points.

Quaternions use scalar-first ``[w, x, y, z]`` layout, matching the reference
(``quaternion.py:94-104``) and the on-disk cube-toss dataset.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "inverse",
    "multiply",
    "rotate",
    "sinc",
    "log",
    "exp",
    "to_rotation_matrix",
    "from_rotation_matrix",
    "normalize",
]

_EPS_BY_DTYPE = {
    jnp.dtype(jnp.float32): 1e-7,
    jnp.dtype(jnp.float64): 1e-14,
}


def _eps(x: Array) -> float:
    return _EPS_BY_DTYPE.get(jnp.dtype(x.dtype), 1e-7)


def normalize(q: Array) -> Array:
    """Normalizes quaternion batch to unit norm.

    Args:
        q: ``(*, 4)`` quaternion batch.

    Returns:
        ``(*, 4)`` unit quaternion batch.
    """
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def inverse(q: Array) -> Array:
    """Quaternion inverse (conjugate for unit quaternions).

    Mirrors reference ``quaternion.py:55-86``.

    Args:
        q: ``(*, 4)`` quaternion batch.

    Returns:
        ``(*, 4)`` inverse quaternion batch.
    """
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def multiply(q: Array, r: Array) -> Array:
    r"""Hamilton product of two quaternion batches.

    Mirrors reference ``quaternion.py:89-121``.

    Args:
        q: ``(*, 4)`` left factor.
        r: ``(*, 4)`` right factor.

    Returns:
        ``(*, 4)`` product ``q * r``.
    """
    q_w, q_xyz = q[..., :1], q[..., 1:]
    r_w, r_xyz = r[..., :1], r[..., 1:]
    qr_w = q_w * r_w - jnp.sum(q_xyz * r_xyz, axis=-1, keepdims=True)
    qr_xyz = q_w * r_xyz + r_w * q_xyz + jnp.cross(q_xyz, r_xyz)
    return jnp.concatenate((qr_w, qr_xyz), axis=-1)


def rotate(q: Array, p: Array) -> Array:
    r"""Rotates vector batch ``p`` by quaternion batch ``q``.

    Mirrors reference ``quaternion.py:150-180``.

    Args:
        q: ``(*, 4)`` quaternion batch.
        p: ``(*, 3)`` vector batch.

    Returns:
        ``(*, 3)`` rotated vectors.
    """
    q_w, q_xyz = q[..., :1], q[..., 1:]
    c1 = jnp.cross(q_xyz, p)
    c2 = jnp.cross(q_xyz, c1)
    dot = jnp.sum(q_xyz * p, axis=-1, keepdims=True)
    return q_xyz * dot + q_w * (2.0 * c1 + q_w * p) + c2


def sinc(x: Array) -> Array:
    r"""Unnormalized, branchless :math:`\sin(x)/x` with ``sinc(0) = 1``.

    Replaces the masked implementation of reference ``quaternion.py:208-229``
    with a ``jnp.where``-based form safe under jit/vmap/grad.
    """
    eps = _eps(x)
    small = jnp.abs(x) < eps
    x_safe = jnp.where(small, jnp.ones_like(x), x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(x_safe) / x_safe)


def log(q: Array) -> Array:
    r"""Quaternion to rotation-vector (logarithmic coordinates).

    For :math:`q = [\cos(\theta/2), \hat u \sin(\theta/2)]` returns
    :math:`r = \theta \hat u`. Branchless rewrite of reference
    ``quaternion.py:232-273``; at the identity the limit
    :math:`\theta / \sin(\theta/2) \to 2` is used.

    Args:
        q: ``(*, 4)`` quaternion batch.

    Returns:
        ``(*, 3)`` rotation-vector batch.
    """
    cos_half = q[..., 0:1]
    q_xyz = q[..., 1:]
    eps = _eps(q)
    # Safe norm: sqrt has a NaN gradient at 0, so substitute 1 under the
    # sqrt where the vector part vanishes and zero out the value after.
    sin_sq = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)
    small = sin_sq < eps * eps
    sin_half = jnp.sqrt(jnp.where(small, jnp.ones_like(sin_sq), sin_sq))
    sin_half = jnp.where(small, jnp.zeros_like(sin_half), sin_half)
    theta = 2.0 * jnp.arctan2(sin_half, cos_half)
    sin_safe = jnp.where(small, jnp.ones_like(sin_half), sin_half)
    # Near the identity theta/sin(theta/2) -> 2; q_xyz ~ 0 there so the
    # substituted constant only sets the (finite) gradient scale.
    mul = jnp.where(small, jnp.full_like(sin_half, 2.0), theta / sin_safe)
    return q_xyz * mul


def exp(r: Array) -> Array:
    r"""Rotation-vector to quaternion (exponential map).

    For :math:`r = \theta\hat u` returns
    :math:`q = [\cos(\theta/2), \hat u\sin(\theta/2)]`. Uses the safe
    :func:`sinc` so gradients are finite at :math:`r = 0`. Mirrors reference
    ``quaternion.py:276-309``.

    Args:
        r: ``(*, 3)`` rotation-vector batch.

    Returns:
        ``(*, 4)`` quaternion batch.
    """
    sq = jnp.sum(r * r, axis=-1, keepdims=True)
    # Safe norm: sqrt has infinite gradient at 0; substitute 1 inside sqrt
    # where the angle vanishes (sinc and cos are even so the value is exact).
    eps = _eps(r)
    small = sq < eps * eps
    angle = jnp.sqrt(jnp.where(small, jnp.ones_like(sq), sq))
    angle = jnp.where(small, jnp.zeros_like(angle), angle)
    return jnp.concatenate(
        (jnp.cos(angle / 2.0), r * sinc(angle / 2.0) / 2.0), axis=-1)


def to_rotation_matrix(q: Array) -> Array:
    """Quaternion batch to rotation-matrix batch.

    Args:
        q: ``(*, 4)`` quaternion batch (assumed unit norm).

    Returns:
        ``(*, 3, 3)`` rotation matrices ``R`` with ``R @ p_B = rotate(q, p_B)``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack(
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)), axis=-1)
    row1 = jnp.stack(
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)), axis=-1)
    row2 = jnp.stack(
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)), axis=-1)
    return jnp.stack((row0, row1, row2), axis=-2)


def from_rotation_matrix(R: Array) -> Array:
    """Rotation-matrix batch to quaternion batch (branchless Shepperd).

    Evaluates all four Shepperd candidates and selects the best-conditioned
    one with ``jnp.where`` so the function is jit/vmap-safe.

    Args:
        R: ``(*, 3, 3)`` rotation matrices.

    Returns:
        ``(*, 4)`` unit quaternions with non-negative scalar part.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _eps(R)))

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack((
        _safe_sqrt(1.0 + tr),
        (m21 - m12) / _safe_sqrt(1.0 + m00 - m11 - m22),
        (m02 - m20) / _safe_sqrt(1.0 - m00 + m11 - m22),
        (m10 - m01) / _safe_sqrt(1.0 - m00 - m11 + m22),
    ), axis=-1)
    qx = jnp.stack((
        (m21 - m12) / _safe_sqrt(1.0 + tr),
        _safe_sqrt(1.0 + m00 - m11 - m22),
        (m01 + m10) / _safe_sqrt(1.0 - m00 + m11 - m22),
        (m02 + m20) / _safe_sqrt(1.0 - m00 - m11 + m22),
    ), axis=-1)
    qy = jnp.stack((
        (m02 - m20) / _safe_sqrt(1.0 + tr),
        (m01 + m10) / _safe_sqrt(1.0 + m00 - m11 - m22),
        _safe_sqrt(1.0 - m00 + m11 - m22),
        (m12 + m21) / _safe_sqrt(1.0 - m00 - m11 + m22),
    ), axis=-1)
    qz = jnp.stack((
        (m10 - m01) / _safe_sqrt(1.0 + tr),
        (m02 + m20) / _safe_sqrt(1.0 + m00 - m11 - m22),
        (m12 + m21) / _safe_sqrt(1.0 - m00 + m11 - m22),
        _safe_sqrt(1.0 - m00 - m11 + m22),
    ), axis=-1)

    scores = jnp.stack(
        (tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22), axis=-1)
    best = jnp.argmax(scores, axis=-1, keepdims=True)
    q = 0.5 * jnp.stack((
        jnp.take_along_axis(qw, best, axis=-1)[..., 0],
        jnp.take_along_axis(qx, best, axis=-1)[..., 0],
        jnp.take_along_axis(qy, best, axis=-1)[..., 0],
        jnp.take_along_axis(qz, best, axis=-1)[..., 0],
    ), axis=-1)
    q = normalize(q)
    sign = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    return q * sign
