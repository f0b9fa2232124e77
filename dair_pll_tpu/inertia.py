r"""Rigid-body inertial reparameterizations, TPU-native.

JAX rebuild of the reference's ``inertia.py``
(``/root/reference/dair_pll/inertia.py``). Implements the smooth,
unconstrained 10-DoF ``theta`` parameterization of Rucker & Wensing
("Smooth Parameterization of Rigid-Body Inertia", RA-L 2020) and conversions
between:

* ``theta``: unconstrained ``(*, 10)`` — any real value maps to a physically
  valid inertia (reference ``inertia.py:46-70``).
* ``pi_o``:  ``[m, m*p, I_o(6)]`` with rotational inertia about the body
  origin; vector order ``[Ixx, Iyy, Izz, Ixy, Ixz, Iyz]``.
* ``pi_cm``: same but inertia about the center of mass.
* ``urdf``/``scalars``: export formats.

All conversions broadcast over leading batch dims and are jit/vmap/grad-safe.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.ops.tensor import skew_symmetric, symmetric_offdiagonal

INERTIA_INDICES = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
INERTIA_SCALARS = ["I_xx", "I_yy", "I_zz", "I_xy", "I_xz", "I_yz"]
AXES = ["x", "y", "z"]


def parallel_axis_theorem(I_BBa_B: Array, m_B: Array, p_BaBb_B: Array,
                          Ba_is_Bcm: bool = True) -> Array:
    r"""Shifts rotational inertia between reference points (one must be the
    center of mass): :math:`I_R = I_C - m [d]^2`. Mirrors reference
    ``inertia.py:108-145``.

    Args:
        I_BBa_B: ``(*, 3, 3)`` inertia matrices.
        m_B: ``(*,)`` masses.
        p_BaBb_B: ``(*, 3)`` displacement between reference points.
        Ba_is_Bcm: whether the input inertia is about the center of mass.

    Returns:
        ``(*, 3, 3)`` shifted inertia matrices.
    """
    skew = skew_symmetric(p_BaBb_B)
    term = (skew @ skew) * m_B[..., None, None]
    return I_BBa_B - term if Ba_is_Bcm else I_BBa_B + term


def inertia_matrix_from_vector(I_vec: Array) -> Array:
    r"""``[Ixx, Iyy, Izz, Ixy, Ixz, Iyz]`` to symmetric ``(*, 3, 3)`` matrix.

    Mirrors reference ``inertia.py:148-171``.
    """
    diags = I_vec[..., :3]
    diag_mat = diags[..., None] * jnp.eye(3, dtype=I_vec.dtype)
    # symmetric_offdiagonal places [a, b, c] at (yz, xz, xy); feed reversed.
    off = symmetric_offdiagonal(
        jnp.flip(I_vec[..., 3:], axis=-1))
    return diag_mat + off


def inertia_vector_from_matrix(I_mat: Array) -> Array:
    r"""Symmetric ``(*, 3, 3)`` matrix to ``[Ixx, Iyy, Izz, Ixy, Ixz, Iyz]``.

    Mirrors reference ``inertia.py:174-199``.
    """
    return jnp.stack((
        I_mat[..., 0, 0], I_mat[..., 1, 1], I_mat[..., 2, 2],
        I_mat[..., 0, 1], I_mat[..., 0, 2], I_mat[..., 1, 2]), axis=-1)


def theta_to_pi_o(theta: Array) -> Array:
    """``theta`` (unconstrained) to ``pi_o``. Mirrors reference
    ``inertia.py:205-234``.

    Args:
        theta: ``(*, 10)`` parameters ``[alpha, d1, d2, d3, s12, s23, s13,
          t1, t2, t3]``.

    Returns:
        ``(*, 10)`` ``pi_o`` parameters.
    """
    alpha = theta[..., 0]
    d_1, d_2, d_3 = theta[..., 1], theta[..., 2], theta[..., 3]
    s_12, s_23, s_13 = theta[..., 4], theta[..., 5], theta[..., 6]
    t_1, t_2, t_3 = theta[..., 7], theta[..., 8], theta[..., 9]

    s_dot_s = s_12 * s_12 + s_23 * s_23 + s_13 * s_13
    t_dot_t = t_1 * t_1 + t_2 * t_2 + t_3 * t_3

    e1, e2, e3 = jnp.exp(d_1), jnp.exp(d_2), jnp.exp(d_3)
    scaled = jnp.stack((
        t_dot_t + 1.0,
        t_1 * e1,
        t_1 * s_12 + t_2 * e2,
        t_1 * s_13 + t_2 * s_23 + t_3 * e3,
        s_dot_s + e2 * e2 + e3 * e3,
        s_13 * s_13 + s_23 * s_23 + e1 * e1 + e3 * e3,
        s_12 * s_12 + e1 * e1 + e2 * e2,
        -s_12 * e1,
        -s_13 * e1,
        -s_12 * s_13 - s_23 * e2,
    ), axis=-1)
    return jnp.exp(2.0 * alpha)[..., None] * scaled


def pi_o_to_theta(pi_o: Array) -> Array:
    """``pi_o`` to ``theta`` — hand-derived local inverse of
    :func:`theta_to_pi_o` for valid ``pi_o``. Mirrors reference
    ``inertia.py:237-302``.

    Args:
        pi_o: ``(*, 10)`` valid (physically realizable) parameters.

    Returns:
        ``(*, 10)`` ``theta`` parameters.
    """
    ea_ed1 = jnp.sqrt(0.5 * (pi_o[..., 5] + pi_o[..., 6] - pi_o[..., 4]))
    ea_s12 = -pi_o[..., 7] / ea_ed1
    ea_s13 = -pi_o[..., 8] / ea_ed1
    ea_ed2 = jnp.sqrt(pi_o[..., 6] - ea_ed1 ** 2 - ea_s12 ** 2)
    ea_s23 = (-pi_o[..., 9] - ea_s12 * ea_s13) / ea_ed2
    ea_ed3 = jnp.sqrt(
        pi_o[..., 5] - ea_ed1 ** 2 - ea_s13 ** 2 - ea_s23 ** 2)
    ea_t1 = pi_o[..., 1] / ea_ed1
    ea_t2 = (pi_o[..., 2] - ea_t1 * ea_s12) / ea_ed2
    ea_t3 = (pi_o[..., 3] - ea_t1 * ea_s13 - ea_t2 * ea_s23) / ea_ed3
    ea = jnp.sqrt(pi_o[..., 0] - ea_t1 ** 2 - ea_t2 ** 2 - ea_t3 ** 2)

    alpha = jnp.log(ea)
    d_vec = jnp.log(jnp.stack((ea_ed1, ea_ed2, ea_ed3), axis=-1) /
                    ea[..., None])
    s_and_t = jnp.stack(
        (ea_s12, ea_s23, ea_s13, ea_t1, ea_t2, ea_t3), axis=-1) / ea[..., None]
    return jnp.concatenate((alpha[..., None], d_vec, s_and_t), axis=-1)


def _shift_pi(pi: Array, to_cm: bool) -> Array:
    mass = pi[..., 0:1]
    p_BoBcm_B = pi[..., 1:4] / mass
    I_mat = inertia_matrix_from_vector(pi[..., 4:])
    shifted = parallel_axis_theorem(
        I_mat, mass[..., 0], p_BoBcm_B, Ba_is_Bcm=not to_cm)
    I_vec = inertia_vector_from_matrix(shifted)
    return jnp.concatenate((mass, pi[..., 1:4], I_vec), axis=-1)


def pi_o_to_pi_cm(pi_o: Array) -> Array:
    """Shifts rotational inertia from body origin to center of mass.
    Mirrors reference ``inertia.py:305-331``; broadcasts over any batch."""
    return _shift_pi(pi_o, to_cm=True)


def pi_cm_to_pi_o(pi_cm: Array) -> Array:
    """Shifts rotational inertia from center of mass to body origin.
    Mirrors reference ``inertia.py:334-360``; broadcasts over any batch."""
    return _shift_pi(pi_cm, to_cm=False)


def theta_to_pi_cm(theta: Array) -> Array:
    """Chained :func:`theta_to_pi_o` and :func:`pi_o_to_pi_cm`."""
    return pi_o_to_pi_cm(theta_to_pi_o(theta))


def pi_cm_to_theta(pi_cm: Array) -> Array:
    """Chained :func:`pi_cm_to_pi_o` and :func:`pi_o_to_theta`."""
    return pi_o_to_theta(pi_cm_to_pi_o(pi_cm))


def pi_cm_to_inertial_components(
        pi_cm: Array) -> Tuple[Array, Array, Array]:
    """Splits ``pi_cm`` into (mass, com position, CoM inertia matrix).

    Args:
        pi_cm: ``(*, 10)`` parameters.

    Returns:
        ``(*,)`` mass, ``(*, 3)`` ``p_BoBcm_B``, ``(*, 3, 3)`` ``I_BBcm_B``.
    """
    mass = pi_cm[..., 0]
    p_BoBcm_B = pi_cm[..., 1:4] / mass[..., None]
    I_BBcm_B = inertia_matrix_from_vector(pi_cm[..., 4:])
    return mass, p_BoBcm_B, I_BBcm_B


def inertial_components_to_pi(mass, p_BoBcm_B, I_BBa_B) -> Array:
    """Packs (mass, com, 3x3 inertia about some point Ba) into ``pi`` format
    (``pi_o`` if Ba = Bo, ``pi_cm`` if Ba = Bcm). Mirrors reference
    ``inertia.py:419-433``."""
    mass = jnp.asarray(mass)
    p = jnp.asarray(p_BoBcm_B)
    I_vec = inertia_vector_from_matrix(jnp.asarray(I_BBa_B))
    return jnp.concatenate(
        (mass[..., None], mass[..., None] * p, I_vec), axis=-1)


def pi_cm_to_urdf(pi_cm: Array) -> Tuple[str, str, List[str]]:
    """Single ``(10,)`` ``pi_cm`` vector to URDF string pieces
    ``(mass, "px py pz", [6 inertia strings])``. Mirrors reference
    ``inertia.py:385-394``."""
    assert pi_cm.shape == (10,)
    mass = str(float(pi_cm[0]))
    com = " ".join(str(float(c / pi_cm[0])) for c in pi_cm[1:4])
    inertia = [str(float(v)) for v in pi_cm[4:]]
    return mass, com, inertia


def pi_cm_to_scalars(pi_cm: Array) -> Dict[str, float]:
    """Single ``(10,)`` ``pi_cm`` vector to logging scalars. Mirrors
    reference ``inertia.py:444-458``."""
    mass = float(pi_cm[0])
    scalars = {"m": mass}
    for axis, value in zip(AXES, pi_cm[1:4]):
        scalars[f"com_{axis}"] = float(value) / mass
    for name, value in zip(INERTIA_SCALARS, pi_cm[4:]):
        scalars[name] = float(value)
    return scalars


class InertialParameterConverter:
    """Namespace mirroring the reference's class-based API
    (``inertia.py:202``); methods delegate to the module functions."""
    theta_to_pi_o = staticmethod(theta_to_pi_o)
    pi_o_to_theta = staticmethod(pi_o_to_theta)
    pi_o_to_pi_cm = staticmethod(pi_o_to_pi_cm)
    pi_cm_to_pi_o = staticmethod(pi_cm_to_pi_o)
    theta_to_pi_cm = staticmethod(theta_to_pi_cm)
    pi_cm_to_theta = staticmethod(pi_cm_to_theta)
    pi_cm_to_urdf = staticmethod(pi_cm_to_urdf)
    pi_cm_to_scalars = staticmethod(pi_cm_to_scalars)
    inertial_components_to_pi = staticmethod(inertial_components_to_pi)
    pi_cm_to_inertial_components = staticmethod(
        pi_cm_to_inertial_components)
