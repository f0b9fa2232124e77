r"""Lagrangian (non-contact) dynamics terms: mass matrix, Coriolis, gravity.

This module replaces the reference's Drake-symbolic term extraction
(``/root/reference/dair_pll/multibody_terms.py:104-237``: symbolic
``CalcMassMatrixViaInverseDynamics`` / ``CalcBiasTerm`` compiled by
``drake_pytorch``) with direct, autodiff-native computation:

* **Mass matrix** via composite virtual work over bodies:
  :math:`M(q) = \sum_b J_{cm,b}^T m_b J_{cm,b} + J_{\omega,b}^T I_{cm,b}^W
  J_{\omega,b}` — a handful of small batched matmuls.
* **Coriolis/centrifugal bias** via a *JVP through the kinematics*: the
  bias accelerations :math:`\dot J v` are exactly the time-derivative of
  body velocities holding :math:`\dot v = 0`, i.e. the JVP of
  ``q -> (J_w(q) v, J_{cm}(q) v)`` in the direction ``dq/dt``. No symbolic
  algebra, no hand-derived Christoffel symbols; XLA fuses the whole thing.
* **Gravity** via virtual work at each body's center of mass.

All quantities are in the reference's generalized-velocity convention
(body-frame angular velocity first; see ``kinematics.py``). Functions are
unbatched; callers ``vmap``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu import inertia as inertia_mod
from dair_pll_tpu.multibody.kinematics import (body_kinematics,
                                               configuration_rate)
from dair_pll_tpu.ops.tensor import (skew_symmetric, small_matmul,
                                     small_matvec)

GRAVITY_ACCELERATION = 9.81


def _cm_jacobians(model, pi_cm: Array, q: Array):
    """World-frame angular and center-of-mass Jacobians for all bodies.

    Args:
        model: multibody model.
        pi_cm: ``(n_bodies, 10)`` inertial parameters.
        q: ``(n_q,)`` configuration.

    Returns:
        Jw: ``(n_b, 3, n_v)``, J_cm: ``(n_b, 3, n_v)``, R_WB: ``(n_b, 3, 3)``.
    """
    kin = body_kinematics(model, q)
    mass = pi_cm[:, 0]
    c_B = pi_cm[:, 1:4] / mass[:, None]
    c_W = small_matvec(kin.R_WB, c_B)
    J_cm = kin.Jv - small_matmul(skew_symmetric(c_W), kin.Jw)
    return kin.Jw, J_cm, kin.R_WB


def mass_matrix(model, pi_cm: Array, q: Array) -> Array:
    """Generalized mass matrix ``M(q)``.

    Args:
        model: multibody model.
        pi_cm: ``(n_bodies, 10)`` inertial parameters.
        q: ``(n_q,)`` configuration.

    Returns:
        ``(n_v, n_v)`` symmetric positive-definite mass matrix.
    """
    Jw, J_cm, R_WB = _cm_jacobians(model, pi_cm, q)
    mass = pi_cm[:, 0]
    I_cm_B = inertia_mod.inertia_matrix_from_vector(pi_cm[:, 4:])
    I_cm_W = R_WB @ I_cm_B @ jnp.swapaxes(R_WB, -1, -2)
    M_lin = jnp.einsum("b,bai,baj->ij", mass, J_cm, J_cm)
    M_ang = jnp.einsum("bxi,bxy,byj->ij", Jw, I_cm_W, Jw)
    return M_lin + M_ang


def lagrangian_terms(model, pi_cm: Array, q: Array, v: Array,
                     u: Array) -> Tuple[Array, Array]:
    r"""Mass matrix and generalized non-contact force.

    Computes ``M(q)`` and ``F(q, v, u)`` such that the contact-free dynamics
    are ``M(q) dv/dt = F``. ``F`` collects gravity, actuation, and the
    (negated) Coriolis/centrifugal bias — matching the role of the
    reference's ``LagrangianTerms.forward``
    (``multibody_terms.py:214-237``).

    Args:
        model: multibody model.
        pi_cm: ``(n_bodies, 10)`` inertial parameters.
        q: ``(n_q,)`` configuration.
        v: ``(n_v,)`` generalized velocity.
        u: ``(n_u,)`` actuation input.

    Returns:
        M: ``(n_v, n_v)`` mass matrix.
        F: ``(n_v,)`` generalized force.
    """
    dtype = q.dtype
    mass = pi_cm[:, 0]
    I_cm_B = inertia_mod.inertia_matrix_from_vector(pi_cm[:, 4:])

    def velocities(q_inner: Array):
        Jw, J_cm, R_WB = _cm_jacobians(model, pi_cm, q_inner)
        omega = Jw @ v
        v_cm = J_cm @ v
        return (omega, v_cm), (Jw, J_cm, R_WB)

    qdot = configuration_rate(model, q, v)
    ((omega, v_cm), (Jw, J_cm, R_WB)), ((omega_dot_bias, a_cm_bias),
                                        _) = jax.jvp(
        velocities, (q,), (qdot,))
    del v_cm

    I_cm_W = R_WB @ I_cm_B @ jnp.swapaxes(R_WB, -1, -2)

    # Mass matrix from the same Jacobians.
    M = (jnp.einsum("b,bai,baj->ij", mass, J_cm, J_cm) +
         jnp.einsum("bxi,bxy,byj->ij", Jw, I_cm_W, Jw))

    # Coriolis/centrifugal generalized bias force.
    I_omega = small_matvec(I_cm_W, omega)
    torque_bias = (small_matvec(I_cm_W, omega_dot_bias) +
                   jnp.cross(omega, I_omega))
    force_bias = mass[:, None] * a_cm_bias
    coriolis = (jnp.einsum("bai,ba->i", Jw, torque_bias) +
                jnp.einsum("bai,ba->i", J_cm, force_bias))

    # Gravity via virtual work at each center of mass.
    g_W = jnp.asarray([0.0, 0.0, -GRAVITY_ACCELERATION], dtype)
    gravity = jnp.einsum("bai,b,a->i", J_cm, mass, g_W)

    # Actuation: one column per actuated joint.
    actuation = jnp.zeros((model.n_v,), dtype)
    if model.n_u > 0:
        u_index = 0
        for body_index, body in enumerate(model.bodies):
            if body.joint.joint_type in ("revolute", "prismatic") and body.joint.actuated:
                v_off = model.body_v_offset(body_index)
                actuation = actuation.at[v_off].add(u[u_index])
                u_index += 1

    return M, gravity + actuation - coriolis


def lagrangian_terms_from_kinematics(model, pi_cm: Array, kin, kin_dot,
                                     v: Array, u: Array
                                     ) -> Tuple[Array, Array]:
    """Mass matrix and generalized force from a precomputed kinematics
    primal/tangent pair (the hot-path variant of :func:`lagrangian_terms`
    that shares one FK+JVP sweep with the contact terms; see
    ``terms.multibody_terms``).

    Args:
        model: multibody model.
        pi_cm: ``(n_bodies, 10)`` inertial parameters.
        kin: :class:`BodyKinematics` at the configuration.
        kin_dot: its time derivative (JVP along ``dq/dt``).
        v: ``(n_v,)`` generalized velocity.
        u: ``(n_u,)`` actuation input.

    Returns:
        (M, F) as in :func:`lagrangian_terms`.
    """
    dtype = v.dtype
    mass = pi_cm[:, 0]
    c_B = pi_cm[:, 1:4] / mass[:, None]
    I_cm_B = inertia_mod.inertia_matrix_from_vector(pi_cm[:, 4:])

    c_W = small_matvec(kin.R_WB, c_B)
    c_W_dot = small_matvec(kin_dot.R_WB, c_B)
    Jw, Jw_dot = kin.Jw, kin_dot.Jw
    J_cm = kin.Jv - small_matmul(skew_symmetric(c_W), Jw)
    J_cm_dot = (kin_dot.Jv - small_matmul(skew_symmetric(c_W_dot), Jw) -
                small_matmul(skew_symmetric(c_W), Jw_dot))

    omega = small_matvec(Jw, v)
    omega_dot_bias = small_matvec(Jw_dot, v)
    a_cm_bias = small_matvec(J_cm_dot, v)

    I_cm_W = small_matmul(small_matmul(kin.R_WB, I_cm_B),
                          jnp.swapaxes(kin.R_WB, -1, -2))
    M = (jnp.einsum("b,bai,baj->ij", mass, J_cm, J_cm) +
         jnp.einsum("bxi,bxy,byj->ij", Jw, I_cm_W, Jw))

    I_omega = small_matvec(I_cm_W, omega)
    torque_bias = (small_matvec(I_cm_W, omega_dot_bias) +
                   jnp.cross(omega, I_omega))
    force_bias = mass[:, None] * a_cm_bias
    coriolis = (jnp.einsum("bai,ba->i", Jw, torque_bias) +
                jnp.einsum("bai,ba->i", J_cm, force_bias))

    g_W = jnp.asarray([0.0, 0.0, -GRAVITY_ACCELERATION], dtype)
    gravity = jnp.einsum("bai,b,a->i", J_cm, mass, g_W)

    actuation = jnp.zeros((model.n_v,), dtype)
    if model.n_u > 0:
        u_index = 0
        for body_index, body in enumerate(model.bodies):
            if body.joint.joint_type in ("revolute", "prismatic") and body.joint.actuated:
                v_off = model.body_v_offset(body_index)
                actuation = actuation.at[v_off].add(u[u_index])
                u_index += 1

    return M, gravity + actuation - coriolis


def non_contact_acceleration(model, pi_cm: Array, q: Array, v: Array,
                             u: Array) -> Tuple[Array, Array]:
    """Mass matrix and contact-free acceleration ``M(q)^{-1} F(q, v, u)``.

    Returns:
        M: ``(n_v, n_v)``; a: ``(n_v,)``.
    """
    M, F = lagrangian_terms(model, pi_cm, q, v, u)
    chol = jax.scipy.linalg.cho_factor(M)
    return M, jax.scipy.linalg.cho_solve(chol, F)
