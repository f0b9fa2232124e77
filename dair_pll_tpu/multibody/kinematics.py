r"""Forward kinematics and body Jacobians over a kinematic tree.

This module replaces the reference's Drake-symbolic extraction of body
rotations, translations, and spatial Jacobians
(``/root/reference/dair_pll/multibody_terms.py:253-382``) with direct
recursive spatial kinematics: a static Python loop over the (small, fixed)
body list at trace time, producing stacked arrays — jit/vmap-friendly and
fully differentiable.

Velocity convention (matches the reference's state space,
``state_space.py:402-424`` and the gamma-mapping of
``multibody_terms.py:125-132``): for each floating model the generalized
velocity is ``[omega_B (body frame, 3), v_W (world frame, 3), joint
rates]``. All Jacobians here are with respect to this generalized velocity,
and express world-frame quantities:

* ``Jw[b] @ v = omega_WB_W`` — world-frame angular velocity of body b.
* ``Jv[b] @ v = v_WBo_W`` — world-frame velocity of body b's origin.

Functions are unbatched (single configuration); callers ``vmap``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.ops import quaternion
from dair_pll_tpu.ops.tensor import (skew_symmetric, small_matmul,
                                     small_matvec)


class BodyKinematics(NamedTuple):
    """Stacked world-frame kinematics of all bodies.

    Attributes:
        R_WB: ``(n_bodies, 3, 3)`` body rotations.
        p_WB: ``(n_bodies, 3)`` body origins.
        Jw: ``(n_bodies, 3, n_v)`` angular velocity Jacobians (world frame).
        Jv: ``(n_bodies, 3, n_v)`` origin linear velocity Jacobians.
    """
    R_WB: Array
    p_WB: Array
    Jw: Array
    Jv: Array


def _axis_angle_rotation(axis: Array, angle: Array) -> Array:
    """Rodrigues rotation matrix about a fixed unit ``axis`` by ``angle``."""
    skew = skew_symmetric(axis)
    eye = jnp.eye(3, dtype=angle.dtype)
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    outer = jnp.outer(axis, axis)
    return c * eye + s * skew + (1.0 - c) * outer


def body_kinematics(model, q: Array) -> BodyKinematics:
    """Computes world pose and velocity Jacobians for every body.

    Args:
        model: :class:`~dair_pll_tpu.multibody.model.MultibodyModel`.
        q: ``(n_q,)`` configuration in reference state-space layout.

    Returns:
        :class:`BodyKinematics` with stacked arrays.
    """
    n_v = model.n_v
    dtype = q.dtype
    zeros_jac = jnp.zeros((3, n_v), dtype=dtype)

    R_list, p_list, Jw_list, Jv_list = [], [], [], []

    def parent_frame(parent: int):
        """Parent body pose/Jacobians; the world frame for ``-1``
        (fixed-base models whose joints hang off the ``world`` link)."""
        if parent == -1:
            return (jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype),
                    zeros_jac, zeros_jac)
        return (R_list[parent], p_list[parent], Jw_list[parent],
                Jv_list[parent])

    for index, body in enumerate(model.bodies):
        joint = body.joint
        q_off = model.body_q_offset(index)
        v_off = model.body_v_offset(index)

        if joint.joint_type == "free":
            quat = q[q_off:q_off + 4]
            pos = q[q_off + 4:q_off + 7]
            R_WB = quaternion.to_rotation_matrix(quat)
            p_WB = pos
            # omega_W = R_WB omega_B; v_WBo_W = v_W directly.
            Jw = zeros_jac.at[:, v_off:v_off + 3].set(R_WB)
            Jv = zeros_jac.at[:, v_off + 3:v_off + 6].set(
                jnp.eye(3, dtype=dtype))
        elif joint.joint_type == "revolute":
            R_WP, p_WP, Jw_P, Jv_P = parent_frame(joint.parent)
            R_PJ = jnp.asarray(np.asarray(joint.R_PJ), dtype)
            p_PJ = jnp.asarray(np.asarray(joint.p_PJ), dtype)
            axis = jnp.asarray(np.asarray(joint.axis), dtype)

            R_WJ = small_matmul(R_WP, R_PJ)
            p_WB = p_WP + small_matvec(R_WP, p_PJ)
            angle = q[q_off]
            R_WB = small_matmul(R_WJ, _axis_angle_rotation(axis, angle))

            # World-frame joint axis (rotation about the axis fixes it).
            axis_W = small_matvec(R_WJ, axis)
            r = p_WB - p_WP
            Jw = Jw_P.at[:, v_off].add(axis_W)
            # v_Bo = v_Po + omega_P x r; the joint adds no origin velocity.
            Jv = Jv_P - small_matmul(skew_symmetric(r), Jw_P)
        elif joint.joint_type == "prismatic":
            R_WP, p_WP, Jw_P, Jv_P = parent_frame(joint.parent)
            R_PJ = jnp.asarray(np.asarray(joint.R_PJ), dtype)
            p_PJ = jnp.asarray(np.asarray(joint.p_PJ), dtype)
            axis = jnp.asarray(np.asarray(joint.axis), dtype)

            R_WJ = small_matmul(R_WP, R_PJ)
            axis_W = small_matvec(R_WJ, axis)
            # Translation along the (parent-fixed) joint axis.
            p_WB = p_WP + small_matvec(R_WP, p_PJ) + q[q_off] * axis_W
            R_WB = R_WJ
            r = p_WB - p_WP
            Jw = Jw_P
            Jv = (Jv_P - small_matmul(skew_symmetric(r), Jw_P)
                  ).at[:, v_off].add(axis_W)
        elif joint.joint_type in ("fixed", "weld"):
            R_PJ = jnp.asarray(np.asarray(joint.R_PJ), dtype)
            p_PJ = jnp.asarray(np.asarray(joint.p_PJ), dtype)
            if joint.parent == -1:
                R_WB = R_PJ
                p_WB = p_PJ
                Jw = zeros_jac
                Jv = zeros_jac
            else:
                R_WP, p_WP, Jw_P, Jv_P = parent_frame(joint.parent)
                R_WB = small_matmul(R_WP, R_PJ)
                p_WB = p_WP + small_matvec(R_WP, p_PJ)
                r = p_WB - p_WP
                Jw = Jw_P
                Jv = Jv_P - small_matmul(skew_symmetric(r), Jw_P)
        else:
            raise ValueError(f"unknown joint type {joint.joint_type}")

        R_list.append(R_WB)
        p_list.append(p_WB)
        Jw_list.append(Jw)
        Jv_list.append(Jv)

    return BodyKinematics(
        R_WB=jnp.stack(R_list),
        p_WB=jnp.stack(p_list),
        Jw=jnp.stack(Jw_list),
        Jv=jnp.stack(Jv_list),
    )


def configuration_rate(model, q: Array, v: Array) -> Array:
    r"""Time derivative of the configuration coordinates, ``dq/dt``.

    Relates the generalized velocity to coordinate rates: quaternion rate is
    :math:`\dot q_{quat} = \frac 12 q \otimes [0, \omega_B]`; base position
    and joint coordinates differentiate directly. Used to compute Coriolis
    terms by a JVP through the kinematics (see ``dynamics.py``).

    Args:
        model: multibody model.
        q: ``(n_q,)`` configuration.
        v: ``(n_v,)`` generalized velocity.

    Returns:
        ``(n_q,)`` configuration rate.
    """
    dtype = q.dtype
    qdot = jnp.zeros_like(q)
    for index, body in enumerate(model.bodies):
        joint = body.joint
        q_off = model.body_q_offset(index)
        v_off = model.body_v_offset(index)
        if joint.joint_type == "free":
            quat = q[q_off:q_off + 4]
            omega_B = v[v_off:v_off + 3]
            omega_quat = jnp.concatenate(
                (jnp.zeros((1,), dtype), omega_B))
            quat_dot = 0.5 * quaternion.multiply(quat, omega_quat)
            qdot = qdot.at[q_off:q_off + 4].set(quat_dot)
            qdot = qdot.at[q_off + 4:q_off + 7].set(v[v_off + 3:v_off + 6])
        elif joint.joint_type in ("revolute", "prismatic"):
            qdot = qdot.at[q_off].set(v[v_off])
    return qdot


def geometry_kinematics(model, kin: BodyKinematics,
                        q: Array) -> Tuple[Array, Array, Array, Array]:
    """World-frame pose and Jacobians of every collision geometry.

    Replaces the reference's symbolic geometry kinematics callbacks
    (``multibody_terms.py:299-310,327-382``). World-attached geometries
    (ground plane) have identity-from-spec pose and zero Jacobians.

    Args:
        model: multibody model.
        kin: body kinematics from :func:`body_kinematics`.
        q: ``(n_q,)`` configuration (for dtype only).

    Returns:
        R_WG: ``(n_g, 3, 3)`` geometry rotations.
        p_WG: ``(n_g, 3)`` geometry origins.
        Jw_G: ``(n_g, 3, n_v)`` angular Jacobians.
        Jv_G: ``(n_g, 3, n_v)`` origin linear velocity Jacobians.
    """
    dtype = q.dtype
    n_v = model.n_v
    R_out, p_out, Jw_out, Jv_out = [], [], [], []
    for geom in model.geometries:
        R_BG = jnp.asarray(np.asarray(geom.R_BG), dtype)
        p_BG = jnp.asarray(np.asarray(geom.p_BG), dtype)
        if geom.body == -1:
            R_out.append(R_BG)
            p_out.append(p_BG)
            Jw_out.append(jnp.zeros((3, n_v), dtype))
            Jv_out.append(jnp.zeros((3, n_v), dtype))
            continue
        R_WB = kin.R_WB[geom.body]
        p_WB = kin.p_WB[geom.body]
        offset_W = small_matvec(R_WB, p_BG)
        R_out.append(small_matmul(R_WB, R_BG))
        p_out.append(p_WB + offset_W)
        Jw_out.append(kin.Jw[geom.body])
        Jv_out.append(
            kin.Jv[geom.body] -
            small_matmul(skew_symmetric(offset_W), kin.Jw[geom.body]))
    return (jnp.stack(R_out), jnp.stack(p_out), jnp.stack(Jw_out),
            jnp.stack(Jv_out))
