r"""Fused batch-minor (SoA) ContactNets hot path: kinematics, terms, loss.

The structure-of-arrays counterpart of ``multibody/kinematics.py``,
``multibody/dynamics.py``, ``multibody/terms.py`` and the loss assembly of
``multibody/learnable_system.py`` (see those modules for the physics
derivations and reference correspondence, e.g. reference
``multibody_terms.py:253-656`` and
``multibody_learnable_system.py:104-197``). Instead of ``vmap`` placing
the batch axis first (which tiles every tiny intermediate onto padded
``(8, 128)`` TPU layouts — the round-1/2 profiling finding), every
per-sample scalar here is a ``(B,)`` array and all small-dimension
structure unrolls at trace time (``ops/soa.py``). XLA fuses the whole
per-transition chain — forward kinematics, contact terms, mass matrix,
Coriolis JVP, cone solve, loss — into a handful of large elementwise
kernels with batch-minor layout, and the parameter gradient falls out of
ordinary autodiff.

Supported models (``supports_fused``): kinematic trees of free /
revolute / prismatic / fixed joints whose collision pairs are all
plane-vs-convex (box | polygon | sphere | deep-support ICNN; ICNN
witness networks evaluate batch-major on the MXU). Everything else falls back to the vmapped reference path in
``multibody/learnable_system.py``.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu import inertia as inertia_mod
from dair_pll_tpu.geometry import _UNIT_BOX_VERTICES
from dair_pll_tpu.multibody.model import MultibodyModel, MultibodyParams
from dair_pll_tpu.ops import soa, soa_solver
from dair_pll_tpu.ops.soa import Smat, Svec

GRAVITY_ACCELERATION = 9.81

_FUSED_JOINTS = ("free", "revolute", "prismatic", "fixed", "weld")
_FUSED_CONVEX = ("box", "polygon", "sphere",
                 "deep_support_convex")


def supports_fused(model: MultibodyModel) -> bool:
    """Whether the fused SoA path covers this model."""
    for body in model.bodies:
        if body.joint.joint_type not in _FUSED_JOINTS:
            return False
    for (a, b) in model.collision_candidates:
        spec_a = model.geometries[a]
        spec_b = model.geometries[b]
        if spec_a.geom_type != "plane":
            return False
        if spec_b.geom_type not in _FUSED_CONVEX:
            return False
    return True


def supports_fused_kernel(model: MultibodyModel) -> bool:
    """Whether the single-kernel Pallas terms+loss+grad path covers this
    model: ``supports_fused`` restricted to geometries whose learnable
    parameters are a small scalar set (box | polygon | sphere — the
    derived parameters thread through SMEM; ICNN witness networks need
    the MXU and stay on the XLA fused path)."""
    if not supports_fused(model):
        return False
    for geom in model.geometries:
        if geom.geom_type not in ("plane", "box", "polygon", "sphere"):
            return False
    return True


# -- derived scalar parameters ---------------------------------------------------
def derive_scalar_params(model: MultibodyModel, params: MultibodyParams):
    """The small derived-parameter pytree the SoA terms chain actually
    consumes: ``pi`` body inertial vectors (Rucker-Wensing ``pi_cm``),
    ``mu`` per-geometry friction magnitudes, ``geom`` per-geometry shape
    arrays (absolute values folded in here so downstream code is sign
    free). ~15 scalars for the cube model — the whole parameter
    dependence of the fused loss flows through this pytree, which is what
    the Pallas terms+loss+grad kernel threads through SMEM
    (ROADMAP 0b)."""
    geom_derived = []
    for spec, gparams in zip(model.geometries, params.geometry):
        if spec.geom_type == "box":
            geom_derived.append(
                {"half": jnp.abs(gparams["half_lengths"]).reshape(3)})
        elif spec.geom_type == "polygon":
            geom_derived.append({"verts": gparams["vertices"]})
        elif spec.geom_type == "sphere":
            geom_derived.append({"radius": jnp.abs(gparams["radius"])})
        elif spec.geom_type == "deep_support_convex":
            # Not scalar-packable (MXU path); carried by reference.
            geom_derived.append({"icnn": gparams})
        else:
            geom_derived.append({})
    return {"pi": params.pi_cm(), "mu": jnp.abs(params.friction),
            "geom": tuple(geom_derived)}


def scalarize_derived(model: MultibodyModel, derived) -> dict:
    """Indexes the derived pytree into nested Python lists of 0-d scalars
    (``sp["pi"][b][i]``, ``sp["mu"][g]``, ``sp["geom"][g]["half"][i]``…)
    so the terms chain unrolls every tiny contraction at trace time —
    and so a Pallas kernel body can rebuild the identical structure from
    SMEM scalar reads."""
    sp_geom = []
    for spec, entry in zip(model.geometries, derived["geom"]):
        if spec.geom_type == "box":
            sp_geom.append({"half": [entry["half"][i] for i in range(3)]})
        elif spec.geom_type == "polygon":
            verts = entry["verts"]
            sp_geom.append({"verts": [
                [verts[i, j] for j in range(3)]
                for i in range(verts.shape[0])]})
        elif spec.geom_type == "sphere":
            sp_geom.append({"radius": entry["radius"]})
        elif spec.geom_type == "deep_support_convex":
            sp_geom.append({"icnn": entry["icnn"]})
        else:
            sp_geom.append({})
    pi = derived["pi"]
    return {
        "pi": [[pi[b, i] for i in range(10)]
               for b in range(model.n_bodies)],
        "mu": [derived["mu"][g] for g in range(len(model.geometries))],
        "geom": sp_geom,
    }


class SoaKinematics(NamedTuple):
    """Per-body world kinematics in SoA form (cf.
    ``kinematics.BodyKinematics``)."""
    R_WB: List[Smat]    # each (3, 3)
    p_WB: List[Svec]    # each (3,)
    Jw: List[Smat]      # each (3, n_v)
    Jv: List[Smat]      # each (3, n_v)


def _quat_to_rotmat(q: Svec) -> Smat:
    """wxyz unit quaternion -> rotation matrix (cf.
    ``ops/quaternion.to_rotation_matrix``)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [[1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]]


def _const_mat(values, like: Array) -> Smat:
    """Static (numpy) 3x3 -> smat of broadcast constants."""
    arr = np.asarray(values)
    return [[jnp.asarray(arr[i, j], like.dtype)
             for j in range(arr.shape[1])] for i in range(arr.shape[0])]


def _const_vec(values, like: Array) -> Svec:
    arr = np.asarray(values)
    return [jnp.asarray(arr[i], like.dtype) for i in range(arr.shape[0])]


def _axis_angle_rotation(axis: Svec, angle: Array) -> Smat:
    """Rodrigues rotation about a constant unit axis (cf.
    ``kinematics._axis_angle_rotation``)."""
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    one_c = 1.0 - c
    K = soa.skew(axis)
    out = []
    for i in range(3):
        row = []
        for j in range(3):
            ident = c if i == j else jnp.zeros_like(c)
            row.append(ident + s * K[i][j] + one_c * axis[i] * axis[j])
        out.append(row)
    return out


def soa_body_kinematics(model: MultibodyModel, q: Svec) -> SoaKinematics:
    """SoA port of ``kinematics.body_kinematics``."""
    n_v = model.n_v
    like = q[0]
    zero = jnp.zeros_like(like)

    R_list, p_list, Jw_list, Jv_list = [], [], [], []

    def parent_frame(parent: int):
        """Parent pose/Jacobians; the world frame for ``-1``."""
        if parent == -1:
            one = jnp.ones_like(like)
            zero = jnp.zeros_like(like)
            eye = [[one if i == j else zero for j in range(3)]
                   for i in range(3)]
            return (eye, [zero, zero, zero], soa.zero_smat(3, n_v, like),
                    soa.zero_smat(3, n_v, like))
        return (R_list[parent], p_list[parent], Jw_list[parent],
                Jv_list[parent])

    for index, body in enumerate(model.bodies):
        joint = body.joint
        q_off = model.body_q_offset(index)
        v_off = model.body_v_offset(index)

        if joint.joint_type == "free":
            quat = q[q_off:q_off + 4]
            pos = q[q_off + 4:q_off + 7]
            R_WB = _quat_to_rotmat(quat)
            p_WB = pos
            Jw = soa.zero_smat(3, n_v, like)
            Jv = soa.zero_smat(3, n_v, like)
            for i in range(3):
                for j in range(3):
                    Jw[i][v_off + j] = R_WB[i][j]
                Jv[i][v_off + 3 + i] = jnp.ones_like(like)
        elif joint.joint_type == "revolute":
            R_WP, p_WP, Jw_P, Jv_P = parent_frame(joint.parent)
            R_PJ = _const_mat(joint.R_PJ, like)
            p_PJ = _const_vec(joint.p_PJ, like)
            axis = _const_vec(joint.axis, like)

            R_WJ = soa.matmul(R_WP, R_PJ)
            p_WB = soa.vadd(p_WP, soa.matvec(R_WP, p_PJ))
            angle = q[q_off]
            R_WB = soa.matmul(R_WJ, _axis_angle_rotation(axis, angle))

            axis_W = soa.matvec(R_WJ, axis)
            r = soa.vsub(p_WB, p_WP)
            Jw = [row[:] for row in Jw_P]
            for i in range(3):
                Jw[i][v_off] = Jw[i][v_off] + axis_W[i]
            Jv = soa.msub(Jv_P, soa.matmul(soa.skew(r), Jw_P))
        elif joint.joint_type == "prismatic":
            R_WP, p_WP, Jw_P, Jv_P = parent_frame(joint.parent)
            R_PJ = _const_mat(joint.R_PJ, like)
            p_PJ = _const_vec(joint.p_PJ, like)
            axis = _const_vec(joint.axis, like)

            R_WJ = soa.matmul(R_WP, R_PJ)
            axis_W = soa.matvec(R_WJ, axis)
            disp = q[q_off]
            p_WB = [p_WP[i] + soa.matvec(R_WP, p_PJ)[i] +
                    disp * axis_W[i] for i in range(3)]
            R_WB = R_WJ
            r = soa.vsub(p_WB, p_WP)
            Jw = Jw_P
            Jv = soa.msub(Jv_P, soa.matmul(soa.skew(r), Jw_P))
            Jv = [row[:] for row in Jv]
            for i in range(3):
                Jv[i][v_off] = Jv[i][v_off] + axis_W[i]
        elif joint.joint_type in ("fixed", "weld"):
            parent = joint.parent
            R_PJ = _const_mat(joint.R_PJ, like)
            p_PJ = _const_vec(joint.p_PJ, like)
            if parent == -1:
                R_WB = [[jnp.broadcast_to(v, like.shape) for v in row]
                        for row in R_PJ]
                p_WB = [jnp.broadcast_to(v, like.shape) for v in p_PJ]
                Jw = soa.zero_smat(3, n_v, like)
                Jv = soa.zero_smat(3, n_v, like)
            else:
                R_WP = R_list[parent]
                p_WP = p_list[parent]
                R_WB = soa.matmul(R_WP, R_PJ)
                p_WB = soa.vadd(p_WP, soa.matvec(R_WP, p_PJ))
                r = soa.vsub(p_WB, p_WP)
                Jw = Jw_list[parent]
                Jv = soa.msub(Jv_list[parent],
                              soa.matmul(soa.skew(r), Jw_list[parent]))
        else:
            raise ValueError(f"unknown joint type {joint.joint_type}")

        R_list.append(R_WB)
        p_list.append(p_WB)
        Jw_list.append(Jw)
        Jv_list.append(Jv)
    del zero
    return SoaKinematics(R_list, p_list, Jw_list, Jv_list)


def soa_configuration_rate(model: MultibodyModel, q: Svec,
                           v: Svec) -> Svec:
    """SoA port of ``kinematics.configuration_rate``."""
    qdot = [jnp.zeros_like(leaf) for leaf in q]
    for index, body in enumerate(model.bodies):
        joint = body.joint
        q_off = model.body_q_offset(index)
        v_off = model.body_v_offset(index)
        if joint.joint_type == "free":
            qw, qx, qy, qz = q[q_off:q_off + 4]
            wx, wy, wz = v[v_off:v_off + 3]
            # 0.5 * q (x) [0, omega_B]  (Hamilton product)
            qdot[q_off] = 0.5 * (-qx * wx - qy * wy - qz * wz)
            qdot[q_off + 1] = 0.5 * (qw * wx + qy * wz - qz * wy)
            qdot[q_off + 2] = 0.5 * (qw * wy + qz * wx - qx * wz)
            qdot[q_off + 3] = 0.5 * (qw * wz + qx * wy - qy * wx)
            for i in range(3):
                qdot[q_off + 4 + i] = v[v_off + 3 + i]
        elif joint.joint_type in ("revolute", "prismatic"):
            qdot[q_off] = v[v_off]
    return qdot


# -- geometry -----------------------------------------------------------------
def soa_geometry_kinematics(model: MultibodyModel, kin: SoaKinematics,
                            like: Array
                            ) -> Tuple[List[Smat], List[Svec],
                                       List[Smat], List[Smat]]:
    """SoA port of ``kinematics.geometry_kinematics``."""
    n_v = model.n_v
    R_out, p_out, Jw_out, Jv_out = [], [], [], []
    for geom in model.geometries:
        R_BG = _const_mat(geom.R_BG, like)
        p_BG = _const_vec(geom.p_BG, like)
        if geom.body == -1:
            R_out.append(R_BG)
            p_out.append(p_BG)
            Jw_out.append(soa.zero_smat(3, n_v, like))
            Jv_out.append(soa.zero_smat(3, n_v, like))
            continue
        R_WB = kin.R_WB[geom.body]
        p_WB = kin.p_WB[geom.body]
        offset_W = soa.matvec(R_WB, p_BG)
        R_out.append(soa.matmul(R_WB, R_BG))
        p_out.append(soa.vadd(p_WB, offset_W))
        Jw_out.append(kin.Jw[geom.body])
        Jv_out.append(soa.msub(
            kin.Jv[geom.body],
            soa.matmul(soa.skew(offset_W), kin.Jw[geom.body])))
    return R_out, p_out, Jw_out, Jv_out


def _soa_vertices(spec, geom_entry) -> List[Svec]:
    """Vertex set as a list of (scalar-leaf) 3-vectors (cf.
    ``geometry.get_vertices``); consumes the scalarized derived geometry
    entry (absolute values already folded in)."""
    if spec.geom_type == "box":
        half = geom_entry["half"]
        return [[jnp.asarray(s, jnp.result_type(half[0])) * half[i]
                 for i, s in enumerate(signs)]
                for signs in np.asarray(_UNIT_BOX_VERTICES)]
    if spec.geom_type == "polygon":
        return [list(row) for row in geom_entry["verts"]]
    raise ValueError(f"no vertex set for {spec.geom_type}")


def _soa_support_points(spec, geom_entry, direction: Svec) -> List[Svec]:
    """Witness points for one support direction (cf.
    ``geometry.support_points``): top-``n_query`` vertices by support
    value via a compare-exchange network carrying the vertex coordinates
    (the SoA analogue of ``lax.top_k`` + gather). Deep-support (ICNN)
    witnesses are evaluated batch-MAJOR — the width-256 network layers
    are genuinely large matmuls that belong on the MXU — and transposed
    back into SoA form at the boundary."""
    if spec.geom_type == "sphere":
        radius = geom_entry["radius"]
        return [[direction[i] * radius for i in range(3)]]
    if spec.geom_type == "deep_support_convex":
        from dair_pll_tpu.ops import icnn
        params = geom_entry["icnn"]
        d_major = jnp.stack(
            [jnp.broadcast_to(c, direction[0].shape) for c in direction],
            axis=-1)                                        # (B, 3)
        perturbed = d_major[:, None, :] + params["perturbations"][None]
        perturbed = perturbed / jnp.linalg.norm(
            perturbed, axis=-1, keepdims=True)              # (B, n_q, 3)
        points = jax.vmap(jax.vmap(
            lambda d: icnn.icnn_support_point(
                params["icnn"], d, spec.icnn_negative_slope)))(perturbed)
        return [[points[:, c, i] for i in range(3)]
                for c in range(spec.n_query)]
    vertices = _soa_vertices(spec, geom_entry)
    dots = [soa.dot(vert, direction) for vert in vertices]
    payloads = [[vert[i] for vert in vertices] for i in range(3)]
    _, sorted_payloads = soa.sort_with_payload(dots, payloads,
                                               descending=True)
    n_q = spec.n_query
    return [[sorted_payloads[i][c] for i in range(3)] for c in range(n_q)]


def _soa_collide_plane_convex(spec_b, params_b, R_AB: Smat,
                              p_AoBo_A: Svec
                              ) -> Tuple[List[Array], List[Svec],
                                         List[Svec]]:
    """SoA port of ``geometry.collide_plane_convex``. The contact frame is
    A's axes (identity), so only ``(phi, p_AoAc_A, p_BoBc_B)`` per contact
    are returned."""
    # Support direction on B: -z axis of A, in B coordinates = -R_AB[2, :].
    direction_b = [-R_AB[2][i] for i in range(3)]
    witnesses_B = _soa_support_points(spec_b, params_b, direction_b)
    phi_list, p_A_list = [], []
    for w_B in witnesses_B:
        w_A = soa.vadd(soa.matvec(R_AB, w_B), p_AoBo_A)
        phi_list.append(w_A[2])
        p_A_list.append([w_A[0], w_A[1], jnp.zeros_like(w_A[2])])
    return phi_list, p_A_list, witnesses_B


def soa_contact_terms(model: MultibodyModel, sp: dict,
                      kin: SoaKinematics, like: Array
                      ) -> Tuple[Array, List[List[Array]]]:
    """SoA port of ``terms._assemble_contact_terms``: signed distances and
    the cone-major contact Jacobian ``[J_n; mu J_t]`` in cone-field form
    (the contact axis leads, the batch is minor — see ``ops/soa_solver``).

    Args:
        sp: scalarized derived parameters (:func:`scalarize_derived`).

    Returns:
        phi: ``(k, B)`` signed distances.
        Jc: ``(3, n_v)`` nested list of ``(k, B)`` leaves, component rows
        ordered ``[normal, mu t_x, mu t_y]``.
    """
    n_v = model.n_v
    mu_all = sp["mu"]
    R_WG, p_WG, Jw_G, Jv_G = soa_geometry_kinematics(model, kin, like)

    phi_pairs: List[Array] = []
    Jc_pairs: List[List[List[Array]]] = []
    for (a, b) in model.collision_candidates:
        spec_b = model.geometries[b]
        R_WA, p_WA = R_WG[a], p_WG[a]
        R_WB, p_WB = R_WG[b], p_WG[b]

        R_AB = soa.matmul_t(R_WA, R_WB)
        p_AoBo_A = soa.matvec_t(R_WA, soa.vsub(p_WB, p_WA))

        phi_i, p_AoAc_A, p_BoBc_B = _soa_collide_plane_convex(
            spec_b, sp["geom"][b], R_AB, p_AoBo_A)
        n_c = len(phi_i)

        mu_a, mu_b = mu_all[a], mu_all[b]
        mu_pair = (2.0 * mu_a * mu_b) / (mu_a + mu_b)

        # Stack this pair's witnesses along a leading contact axis so the
        # Jacobian shift runs once on (n_c, B) leaves.
        pa = [soa.stack_contacts([jnp.broadcast_to(p[i], like.shape)
                                  for p in p_AoAc_A]) for i in range(3)]
        pb = [soa.stack_contacts([jnp.broadcast_to(p[i], like.shape)
                                  for p in p_BoBc_B]) for i in range(3)]

        # World-frame witness offsets, (n_c, B) per component.
        off_A = [sum(R_WA[i][j] * pa[j] for j in range(3))
                 for i in range(3)]
        off_B = [sum(R_WB[i][j] * pb[j] for j in range(3))
                 for i in range(3)]

        # J_rel = (J_Bc - J_Ac) with J_*c = Jv - skew(off) Jw; then rows
        # [t_x, t_y, n] in the contact frame via R_WA^T.
        dJv = soa.msub(Jv_G[b], Jv_G[a])
        J_rel_W: List[List[Array]] = [[None] * n_v for _ in range(3)]
        for v in range(n_v):
            # skew(off) @ Jw per body, vectorized over contacts.
            sB0 = off_B[1] * Jw_G[b][2][v] - off_B[2] * Jw_G[b][1][v]
            sB1 = off_B[2] * Jw_G[b][0][v] - off_B[0] * Jw_G[b][2][v]
            sB2 = off_B[0] * Jw_G[b][1][v] - off_B[1] * Jw_G[b][0][v]
            sA0 = off_A[1] * Jw_G[a][2][v] - off_A[2] * Jw_G[a][1][v]
            sA1 = off_A[2] * Jw_G[a][0][v] - off_A[0] * Jw_G[a][2][v]
            sA2 = off_A[0] * Jw_G[a][1][v] - off_A[1] * Jw_G[a][0][v]
            J_rel_W[0][v] = dJv[0][v] - sB0 + sA0
            J_rel_W[1][v] = dJv[1][v] - sB1 + sA1
            J_rel_W[2][v] = dJv[2][v] - sB2 + sA2

        Jc_pair: List[List[Array]] = [[None] * n_v for _ in range(3)]
        for v in range(n_v):
            t_x = sum(R_WA[j][0] * J_rel_W[j][v] for j in range(3))
            t_y = sum(R_WA[j][1] * J_rel_W[j][v] for j in range(3))
            n_r = sum(R_WA[j][2] * J_rel_W[j][v] for j in range(3))
            Jc_pair[0][v] = n_r
            Jc_pair[1][v] = mu_pair * t_x
            Jc_pair[2][v] = mu_pair * t_y

        phi_pairs.append(soa.stack_contacts(
            [jnp.broadcast_to(p, like.shape) for p in phi_i]))
        Jc_pairs.append(Jc_pair)

    phi = jnp.concatenate(phi_pairs, axis=0)
    if len(Jc_pairs) == 1:
        Jc = Jc_pairs[0]
    else:
        Jc = [[jnp.concatenate([Jp[i][v] for Jp in Jc_pairs], axis=0)
               for v in range(n_v)] for i in range(3)]
    return phi, Jc


# -- Lagrangian terms -----------------------------------------------------------
def soa_lagrangian_terms(model: MultibodyModel, pi: List[List[Array]],
                         kin: SoaKinematics, kin_dot: SoaKinematics,
                         v: Svec, u: Svec) -> Tuple[Smat, Svec]:
    """SoA port of ``dynamics.lagrangian_terms_from_kinematics``.

    Args:
        pi: per-body Rucker-Wensing ``pi_cm`` vectors as nested scalar
          lists (``pi[b][0..9]`` — see :func:`scalarize_derived`).
    """
    like = v[0]
    n_v = model.n_v
    M: Smat = soa.zero_smat(n_v, n_v, like)
    F: Svec = soa.zero_svec(n_v, like)
    g_W = [jnp.zeros_like(like), jnp.zeros_like(like),
           jnp.asarray(-GRAVITY_ACCELERATION, like.dtype)]

    for b in range(model.n_bodies):
        mass = pi[b][0]
        c_B = [pi[b][1 + i] / mass for i in range(3)]
        I_vec = pi[b][4:]
        # [Ixx, Iyy, Izz, Ixy, Ixz, Iyz] -> symmetric 3x3.
        I_cm_B = [[I_vec[0], I_vec[3], I_vec[4]],
                  [I_vec[3], I_vec[1], I_vec[5]],
                  [I_vec[4], I_vec[5], I_vec[2]]]

        R = kin.R_WB[b]
        R_dot = kin_dot.R_WB[b]
        c_W = soa.matvec(R, c_B)
        c_W_dot = soa.matvec(R_dot, c_B)
        Jw, Jw_dot = kin.Jw[b], kin_dot.Jw[b]
        J_cm = soa.msub(kin.Jv[b], soa.matmul(soa.skew(c_W), Jw))
        J_cm_dot = soa.msub(
            soa.msub(kin_dot.Jv[b],
                     soa.matmul(soa.skew(c_W_dot), Jw)),
            soa.matmul(soa.skew(c_W), Jw_dot))

        omega = soa.matvec(Jw, v)
        omega_dot_bias = soa.matvec(Jw_dot, v)
        a_cm_bias = soa.matvec(J_cm_dot, v)

        I_cm_W = soa.matmul(soa.matmul(R, I_cm_B), soa.transpose(R))

        # Mass matrix contribution.
        for i in range(n_v):
            for j in range(i + 1):
                acc = M[i][j]
                for a in range(3):
                    acc = acc + mass * J_cm[a][i] * J_cm[a][j]
                for x in range(3):
                    for y in range(3):
                        acc = acc + Jw[x][i] * I_cm_W[x][y] * Jw[y][j]
                M[i][j] = acc

        # Coriolis/centrifugal bias and gravity.
        I_omega = soa.matvec(I_cm_W, omega)
        torque_bias = soa.vadd(soa.matvec(I_cm_W, omega_dot_bias),
                               soa.cross3(omega, I_omega))
        force_bias = [mass * a for a in a_cm_bias]
        for i in range(n_v):
            cor = jnp.zeros_like(like)
            grav = jnp.zeros_like(like)
            for a in range(3):
                cor = cor + Jw[a][i] * torque_bias[a] + \
                    J_cm[a][i] * force_bias[a]
                grav = grav + J_cm[a][i] * mass * g_W[a]
            F[i] = F[i] + grav - cor

    # Symmetrize M from the lower triangle.
    for i in range(n_v):
        for j in range(i + 1, n_v):
            M[i][j] = M[j][i]

    # Actuation columns.
    if model.n_u > 0:
        u_index = 0
        for body_index, body in enumerate(model.bodies):
            if body.joint.joint_type in ("revolute", "prismatic") and body.joint.actuated:
                v_off = model.body_v_offset(body_index)
                F[v_off] = F[v_off] + u[u_index]
                u_index += 1
    return M, F


def soa_multibody_terms_scalar(model: MultibodyModel, sp: dict, q: Svec,
                               v: Svec, u: Svec
                               ) -> Tuple[Smat, List[List[Array]], Array,
                                          Svec]:
    """SoA terms from scalarized derived parameters — the form a Pallas
    kernel body consumes directly (every parameter a 0-d scalar).
    See :func:`soa_multibody_terms` for semantics."""
    qdot = soa_configuration_rate(model, q, v)
    kin, kin_dot = jax.jvp(
        lambda q_inner: soa_body_kinematics(model, q_inner), (q,), (qdot,))

    M, F = soa_lagrangian_terms(model, sp["pi"], kin, kin_dot, v, u)
    phi, Jc = soa_contact_terms(model, sp, kin, q[0])
    a_nc = soa.spd_solve(M, F)
    return M, Jc, phi, a_nc


def soa_multibody_terms(model: MultibodyModel, params: MultibodyParams,
                        q: Svec, v: Svec, u: Svec
                        ) -> Tuple[Smat, List[List[Array]], Array, Svec]:
    """SoA port of ``terms.multibody_terms`` (shared FK + Coriolis JVP),
    matrix-free: no dense Delassus operator is formed.

    Returns:
        M: ``(n_v, n_v)`` smat mass matrix (``(B,)`` leaves).
        Jc: cone-major contact Jacobian, ``(3, n_v)`` nested list of
          ``(k, B)`` leaves.
        phi: ``(k, B)`` signed distances.
        a_nc: ``(n_v,)`` svec contact-free acceleration.
    """
    sp = scalarize_derived(model, derive_scalar_params(model, params))
    return soa_multibody_terms_scalar(model, sp, q, v, u)


# -- fused forward dynamics (rollouts) ----------------------------------------
def soa_forward_dynamics_batch(model: MultibodyModel,
                               params: MultibodyParams, x: Array,
                               w0: Array, dt: float,
                               dynamics_epsilon: float,
                               contact_filter_eps: float,
                               ipm_iterations: int,
                               newton_iterations: int,
                               solver_backend: str = "auto"
                               ) -> Tuple[Array, Array]:
    """Fused batched Anitescu forward dynamics: ``(B, n_x) -> (B, n_v)``.

    The batch-minor counterpart of
    ``MultibodyLearnableSystem.forward_dynamics_with_state`` for rollout
    scans: terms, the warm-started hybrid solve (short IPM phase +
    exact-line-search Newton from the better of the carried and IPM
    starts, cf. ``sap_solver.solve_cone_qp_hybrid_warm``), the contact
    activation filter, and the velocity update all run in SoA form.

    Args:
        x: ``(B, n_x)`` states.
        w0: ``(B, n_v)`` carried warm-start primals (zeros to cold-start).

    Returns:
        ``(v_plus (B, n_v), w (B, n_v))``.
    """
    n_q = model.n_q
    n_v = model.n_v
    dtype = x.dtype
    eps = jnp.asarray(dynamics_epsilon, dtype)

    xT = x.T
    q = soa.unstack(xT[:n_q])
    v = soa.unstack(xT[n_q:n_q + n_v])
    # Zero-control rollouts, matching the vmapped ``_partial_step``
    # convention — but the leaves must exist for actuated models because
    # ``soa_lagrangian_terms`` indexes ``u[u_index]`` per actuated joint.
    u_soa: List[Array] = [jnp.zeros_like(v[0])
                          for _ in range(model.n_u)]

    M, Jc, phi, a_nc = soa_multibody_terms(model, params, q, v, u_soa)
    v_minus = [v[i] + dt * a_nc[i] for i in range(n_v)]
    jv = soa_solver.j_dot(Jc, v_minus)
    qc = [jv[0] + phi / dt, jv[1], jv[2]]

    # Warm-started hybrid: short central path, then Newton from the
    # better of (carried w, IPM w) by primal cost — per sample. On TPU
    # the whole solve runs VMEM-resident in one Pallas kernel
    # (ops/soa_pallas.py), same code as the XLA path.
    w_carry = [w0.T[i][None, :] for i in range(n_v)]
    if solver_backend == "auto":
        solver_backend = ("pallas" if jax.default_backend() not in
                          ("cpu",) else "xla")
    if solver_backend in ("pallas", "pallas_interpret"):
        from dair_pll_tpu.ops.soa_pallas import solve_warm_hybrid_soa_pallas
        gamma, w, valid = solve_warm_hybrid_soa_pallas(
            M, Jc, qc, w_carry, float(dynamics_epsilon), ipm_iterations,
            newton_iterations,
            interpret=solver_backend == "pallas_interpret")
    else:
        gamma, w, valid = soa_solver.solve_warm_hybrid_soa(
            M, Jc, qc, w_carry, eps, ipm_iterations, newton_iterations)

    # Contact activation filter (inactive at physical scales; reference
    # multibody_learnable_system.py:262-301). Failure masking happens
    # inside the solve.
    active = phi <= contact_filter_eps
    gamma = [jnp.where(active, comp, jnp.zeros_like(comp))
             for comp in gamma]

    dv = soa.spd_solve(M, soa_solver.jt_dot(Jc, gamma))
    v_plus = jnp.stack(
        [(v_minus[i] + dv[i]).reshape(-1) for i in range(n_v)], axis=-1)
    w_out = jnp.stack([comp.reshape(-1) for comp in w], axis=-1)
    return v_plus, w_out


# -- ContactNets loss -------------------------------------------------------------
def soa_loss_parts(model: MultibodyModel, sp: dict, v: Svec,
                   q_plus: Svec, v_plus: Svec, u_soa: Svec, dt: float):
    """Everything before the cone solve: terms at the observed next state
    and the ContactNets QP pieces (cf.
    ``MultibodyLearnableSystem._contactnets_qp``).

    Returns:
        ``(M, Jc, phi, qc, dv)`` — mass smat, cone-major Jacobian, signed
        distances ``(k, B)``, QP linear cone field, velocity residual.
    """
    n_v = model.n_v
    M, Jc, phi, a_nc = soa_multibody_terms_scalar(
        model, sp, q_plus, v_plus, u_soa)

    # q_vec = q_pred + q_comp + q_diss, assembled as a cone field.
    dv = [v_plus[i] - (v[i] + a_nc[i] * dt) for i in range(n_v)]
    j_dv = soa_solver.j_dot(Jc, dv)
    j_vplus = soa_solver.j_dot(Jc, v_plus)

    s1, s2 = j_vplus[1], j_vplus[2]            # (k, B) sliding velocities
    sliding_sq = s1 * s1 + s2 * s2
    # Safe norm at exactly-resting contacts (value exact, gradient 0).
    at_rest = sliding_sq < 1e-24
    sliding_speed = jnp.sqrt(
        jnp.where(at_rest, jnp.ones_like(sliding_sq), sliding_sq))
    sliding_speed = jnp.where(at_rest, jnp.zeros_like(sliding_speed),
                              sliding_speed)
    qc = [-j_dv[0] + jnp.abs(phi) + dt * sliding_speed,
          -j_dv[1] + dt * s1,
          -j_dv[2] + dt * s2]
    return M, Jc, phi, qc, dv


def soa_loss_assemble(M: Smat, Jc, phi: Array, qc, dv: Svec, force,
                      valid: Array, eps) -> Array:
    """Loss given the (detached) solve result: ``0.5 f'(D + eps I) f +
    f'q + 0.5 dv'M dv + sum max(-phi, 0)^2`` with ``f'D f`` computed
    matrix-free as ``(J'f)' M^{-1} (J'f)``. Returns keepdims ``(1, B)``
    (kernel-compatible rank)."""
    jtf = soa_solver.jt_dot(Jc, force)
    minv_jtf = soa.spd_solve(M, jtf)
    f_sq = jnp.sum(force[0] ** 2 + force[1] ** 2 + force[2] ** 2,
                   axis=0, keepdims=True)
    f_dot_q = jnp.sum(force[0] * qc[0] + force[1] * qc[1] +
                      force[2] * qc[2], axis=0, keepdims=True)
    quad = soa.dot(jtf, minv_jtf) + eps * f_sq

    penetration = jnp.sum(jnp.maximum(-phi, 0.0) ** 2, axis=0,
                          keepdims=True)
    constant = 0.5 * soa.dot(dv, soa.matvec(M, dv)) + penetration

    loss = 0.5 * quad + f_dot_q + constant
    return jnp.where(valid, loss, jnp.zeros_like(loss))


def soa_contactnets_loss(model: MultibodyModel, params: MultibodyParams,
                         x: Array, u: Array, x_plus: Array, dt: float,
                         loss_epsilon: float, ipm_iterations: int,
                         newton_iterations: int,
                         solver_backend: str = "auto") -> Array:
    """Fused batched ContactNets loss: ``(B, n_x) -> (B,)``.

    Numerically matches ``MultibodyLearnableSystem.contactnets_loss``
    (same formulation, reference ``multibody_learnable_system.py:104-197``)
    with the hybrid solver; the whole computation — terms at the observed
    next state, detached cone solve, loss assembly — runs in batch-minor
    SoA form.
    """
    n_q = model.n_q
    n_v = model.n_v
    dtype = x.dtype
    eps = jnp.asarray(loss_epsilon, dtype)

    xT = x.T                      # (n_x, B)
    xpT = x_plus.T
    v = soa.unstack(xT[n_q:n_q + n_v])
    q_plus = soa.unstack(xpT[:n_q])
    v_plus = soa.unstack(xpT[n_q:n_q + n_v])
    u_soa = soa.unstack(u.T) if model.n_u > 0 else []

    sp = scalarize_derived(model, derive_scalar_params(model, params))
    M, Jc, phi, qc, dv = soa_loss_parts(
        model, sp, v, q_plus, v_plus, u_soa, dt)

    # Detached hybrid solve (envelope theorem, reference :172-184). On
    # TPU the whole solve runs VMEM-resident in one Pallas kernel
    # (ops/soa_pallas.py); elsewhere through the same SoA code under XLA.
    if solver_backend == "auto":
        solver_backend = ("pallas" if jax.default_backend() not in
                          ("cpu",) else "xla")
    sg = jax.lax.stop_gradient
    M_sg = jax.tree_util.tree_map(sg, M)
    Jc_sg = jax.tree_util.tree_map(sg, Jc)
    qc_sg = jax.tree_util.tree_map(sg, qc)
    if solver_backend in ("pallas", "pallas_interpret"):
        from dair_pll_tpu.ops.soa_pallas import (
            solve_contact_impulse_soa_pallas)
        force, valid = solve_contact_impulse_soa_pallas(
            M_sg, Jc_sg, qc_sg, float(loss_epsilon), ipm_iterations,
            newton_iterations,
            interpret=solver_backend == "pallas_interpret")
    else:
        force, valid = soa_solver.solve_contact_impulse_soa(
            M_sg, Jc_sg, qc_sg, eps, ipm_iterations, newton_iterations)
    force = jax.tree_util.tree_map(sg, force)

    loss = soa_loss_assemble(M, Jc, phi, qc, dv, force, valid, eps)
    # ``valid`` carries a keepdims leading axis from the solver's (1, B)
    # reductions; flatten so the promised (B,) contract actually holds
    # for direct callers (not just the batch_shape-reshaping caller).
    return loss.reshape(-1)


def soa_contactnets_loss_warm(model: MultibodyModel,
                              params: MultibodyParams, x: Array,
                              u: Array, x_plus: Array, dt: float,
                              loss_epsilon: float, ipm_iterations: int,
                              newton_iterations: int, force_prev,
                              solver_backend: str = "auto"
                              ) -> Tuple[Array, list, Array]:
    """Epoch-warm-started fused ContactNets loss.

    Like :func:`soa_contactnets_loss`, but the detached hybrid solve
    warm-starts from the impulses the SAME samples solved to on a
    previous visit (epoch-warm training): the carried primal is
    ``w = M^{-1} J^T gamma_prev`` at the CURRENT parameters, and
    SAP-Newton starts from the better (by primal cost) of that and a
    short ``ipm_iterations`` central path
    (:func:`~dair_pll_tpu.ops.soa_solver.solve_warm_hybrid_soa`).
    ``force_prev`` is a cone field of ``(k, B)`` leaves (e.g. the
    ``force`` this function returned on the previous epoch; zeros ==
    cold samples, which the primal-cost selection routes to the IPM
    iterate).

    Returns ``(loss (B,), force cone field, valid (1, B))`` so the
    caller can refresh its per-sample impulse cache — ``force`` is
    already detached.
    """
    n_q = model.n_q
    n_v = model.n_v
    dtype = x.dtype
    eps = jnp.asarray(loss_epsilon, dtype)

    xT = x.T
    xpT = x_plus.T
    v = soa.unstack(xT[n_q:n_q + n_v])
    q_plus = soa.unstack(xpT[:n_q])
    v_plus = soa.unstack(xpT[n_q:n_q + n_v])
    u_soa = soa.unstack(u.T) if model.n_u > 0 else []

    sp = scalarize_derived(model, derive_scalar_params(model, params))
    M, Jc, phi, qc, dv = soa_loss_parts(
        model, sp, v, q_plus, v_plus, u_soa, dt)

    sg = jax.lax.stop_gradient
    M_sg = jax.tree_util.tree_map(sg, M)
    Jc_sg = jax.tree_util.tree_map(sg, Jc)
    qc_sg = jax.tree_util.tree_map(sg, qc)
    force_prev = jax.tree_util.tree_map(sg, force_prev)
    w_carry = soa.spd_solve(M_sg, soa_solver.jt_dot(Jc_sg, force_prev))

    if solver_backend == "auto":
        solver_backend = ("pallas" if jax.default_backend() not in
                          ("cpu",) else "xla")
    if solver_backend in ("pallas", "pallas_interpret"):
        from dair_pll_tpu.ops.soa_pallas import (
            solve_warm_hybrid_soa_pallas)
        force, _, valid = solve_warm_hybrid_soa_pallas(
            M_sg, Jc_sg, qc_sg, w_carry, float(loss_epsilon),
            ipm_iterations, newton_iterations,
            interpret=solver_backend == "pallas_interpret")
    else:
        force, _, valid = soa_solver.solve_warm_hybrid_soa(
            M_sg, Jc_sg, qc_sg, w_carry, eps, ipm_iterations,
            newton_iterations)
    force = jax.tree_util.tree_map(sg, force)

    loss = soa_loss_assemble(M, Jc, phi, qc, dv, force, valid, eps)
    return loss.reshape(-1), force, valid
