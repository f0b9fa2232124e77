r"""Contact terms and combined multibody dynamics terms.

Replaces the reference's ``ContactTerms``/``MultibodyTerms``
(``/root/reference/dair_pll/multibody_terms.py:253-656``): signed distances
``phi(q)``, the contact Jacobian ``J(q)`` in ``[J_n; mu J_t]`` ordering, the
Delassus operator ``D(q) = J M^{-1} J^T``, and the contact-free
acceleration — all as pure, unbatched functions of ``(model, params, q, v,
u)``. Callers ``vmap`` over batches; every shape is static (fixed contact
count per collision pair) so the whole pipeline jits.

Contact impulse layout (matching the reference, ``multibody_terms.py:
401-426`` and ``tensor_utils.py:369-390``): with ``k`` contact points the
stacked impulse is ``[n_1 .. n_k, t_1x t_1y .. t_kx t_ky]``; the friction
coefficient is folded into the tangential Jacobian rows so the feasible set
is the product of *unit* Lorentz cones.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu import geometry as geometry_mod
from dair_pll_tpu.multibody.dynamics import lagrangian_terms
from dair_pll_tpu.multibody.kinematics import (body_kinematics,
                                               geometry_kinematics)
from dair_pll_tpu.ops.tensor import (skew_symmetric, small_matmul,
                                     small_matvec)


def contact_terms(model, params, q: Array) -> Tuple[Array, Array]:
    """Signed distances and contact Jacobian for all collision candidates.

    Mirrors the per-pair sweep of reference ``ContactTerms.forward``
    (``multibody_terms.py:428-521``) as a static Python loop (pair count and
    contact counts are fixed at trace time).

    Args:
        model: multibody model.
        params: :class:`MultibodyParams`.
        q: ``(n_q,)`` configuration.

    Returns:
        phi: ``(n_contacts,)`` signed distances.
        J: ``(3 n_contacts, n_v)`` contact Jacobian ``[J_n; mu J_t]``.
    """
    kin = body_kinematics(model, q)
    R_WG, p_WG, Jw_G, Jv_G = geometry_kinematics(model, kin, q)
    return _assemble_contact_terms(model, params, R_WG, p_WG, Jw_G, Jv_G)


def _assemble_contact_terms(model, params, R_WG, p_WG, Jw_G,
                            Jv_G) -> Tuple[Array, Array]:
    """Collision sweep + Jacobian assembly from geometry kinematics."""
    mu_all = params.friction_coefficients()

    phi_list = []
    jac_rows = []  # per contact: (3, n_v) relative velocity Jacobian rows
    mu_list = []

    for pair_index, (a, b) in enumerate(model.collision_candidates):
        spec_a = model.geometries[a]
        spec_b = model.geometries[b]
        R_WA, p_WA = R_WG[a], p_WG[a]
        R_WB, p_WB = R_WG[b], p_WG[b]

        R_AB = small_matmul(R_WA.T, R_WB)
        p_AoBo_A = small_matvec(R_WA.T, p_WB - p_WA)

        phi_i, R_AC, p_AoAc_A, p_BoBc_B = geometry_mod.collide(
            spec_a, params.geometry[a], spec_b, params.geometry[b],
            R_AB, p_AoBo_A)

        # Contact frames in world coordinates, (n_c, 3, 3). All the tiny
        # matrix products below use small_matmul so they stay inside VPU
        # fusions instead of lowering to padded batched dot_generals.
        R_WF = small_matmul(R_WA, R_AC)

        # Witness-point velocity Jacobians: shift body-origin Jacobians to
        # the contact points (reference multibody_terms.py:384-399).
        off_A_W = small_matvec(R_WA[None], p_AoAc_A)    # (n_c, 3)
        off_B_W = small_matvec(R_WB[None], p_BoBc_B)
        J_Ac = Jv_G[a][None] - small_matmul(
            skew_symmetric(off_A_W), Jw_G[a][None])
        J_Bc = Jv_G[b][None] - small_matmul(
            skew_symmetric(off_B_W), Jw_G[b][None])

        # Relative contact-point velocity in the contact frame, rows
        # ordered [t_x, t_y, n] with n = z (reference geometry contract).
        J_rel_F = small_matmul(
            jnp.swapaxes(R_WF, -1, -2), J_Bc - J_Ac)     # (n_c, 3, n_v)

        # Drake-style friction combination (multibody_terms.py:471).
        mu_a, mu_b = mu_all[a], mu_all[b]
        mu_pair = (2.0 * mu_a * mu_b) / (mu_a + mu_b)

        phi_list.append(phi_i)
        jac_rows.append(J_rel_F)
        mu_list.append(
            jnp.broadcast_to(mu_pair, (phi_i.shape[0],)))

    phi = jnp.concatenate(phi_list, axis=0)                    # (k,)
    J_rel = jnp.concatenate(jac_rows, axis=0)                  # (k, 3, n_v)
    mu = jnp.concatenate(mu_list, axis=0)                      # (k,)

    # Assemble [J_n; mu J_t] (reference multibody_terms.py:401-426).
    J_n = J_rel[:, 2, :]                                       # (k, n_v)
    J_t = (mu[:, None, None] * J_rel[:, :2, :]).reshape(
        -1, J_rel.shape[-1])                                   # (2k, n_v)
    J = jnp.concatenate((J_n, J_t), axis=0)                    # (3k, n_v)
    return phi, J


def _contact_terms_from_kinematics(model, params, kin, q: Array
                                   ) -> Tuple[Array, Array]:
    """Contact terms given precomputed body kinematics (hot-path variant
    sharing FK with the Lagrangian terms)."""
    R_WG, p_WG, Jw_G, Jv_G = geometry_kinematics(model, kin, q)
    return _assemble_contact_terms(model, params, R_WG, p_WG, Jw_G, Jv_G)


def multibody_terms(model, params, q: Array, v: Array,
                    u: Array) -> Tuple[Array, Array, Array, Array, Array]:
    """All dynamics terms at a state: ``(D, M, J, phi, a_nc)``.

    Matches the contract of reference ``MultibodyTerms.forward``
    (``multibody_terms.py:584-609``): Delassus operator
    ``D = J M^{-1} J^T``, mass matrix ``M``, contact Jacobian ``J``, signed
    distances ``phi``, and contact-free acceleration ``M^{-1} F``.

    Forward kinematics and its time-derivative (for Coriolis terms) are
    computed ONCE and shared between the Lagrangian and contact terms —
    the dominant cost at large batch is this kinematics sweep, so the
    sharing matters (the reference instead evaluates separate codegen'd
    callbacks per term family, ``multibody_terms.py:584-609``).

    Args:
        model: multibody model.
        params: :class:`MultibodyParams`.
        q: ``(n_q,)`` configuration; v: ``(n_v,)`` velocity; u: ``(n_u,)``.

    Returns:
        delassus ``(3k, 3k)``, M ``(n_v, n_v)``, J ``(3k, n_v)``,
        phi ``(k,)``, a_nc ``(n_v,)``.
    """
    from dair_pll_tpu.multibody.dynamics import (
        lagrangian_terms_from_kinematics)
    from dair_pll_tpu.multibody.kinematics import (body_kinematics,
                                                   configuration_rate)

    pi_cm = params.pi_cm()
    qdot = configuration_rate(model, q, v)
    kin, kin_dot = jax.jvp(
        lambda q_inner: body_kinematics(model, q_inner), (q,), (qdot,))

    M, F = lagrangian_terms_from_kinematics(model, pi_cm, kin, kin_dot, v,
                                            u)
    phi, J = _contact_terms_from_kinematics(model, params, kin, q)

    # Unrolled small-matrix Cholesky: fuses into neighboring work instead
    # of lowering to a (slow, batched-tiny) custom call.
    from dair_pll_tpu.ops.linear import cho_solve_unrolled, \
        cholesky_unrolled
    L = cholesky_unrolled(M)
    Minv_JT = cho_solve_unrolled(L, J.T)                       # (n_v, 3k)
    delassus = small_matmul(J, Minv_JT)
    a_nc = cho_solve_unrolled(L, F)
    return delassus, M, J, phi, a_nc
