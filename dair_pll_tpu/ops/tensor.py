r"""Batched tensor utilities for multibody dynamics, TPU-native.

JAX counterparts of the reference's ``tensor_utils.py``
(``/root/reference/dair_pll/tensor_utils.py``). Index-fancy or masked
implementations in the reference (e.g. ``rotation_matrix_from_one_vector``
at ``tensor_utils.py:305-366``, ``project_lorentz`` at ``:393-458``) are
rewritten branchless so they jit/vmap/grad cleanly and map onto the TPU VPU.

Force-variable ordering convention (matching the reference,
``tensor_utils.py:369-390``): stacked contact impulses are laid out as
``[n_1 .. n_k, t_1x, t_1y, .. t_kx, t_ky]`` — all normal components first,
then per-contact tangential pairs.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "pbmm",
    "skew_symmetric",
    "symmetric_offdiagonal",
    "spatial_to_point_jacobian",
    "rotation_matrix_from_one_vector",
    "broadcast_lorentz",
    "project_lorentz",
    "lorentz_interleave_mat",
]


def pbmm(a: Array, b: Array) -> Array:
    """Batched matrix multiply with broadcasting over leading dims.

    JAX's ``@`` already broadcasts; provided for API parity with reference
    ``tensor_utils.py:49``.
    """
    return jnp.matmul(a, b)


def small_matmul(a: Array, b: Array) -> Array:
    r"""Matrix product of *tiny* matrices as broadcast-multiply-reduce.

    For contraction dims of a few (the 3x3 rotations and (3, n_v)
    Jacobians of the physics hot path), XLA lowers ``@``/``einsum`` to
    ``dot_general`` custom ops whose batched outputs materialize with
    padded batch-major layouts on TPU (e.g. ``(B, 4, 3, 6)`` tiled
    ``T(4,128)`` — a ~20x HBM inflation). Expressing the product as an
    elementwise multiply + ``sum`` keeps it inside VPU fusions (measured
    ~1.5x on the contact-terms gradient at batch 65536). Do NOT use for
    large contractions — those belong on the MXU.

    Args:
        a: ``(*, m, k)`` left factors.
        b: ``(*, k, n)`` right factors (leading dims broadcast).

    Returns:
        ``(*, m, n)`` products.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def small_matvec(a: Array, v: Array) -> Array:
    """Matrix-vector product of tiny operands as multiply-reduce
    (see :func:`small_matmul`).

    Args:
        a: ``(*, m, k)``; v: ``(*, k)``.

    Returns:
        ``(*, m)``.
    """
    return jnp.sum(a * v[..., None, :], axis=-1)


def skew_symmetric(vectors: Array) -> Array:
    r"""Batch of vectors to skew-symmetric cross-product matrices.

    Mirrors reference ``tensor_utils.py:137``: ``S(v) @ p == v x p``.

    Args:
        vectors: ``(*, 3)`` vector batch.

    Returns:
        ``(*, 3, 3)`` skew-symmetric matrix batch.
    """
    x, y, z = vectors[..., 0], vectors[..., 1], vectors[..., 2]
    zero = jnp.zeros_like(x)
    row0 = jnp.stack((zero, -z, y), axis=-1)
    row1 = jnp.stack((z, zero, -x), axis=-1)
    row2 = jnp.stack((-y, x, zero), axis=-1)
    return jnp.stack((row0, row1, row2), axis=-2)


def symmetric_offdiagonal(vectors: Array) -> Array:
    r"""Batch of vectors to symmetric off-diagonal-only matrices.

    Mirrors reference ``tensor_utils.py:165``: for ``v = [a, b, c]`` returns::

        [[0, c, b],
         [c, 0, a],
         [b, a, 0]]

    Args:
        vectors: ``(*, 3)`` vector batch.

    Returns:
        ``(*, 3, 3)`` symmetric matrix batch with zero diagonal.
    """
    a, b, c = vectors[..., 0], vectors[..., 1], vectors[..., 2]
    zero = jnp.zeros_like(a)
    row0 = jnp.stack((zero, c, b), axis=-1)
    row1 = jnp.stack((c, zero, a), axis=-1)
    row2 = jnp.stack((b, a, zero), axis=-1)
    return jnp.stack((row0, row1, row2), axis=-2)


def spatial_to_point_jacobian(p_BoP_E: Array) -> Array:
    r"""Jacobian of a body-fixed point's linear velocity w.r.t. the body's
    spatial velocity ``[omega; v_Bo]`` (both in frame E coordinates).

    ``J = [-S(p), I_3]`` — see reference ``tensor_utils.py:257-302``.

    Args:
        p_BoP_E: ``(*, 3)`` body-frame point(s).

    Returns:
        ``(*, 3, 6)`` Jacobian batch.
    """
    left = -skew_symmetric(p_BoP_E)
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=p_BoP_E.dtype), p_BoP_E.shape[:-1] + (3, 3))
    return jnp.concatenate((left, eye), axis=-1)


def rotation_matrix_from_one_vector(directions: Array, axis: int) -> Array:
    r"""Builds rotation matrices whose ``axis`` column equals ``directions``.

    Branchless reimplementation of Drake's ``MakeFromOneVector`` algorithm
    (see reference ``tensor_utils.py:305-366``): the minimum-magnitude
    component of each direction is located with ``argmin``, and the
    index-dependent construction is realized with one-hot selectors instead
    of fancy indexing, so the whole computation is jit/vmap-safe.

    Args:
        directions: ``(*, 3)`` direction batch (need not be unit length).
        axis: 0, 1, or 2 — which column of the result holds the direction.

    Returns:
        ``(*, 3, 3)`` rotation-matrix batch.
    """
    assert axis in (0, 1, 2)
    a = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

    # i = argmin_k |a_k|; j = i+1 mod 3; k = j+1 mod 3 (as one-hot selectors).
    abs_a = jnp.abs(a)
    i_idx = jnp.argmin(abs_a, axis=-1)
    e_i = jnp.eye(3, dtype=a.dtype)[i_idx]                     # (*, 3)
    e_j = jnp.roll(e_i, 1, axis=-1)
    e_k = jnp.roll(e_i, 2, axis=-1)

    a_i = jnp.sum(a * e_i, axis=-1, keepdims=True)
    a_j = jnp.sum(a * e_j, axis=-1, keepdims=True)
    a_k = jnp.sum(a * e_k, axis=-1, keepdims=True)

    # |a_i| <= 1/sqrt(3) so mag_u in [sqrt(2/3), 1]: no clamping needed.
    mag_u = jnp.sqrt(1.0 - a_i * a_i)
    corr = -a_i / mag_u

    column_b = e_j * (-a_k / mag_u) + e_k * (a_j / mag_u)
    column_c = e_i * mag_u + e_j * (corr * a_j) + e_k * (corr * a_k)

    columns = [None, None, None]
    columns[axis] = a
    columns[(axis + 1) % 3] = column_b
    columns[(axis + 2) % 3] = column_c
    return jnp.stack(columns, axis=-1)


def broadcast_lorentz(vectors: Array) -> Array:
    r"""Broadcast per-cone scalars into the stacked Lorentz layout.

    Maps ``v = [v_1 .. v_n]`` to ``[v_1 .. v_n, v_1, v_1, .. v_n, v_n]``
    matching the ``[normals; tangent pairs]`` impulse ordering. Mirrors
    reference ``tensor_utils.py:369-390``.

    Args:
        vectors: ``(*, n)`` per-cone scalars.

    Returns:
        ``(*, 3n)`` broadcast vectors.
    """
    n = vectors.shape[-1]
    tiled = jnp.repeat(vectors, 2, axis=-1)
    return jnp.concatenate((vectors, tiled), axis=-1)


def project_lorentz(vectors: Array) -> Array:
    r"""Projects stacked vectors onto the product of Lorentz (ice-cream) cones.

    Input layout is ``[n_1 .. n_k, t_1x t_1y .. t_kx t_ky]``. Each cone
    element ``(n_i, t_i)`` is projected onto ``{n >= ||t||}``:

        * inside the cone: unchanged,
        * inside the polar cone ``{-n >= ||t||}``: zero,
        * otherwise: ``((n + ||t||)/2) * [1; t/||t||]``.

    Branchless rewrite of reference ``tensor_utils.py:393-458``.

    Args:
        vectors: ``(*, 3k)`` stacked cone variables.

    Returns:
        ``(*, 3k)`` projected vectors.
    """
    k = vectors.shape[-1] // 3
    normals = vectors[..., :k]
    tangents = vectors[..., k:]
    t_pairs = tangents.reshape(tangents.shape[:-1] + (k, 2))
    eps = jnp.asarray(1e-30, dtype=vectors.dtype)
    t_sq = jnp.sum(t_pairs * t_pairs, axis=-1)
    t_norm = jnp.sqrt(jnp.maximum(t_sq, eps))

    in_cone = t_norm <= normals
    in_polar = t_norm <= -normals

    half = 0.5 * (normals + t_norm)
    n_proj = jnp.where(in_cone, normals, jnp.where(in_polar, 0.0, half))
    t_scale = jnp.where(
        in_cone, jnp.ones_like(t_norm),
        jnp.where(in_polar, 0.0, half / t_norm))
    t_proj = (t_pairs * t_scale[..., None]).reshape(tangents.shape)
    return jnp.concatenate((n_proj, t_proj), axis=-1)


def lorentz_interleave_mat(n_cones: int, dtype=jnp.float32) -> Array:
    r"""0-1 matrix mapping per-cone-interleaved variables to stacked layout.

    ``lambda_stacked = M @ lambda_interleaved`` where the interleaved layout
    is ``[t_1x t_1y n_1, .. t_kx t_ky n_k]`` (the reference's ``sappy``
    ordering, ``tensor_utils.py:460-497``) and stacked is
    ``[n_1..n_k, t_1x t_1y ..]``. Kept for solver-layout experiments.

    Args:
        n_cones: number of contacts ``k``.

    Returns:
        ``(3k, 3k)`` permutation matrix.
    """
    m = jnp.zeros((3 * n_cones, 3 * n_cones), dtype=dtype)
    for cone in range(n_cones):
        m = m.at[cone, 3 * cone + 2].set(1.0)
        m = m.at[n_cones + 2 * cone, 3 * cone].set(1.0)
        m = m.at[n_cones + 2 * cone + 1, 3 * cone + 1].set(1.0)
    return m
