r"""Per-cone (cone-major) Lorentz-cone primitives for TPU.

The contact stack's cone operations act on ``k`` independent 3-dimensional
second-order cones. The stacked layout ``[n_1..n_k, t_1x t_1y ..]`` used
at the API boundary (reference ``tensor_utils.py:369-458`` conventions)
is hostile to TPU tiling when expanded to ``(3k, 3k)`` operators: batched
tiny dot_generals materialize padded ``T(8,128)`` layouts (the round-1
``small_matmul`` finding, see ``ops/tensor.py``). This module instead
keeps everything in cone-major ``(k, 3)`` vector form and expresses every
operator **matrix-free** — projections, projection-Jacobian actions,
Jordan algebra, Nesterov–Todd scalings — as broadcast-multiply-reduce
that XLA fuses into VPU code with no padded intermediates.

Shapes: ``u`` is ``(k, 3)`` with the cone scalar ("normal") component
first; callers ``vmap`` over batches.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import Array

_SAFE_FLOOR = 1e-30


def stacked_to_cone_major(x: Array) -> Array:
    """``(3k,)`` stacked ``[normals; tangents]`` -> ``(k, 3)``."""
    k = x.shape[-1] // 3
    return jnp.concatenate((x[..., :k, None],
                            x[..., k:].reshape(*x.shape[:-1], k, 2)),
                           axis=-1)


def cone_major_to_stacked(u: Array) -> Array:
    """``(k, 3)`` -> ``(3k,)`` stacked layout."""
    return jnp.concatenate(
        (u[..., 0], u[..., 1:].reshape(*u.shape[:-2], -1)), axis=-1)


def rows_to_cone_major(J: Array) -> Array:
    """``(3k, n)`` stacked-row operator -> ``(k, 3, n)`` cone-major."""
    k = J.shape[-2] // 3
    n = J.shape[-1]
    normals = J[..., :k, :].reshape(*J.shape[:-2], k, 1, n)
    tangents = J[..., k:, :].reshape(*J.shape[:-2], k, 2, n)
    return jnp.concatenate((normals, tangents), axis=-2)


def det(u: Array) -> Array:
    """SOC Jordan determinant ``u0^2 - ||u1||^2``: ``(k, 3) -> (k,)``."""
    return u[..., 0] ** 2 - jnp.sum(u[..., 1:] ** 2, axis=-1)


def project(u: Array) -> Array:
    """Euclidean projection onto the cone, per cone (branchless).

    Matches ``tensor.project_lorentz`` (reference ``tensor_utils.py:393``)
    in cone-major form.
    """
    n = u[..., 0]
    t = u[..., 1:]
    s = jnp.sqrt(jnp.maximum(jnp.sum(t * t, axis=-1), _SAFE_FLOOR))
    in_cone = s <= n
    in_polar = s <= -n
    h = 0.5 * (n + s)                    # boundary-region normal height
    coeff = jnp.where(in_cone, 1.0, jnp.where(in_polar, 0.0, h / s))
    n_out = jnp.where(in_cone, n, jnp.where(in_polar, 0.0, h))
    return jnp.concatenate((n_out[..., None], coeff[..., None] * t),
                           axis=-1)


def projection_jacobian_apply(z: Array, u: Array) -> Array:
    r"""Applies the projection's generalized Jacobian at ``z`` to ``u``,
    matrix-free: ``D(z) u`` per cone.

    Regions (cf. ``cone_solver._projection_jacobian``): inside the cone
    ``D = I``; inside the polar ``D = 0``; in the boundary region with
    ``s = ||t||``, ``hat = t/s``, ``h = (n+s)/2``:

    .. math::
       D u = \begin{pmatrix} (u_0 + \hat t \cdot u_t)/2 \\
          u_0 \hat t/2 + (h/s)(u_t - \hat t(\hat t\cdot u_t))
          + \hat t (\hat t \cdot u_t)/2 \end{pmatrix}
    """
    n = z[..., 0]
    t = z[..., 1:]
    s = jnp.sqrt(jnp.maximum(jnp.sum(t * t, axis=-1), _SAFE_FLOOR))
    hat = t / s[..., None]
    in_cone = s <= n
    in_polar = s <= -n

    u0 = u[..., 0]
    ut = u[..., 1:]
    hat_dot = jnp.sum(hat * ut, axis=-1)
    h_over_s = 0.5 * (n + s) / s

    b0 = 0.5 * (u0 + hat_dot)
    bt = 0.5 * u0[..., None] * hat + \
        h_over_s[..., None] * (ut - hat * hat_dot[..., None]) + \
        0.5 * hat * hat_dot[..., None]
    out0 = jnp.where(in_cone, u0, jnp.where(in_polar, 0.0, b0))
    out_t = jnp.where(in_cone[..., None], ut,
                      jnp.where(in_polar[..., None], 0.0, bt))
    return jnp.concatenate((out0[..., None], out_t), axis=-1)


def projection_jacobian_matrix(z: Array) -> Array:
    """Dense per-cone projection Jacobian ``(k, 3, 3)`` (for contractions
    like ``J^T D J`` that need the blocks explicitly)."""
    n = z[..., 0]
    t = z[..., 1:]
    s = jnp.sqrt(jnp.maximum(jnp.sum(t * t, axis=-1), _SAFE_FLOOR))
    hat = t / s[..., None]
    in_cone = s <= n
    in_polar = s <= -n
    h_over_s = (0.5 * (n + s) / s)[..., None, None]

    eye2 = jnp.eye(2, dtype=z.dtype)
    hhT = hat[..., :, None] * hat[..., None, :]
    # boundary blocks
    b_nn = jnp.full(n.shape, 0.5, z.dtype)
    b_nt = 0.5 * hat
    b_tt = h_over_s * (eye2 - hhT) + 0.5 * hhT

    top = jnp.concatenate((b_nn[..., None, None],
                           b_nt[..., None, :]), axis=-1)
    bottom = jnp.concatenate((b_nt[..., :, None], b_tt), axis=-1)
    D_boundary = jnp.concatenate((top, bottom), axis=-2)

    eye3 = jnp.eye(3, dtype=z.dtype)
    return jnp.where(in_cone[..., None, None], eye3,
                     jnp.where(in_polar[..., None, None],
                               jnp.zeros_like(D_boundary), D_boundary))


def jordan_product(u: Array, v: Array) -> Array:
    """Per-cone Jordan product ``u o v = (u.v, u0 v1 + v0 u1)``."""
    scalar = jnp.sum(u * v, axis=-1, keepdims=True)
    vector = u[..., :1] * v[..., 1:] + v[..., :1] * u[..., 1:]
    return jnp.concatenate((scalar, vector), axis=-1)


def arrow_solve(u: Array, b: Array) -> Array:
    """Solves ``Arw(u) y = b`` per cone analytically."""
    d = jnp.where(jnp.abs(det(u)) > _SAFE_FLOOR, det(u), _SAFE_FLOOR)
    u0 = u[..., :1]
    u1 = u[..., 1:]
    b0 = b[..., :1]
    b1 = b[..., 1:]
    y0 = (u0 * b0 - jnp.sum(u1 * b1, axis=-1, keepdims=True)) / \
        d[..., None]
    y1 = (b1 - y0 * u1) / u0
    return jnp.concatenate((y0, y1), axis=-1)


class NTScaling(NamedTuple):
    """Matrix-free Nesterov–Todd scaling: ``W u = eta (2 v (v.u) - R u)``
    with ``R = diag(1, -1, -1)`` and ``v`` the Jordan square root of the
    normalized scaling point."""
    v: Array        # (k, 3), det(v) = 1
    eta: Array      # (k,)

    def apply(self, u: Array) -> Array:
        """``W u`` per cone."""
        vu = jnp.sum(self.v * u, axis=-1, keepdims=True)
        Ru = _reflect(u)
        return self.eta[..., None] * (2.0 * self.v * vu - Ru)

    def apply_inverse(self, u: Array) -> Array:
        """``W^{-1} u`` per cone (``v^{-1} = R v`` for det-1 elements)."""
        v_inv = _reflect(self.v)
        vu = jnp.sum(v_inv * u, axis=-1, keepdims=True)
        Ru = _reflect(u)
        return (2.0 * v_inv * vu - Ru) / self.eta[..., None]


def _reflect(u: Array) -> Array:
    """``R u`` with ``R = diag(1, -1, -1)``."""
    return jnp.concatenate((u[..., :1], -u[..., 1:]), axis=-1)


def nt_scaling(x: Array, z: Array) -> Tuple[NTScaling, Array]:
    """Computes the per-cone NT scaling and the scaled point
    ``lam = W x``."""
    det_x = jnp.maximum(det(x), _SAFE_FLOOR)
    det_z = jnp.maximum(det(z), _SAFE_FLOOR)
    x_bar = x / jnp.sqrt(det_x)[..., None]
    z_bar = z / jnp.sqrt(det_z)[..., None]
    gamma = jnp.sqrt(jnp.maximum(
        0.5 * (1.0 + jnp.sum(x_bar * z_bar, axis=-1)), 1e-15))
    w_bar = (z_bar + _reflect(x_bar)) / (2.0 * gamma[..., None])
    e = jnp.zeros_like(w_bar).at[..., 0].set(1.0)
    v = (w_bar + e) / jnp.sqrt(2.0 * (w_bar[..., :1] + 1.0))
    eta = (det_z / det_x) ** 0.25
    scaling = NTScaling(v=v, eta=eta)
    return scaling, scaling.apply(x)


def nt_w2_inverse_matrix(scaling: NTScaling, eps: Array) -> Array:
    r"""Dense per-cone inverse of ``W^2 + eps I`` as ``(k, 3, 3)``.

    ``W^2 = eta^2 (2 \bar w \bar w^T - R)`` with ``\bar w = v o v`` (the
    squared scaling point), so ``A = W^2 + eps I`` is a 3x3 symmetric
    matrix inverted analytically via the adjugate (branchless; A is SPD
    for interior points).
    """
    w_bar = jordan_product(scaling.v, scaling.v)
    eta2 = (scaling.eta ** 2)[..., None, None]
    wwT = w_bar[..., :, None] * w_bar[..., None, :]
    R = jnp.diag(jnp.asarray([1.0, -1.0, -1.0], scaling.v.dtype))
    A = eta2 * (2.0 * wwT - R) + eps * jnp.eye(3, dtype=scaling.v.dtype)
    return sym3_inverse(A)


def sym3_inverse(A: Array) -> Array:
    """Analytic inverse of symmetric ``(..., 3, 3)`` matrices via the
    adjugate (branchless)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e = A[..., 1, 1], A[..., 1, 2]
    f = A[..., 2, 2]
    co_a = d * f - e * e
    co_b = c * e - b * f
    co_c = b * e - c * d
    co_d = a * f - c * c
    co_e = b * c - a * e
    co_f = a * d - b * b
    det3 = a * co_a + b * co_b + c * co_c
    det3 = jnp.where(jnp.abs(det3) > _SAFE_FLOOR, det3, _SAFE_FLOOR)
    row0 = jnp.stack((co_a, co_b, co_c), axis=-1)
    row1 = jnp.stack((co_b, co_d, co_e), axis=-1)
    row2 = jnp.stack((co_c, co_e, co_f), axis=-1)
    adj = jnp.stack((row0, row1, row2), axis=-2)
    return adj / det3[..., None, None]


def cone_matvec(A: Array, u: Array) -> Array:
    """Per-cone ``(k, 3, 3) @ (k, 3)`` as broadcast-multiply-reduce."""
    return jnp.sum(A * u[..., None, :], axis=-1)


def step_to_boundary(u: Array, du: Array) -> Array:
    r"""Largest ``alpha`` in ``[0, 1]`` keeping ``u + alpha du`` in every
    cone. Cone-major version of ``socp_solver._step_to_boundary``:
    crossings are the smallest nonnegative roots of the det quadratic
    (including roots at ~0 — an iterate ON the wall whose direction
    exits must get 0) and the scalar-component zero crossing.
    """
    dtype = u.dtype
    A = det(du)
    B = 2.0 * jnp.sum(u * _reflect(du), axis=-1)
    C = jnp.maximum(det(u), 0.0)

    disc = B * B - 4.0 * A * C
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    tiny = jnp.asarray(_SAFE_FLOOR, dtype)
    safe_A = jnp.where(jnp.abs(A) > tiny, A, tiny)
    safe_B = jnp.where(jnp.abs(B) > tiny, B, tiny)
    r1 = (-B - sqrt_disc) / (2.0 * safe_A)
    r2 = (-B + sqrt_disc) / (2.0 * safe_A)
    lin = -C / safe_B
    is_linear = jnp.abs(A) <= 1e-14 * jnp.maximum(jnp.abs(B), 1.0)
    lin_crossing = is_linear & (B < 0.0)
    roots = jnp.stack((
        jnp.where(is_linear, jnp.where(lin_crossing, lin, 2.0), r1),
        jnp.where(is_linear, 2.0, r2)))
    valid = (roots >= -1e-12) & (disc >= 0.0)[None]
    pos = jnp.where(valid, jnp.maximum(roots, 0.0), 2.0)
    alpha_det = jnp.min(pos, axis=0)

    du0 = du[..., 0]
    alpha_scalar = jnp.where(du0 < 0.0, jnp.maximum(
        u[..., 0], 0.0) / jnp.where(du0 < 0.0, -du0, tiny), 2.0)
    alpha = jnp.minimum(alpha_det, alpha_scalar)
    return jnp.minimum(jnp.min(alpha, axis=-1), 1.0)
