r"""Batch-minor (SoA) Lorentz-cone primitives.

The structure-of-arrays counterpart of ``ops/cones.py``: a cone point is
an ``soa.Svec`` of length 3 (``[n, t1, t2]``, each a ``(B,)`` batched
scalar) and a product-cone state is a Python list of ``k`` such points.
Every operator is the same branchless math as ``ops/cones.py`` (which
documents the derivations and reference correspondence), unrolled so the
only array axis anywhere is the batch — the layout that tiles perfectly
on TPU (see ``ops/soa.py``).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from jax import Array, lax

from dair_pll_tpu.ops import soa
from dair_pll_tpu.ops.soa import Smat, Svec

Cone = Svec          # [n, t1, t2]
Cones = List[Svec]   # k cones

_SAFE_FLOOR = 1e-30


def det(u: Cone) -> Array:
    return u[0] * u[0] - u[1] * u[1] - u[2] * u[2]


def reflect(u: Cone) -> Cone:
    return [u[0], -u[1], -u[2]]


def project(u: Cone) -> Cone:
    """Euclidean projection onto one Lorentz cone (branchless; cf.
    ``cones.project``)."""
    n, t1, t2 = u
    # One rsqrt replaces sqrt + divide (divide/sqrt cost several multiply
    # slots on the VPU; this runs 10+ times per line search).
    sq = jnp.maximum(t1 * t1 + t2 * t2, _SAFE_FLOOR)
    s_inv = lax.rsqrt(sq)
    s = sq * s_inv
    in_cone = s <= n
    in_polar = s <= -n
    h = 0.5 * (n + s)
    coeff = jnp.where(in_cone, 1.0, jnp.where(in_polar, 0.0, h * s_inv))
    n_out = jnp.where(in_cone, n, jnp.where(in_polar, 0.0, h))
    return [n_out, coeff * t1, coeff * t2]


def project_and_jacobian_apply(z: Cone, u: Cone) -> Tuple[Cone, Cone]:
    """Fused ``(P(z), D(z) u)``: one norm/rsqrt/region-mask computation
    shared between the projection and its Jacobian apply. The SAP line
    search's safeguarded-Newton polish needs ``g'`` and ``g''`` at the
    same point every iteration — evaluating :func:`project` and
    :func:`projection_jacobian_apply` separately recomputes ``|t|``,
    ``rsqrt``, and the cone-region masks twice (the polish loop is the
    largest single block of the hybrid solve, cf.
    ``results/polish_accuracy.json``)."""
    n, t1, t2 = z
    sq = jnp.maximum(t1 * t1 + t2 * t2, _SAFE_FLOOR)
    s_inv = lax.rsqrt(sq)
    s = sq * s_inv
    in_cone = s <= n
    in_polar = s <= -n
    h = 0.5 * (n + s)
    hos = h * s_inv
    coeff = jnp.where(in_cone, 1.0, jnp.where(in_polar, 0.0, hos))
    gamma = [jnp.where(in_cone, n, jnp.where(in_polar, 0.0, h)),
             coeff * t1, coeff * t2]

    h1, h2 = t1 * s_inv, t2 * s_inv
    u0, u1, u2 = u
    hd = h1 * u1 + h2 * u2
    b0 = 0.5 * (u0 + hd)
    b1 = 0.5 * u0 * h1 + hos * (u1 - h1 * hd) + 0.5 * h1 * hd
    b2 = 0.5 * u0 * h2 + hos * (u2 - h2 * hd) + 0.5 * h2 * hd
    du = [jnp.where(in_cone, u0, jnp.where(in_polar, 0.0, b0)),
          jnp.where(in_cone, u1, jnp.where(in_polar, 0.0, b1)),
          jnp.where(in_cone, u2, jnp.where(in_polar, 0.0, b2))]
    return gamma, du


def projection_jacobian_apply(z: Cone, u: Cone) -> Cone:
    """``D(z) u`` matrix-free (cf. ``cones.projection_jacobian_apply``)."""
    n, t1, t2 = z
    sq = jnp.maximum(t1 * t1 + t2 * t2, _SAFE_FLOOR)
    s_inv = lax.rsqrt(sq)
    s = sq * s_inv
    h1, h2 = t1 * s_inv, t2 * s_inv
    in_cone = s <= n
    in_polar = s <= -n

    u0, u1, u2 = u
    hd = h1 * u1 + h2 * u2
    hos = 0.5 * (n + s) * s_inv

    b0 = 0.5 * (u0 + hd)
    b1 = 0.5 * u0 * h1 + hos * (u1 - h1 * hd) + 0.5 * h1 * hd
    b2 = 0.5 * u0 * h2 + hos * (u2 - h2 * hd) + 0.5 * h2 * hd
    out0 = jnp.where(in_cone, u0, jnp.where(in_polar, 0.0, b0))
    out1 = jnp.where(in_cone, u1, jnp.where(in_polar, 0.0, b1))
    out2 = jnp.where(in_cone, u2, jnp.where(in_polar, 0.0, b2))
    return [out0, out1, out2]


def projection_jacobian_matrix(z: Cone) -> Smat:
    """Dense per-cone projection Jacobian as a 3x3 ``smat`` (cf.
    ``cones.projection_jacobian_matrix``)."""
    _, mat = project_and_jacobian_matrix(z)
    return mat


def project_and_jacobian_matrix(z: Cone) -> Tuple[Cone, Smat]:
    """Fused ``(P(z), D(z))``: the SAP-Newton step needs the projection
    (for the gradient) and the dense Jacobian (for the Hessian) at the
    same point — share the norm/rsqrt/region masks between them."""
    n, t1, t2 = z
    sq = jnp.maximum(t1 * t1 + t2 * t2, _SAFE_FLOOR)
    s_inv = lax.rsqrt(sq)
    s = sq * s_inv
    h1, h2 = t1 * s_inv, t2 * s_inv
    in_cone = s <= n
    in_polar = s <= -n
    h = 0.5 * (n + s)
    hos = h * s_inv

    coeff = jnp.where(in_cone, 1.0, jnp.where(in_polar, 0.0, hos))
    gamma = [jnp.where(in_cone, n, jnp.where(in_polar, 0.0, h)),
             coeff * t1, coeff * t2]

    one = jnp.ones_like(n)
    zero = jnp.zeros_like(n)
    # boundary blocks: [[1/2, h/2], [h/2, hos (I - hh^T) + hh^T / 2]]
    b = [[0.5 * one, 0.5 * h1, 0.5 * h2],
         [0.5 * h1, hos * (1.0 - h1 * h1) + 0.5 * h1 * h1,
          (0.5 - hos) * h1 * h2],
         [0.5 * h2, (0.5 - hos) * h1 * h2,
          hos * (1.0 - h2 * h2) + 0.5 * h2 * h2]]
    out = []
    for i in range(3):
        row = []
        for j in range(3):
            ident = one if i == j else zero
            row.append(jnp.where(in_cone, ident,
                                 jnp.where(in_polar, 0.0, b[i][j])))
        out.append(row)
    return gamma, out


def jordan_product(u: Cone, v: Cone) -> Cone:
    return [u[0] * v[0] + u[1] * v[1] + u[2] * v[2],
            u[0] * v[1] + v[0] * u[1],
            u[0] * v[2] + v[0] * u[2]]


def arrow_solve(u: Cone, b: Cone) -> Cone:
    d = det(u)
    d = jnp.where(jnp.abs(d) > _SAFE_FLOOR, d, _SAFE_FLOOR)
    u0_inv = 1.0 / u[0]
    y0 = (u[0] * b[0] - u[1] * b[1] - u[2] * b[2]) / d
    y1 = (b[1] - y0 * u[1]) * u0_inv
    y2 = (b[2] - y0 * u[2]) * u0_inv
    return [y0, y1, y2]


class NTScaling:
    """Matrix-free NT scaling (cf. ``cones.NTScaling``): per-cone ``v``
    (det-1 Jordan square root), ``eta``, and its reciprocal (so the
    inverse apply is division-free)."""

    __slots__ = ("v", "eta", "eta_inv")

    def __init__(self, v: Cone, eta: Array, eta_inv: Array = None):
        self.v = v
        self.eta = eta
        self.eta_inv = 1.0 / eta if eta_inv is None else eta_inv

    def apply(self, u: Cone) -> Cone:
        vu = soa.dot(self.v, u)
        ru = reflect(u)
        return [self.eta * (2.0 * self.v[i] * vu - ru[i]) for i in range(3)]

    def apply_inverse(self, u: Cone) -> Cone:
        v_inv = reflect(self.v)
        vu = soa.dot(v_inv, u)
        ru = reflect(u)
        return [(2.0 * v_inv[i] * vu - ru[i]) * self.eta_inv
                for i in range(3)]


def nt_scaling(x: Cone, z: Cone) -> Tuple[NTScaling, Cone]:
    """NT scaling and scaled point ``lam = W x`` (cf. ``cones.nt_scaling``).

    rsqrt-form: ``sx = det_x^{-1/2}`` etc. come from ``lax.rsqrt``;
    ``eta = (det_z/det_x)^{1/4}`` is assembled as
    ``sqrt(sqrt(det_z) * rsqrt(det_x))`` with ``sqrt(det_z) = det_z * sz``
    — multiplies plus one sqrt/rsqrt pair instead of a pow."""
    det_x = jnp.maximum(det(x), _SAFE_FLOOR)
    det_z = jnp.maximum(det(z), _SAFE_FLOOR)
    sx = lax.rsqrt(det_x)
    sz = lax.rsqrt(det_z)
    x_bar = [x[i] * sx for i in range(3)]
    z_bar = [z[i] * sz for i in range(3)]
    gamma2 = jnp.maximum(0.5 * (1.0 + soa.dot(x_bar, z_bar)), 1e-15)
    rx = reflect(x_bar)
    inv_2g = 0.5 * lax.rsqrt(gamma2)
    w_bar = [(z_bar[i] + rx[i]) * inv_2g for i in range(3)]
    denom = lax.rsqrt(2.0 * (w_bar[0] + 1.0))
    v = [(w_bar[0] + 1.0) * denom, w_bar[1] * denom, w_bar[2] * denom]
    eta2 = (det_z * sz) * sx
    eta = jnp.sqrt(eta2)
    eta_inv = lax.rsqrt(eta2)
    scaling = NTScaling(v, eta, eta_inv)
    return scaling, scaling.apply(x)


def nt_w2_inverse(scaling: NTScaling, eps) -> Smat:
    """3x3 ``smat`` inverse of ``W^2 + eps I`` (cf.
    ``cones.nt_w2_inverse_matrix``)."""
    w_bar = jordan_product(scaling.v, scaling.v)
    eta2 = scaling.eta * scaling.eta
    # A = eta^2 (2 w w^T - R) + eps I, R = diag(1, -1, -1)
    A = [[eta2 * (2.0 * w_bar[0] * w_bar[0] - 1.0) + eps,
          eta2 * 2.0 * w_bar[0] * w_bar[1],
          eta2 * 2.0 * w_bar[0] * w_bar[2]],
         [None,
          eta2 * (2.0 * w_bar[1] * w_bar[1] + 1.0) + eps,
          eta2 * 2.0 * w_bar[1] * w_bar[2]],
         [None, None,
          eta2 * (2.0 * w_bar[2] * w_bar[2] + 1.0) + eps]]
    A[1][0] = A[0][1]
    A[2][0] = A[0][2]
    A[2][1] = A[1][2]
    return soa.sym3_inverse(A)


def step_to_boundary_one(u: Cone, du: Cone) -> Array:
    """Largest step in ``[0, ~]`` keeping ``u + alpha du`` in one cone
    (same branchless root selection as ``cones.step_to_boundary``;
    returns values >= 0, capped by the caller)."""
    A = det(du)
    # 2 <u, R du> with R = diag(1, -1, -1)
    B = 2.0 * (u[0] * du[0] - u[1] * du[1] - u[2] * du[2])
    C = jnp.maximum(det(u), 0.0)

    disc = B * B - 4.0 * A * C
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    tiny = _SAFE_FLOOR
    safe_A = jnp.where(jnp.abs(A) > tiny, A, tiny)
    safe_B = jnp.where(jnp.abs(B) > tiny, B, tiny)
    inv_2a = 0.5 / safe_A
    r1 = (-B - sqrt_disc) * inv_2a
    r2 = (-B + sqrt_disc) * inv_2a
    lin = -C / safe_B
    is_linear = jnp.abs(A) <= 1e-14 * jnp.maximum(jnp.abs(B), 1.0)
    lin_crossing = is_linear & (B < 0.0)
    root1 = jnp.where(is_linear, jnp.where(lin_crossing, lin, 2.0), r1)
    root2 = jnp.where(is_linear, 2.0, r2)
    disc_ok = disc >= 0.0
    pos1 = jnp.where((root1 >= -1e-12) & disc_ok,
                     jnp.maximum(root1, 0.0), 2.0)
    pos2 = jnp.where((root2 >= -1e-12) & disc_ok,
                     jnp.maximum(root2, 0.0), 2.0)
    alpha_det = jnp.minimum(pos1, pos2)

    du0 = du[0]
    alpha_scalar = jnp.where(
        du0 < 0.0,
        jnp.maximum(u[0], 0.0) / jnp.where(du0 < 0.0, -du0, tiny), 2.0)
    return jnp.minimum(alpha_det, alpha_scalar)


def step_to_boundary(us: Cones, dus: Cones) -> Array:
    """Min over cones, capped at 1 (cf. ``cones.step_to_boundary``)."""
    alpha = step_to_boundary_one(us[0], dus[0])
    for u, du in zip(us[1:], dus[1:]):
        alpha = jnp.minimum(alpha, step_to_boundary_one(u, du))
    return jnp.minimum(alpha, 1.0)
