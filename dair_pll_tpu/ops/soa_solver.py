r"""Batch-minor (SoA) hybrid cone-QP solver: NT interior point + SAP-Newton.

The structure-of-arrays counterpart of ``ops/socp_solver.solve_cone_qp_ipm_mj``
and ``ops/sap_solver``: identical algorithms (see those modules for the
derivations and reference correspondence), in TPU-native batch-minor
layout.

Layout convention ("cone fields"): a product-cone quantity is a 3-list
``[n, t1, t2]`` whose leaves are ``(k, B)`` arrays — the cone axis is a
short sublane dimension, the batch is the minor (lane) axis, and every
per-cone operation in ``ops/soa_cones.py`` applies elementwise. The
cone-major contact Jacobian is a ``(3, n_v)`` nested list of ``(k, B)``
leaves. The mass matrix is an ``(n_v, n_v)`` nested list of ``(B,)``
leaves (``ops/soa.py``). This keeps the traced op count ~``k``-times
smaller than fully scalarized form (XLA compile time scales with op
count) while every materialized buffer stays batch-minor.

The solve is used under ``stop_gradient`` by the ContactNets loss
(envelope theorem, reference ``multibody_learnable_system.py:172-184``),
so no custom VJP is needed here; simulation paths needing IFT gradients
use ``ops/sap_solver.solve_cone_qp_hybrid``.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.ops import soa, soa_cones
from dair_pll_tpu.ops.soa import Smat, Svec

ConeField = List[Array]   # [n, t1, t2], each (k, B)
ConeMat = List[List[Array]]  # 3 x n_v nested list of (k, B) leaves

_STEP_BACKOFF = 0.99
_MIN_DET = 1e-30
# Safeguarded-Newton polish count for the exact line search. Measured on
# loss-family QPs at f32 vs an f64 (14, 8) reference
# (results/polish_accuracy.json): 6 is indistinguishable from 8 at every
# percentile (max 4.5e-3 vs 5.1e-3, f32-noise tails); 5 degrades the max
# to 2.8e-2 and 4 to 0.56 — do not trim further.
_POLISH_STEPS = 6


def j_dot(Jc: ConeMat, w: Svec) -> ConeField:
    """``J w`` per cone: ``(3, n_v)`` of ``(k, B)`` applied to ``(B,)``
    velocities -> cone field."""
    return [sum(Jc[i][v] * w[v] for v in range(len(w))) for i in range(3)]


def jt_dot(Jc: ConeMat, u: ConeField) -> Svec:
    """``J^T u`` accumulated over cones and components -> svec of
    ``(1, B)`` leaves (keepdims so the same code lowers inside Pallas
    kernels, which reject rank-1 intermediates)."""
    n_v = len(Jc[0])
    return [jnp.sum(Jc[0][v] * u[0] + Jc[1][v] * u[1] + Jc[2][v] * u[2],
                    axis=0, keepdims=True) for v in range(n_v)]


def _field_sqnorm(u: ConeField) -> Array:
    return jnp.sum(u[0] * u[0] + u[1] * u[1] + u[2] * u[2],
                   axis=0, keepdims=True)


def _field_isfinite(u: ConeField) -> Array:
    return jnp.all(jnp.isfinite(u[0]) & jnp.isfinite(u[1]) &
                   jnp.isfinite(u[2]), axis=0, keepdims=True)


def _materialize(leaf: Array) -> Array:
    """Forces a concrete (non-replicated) sublane layout on a broadcast
    leaf. ``fori_loop`` carries must keep one layout across iterations,
    and Mosaic cannot relayout non-replicated -> replicated — so carry
    inits built from broadcasts must be materialized first."""
    rows = jax.lax.broadcasted_iota(jnp.int32, leaf.shape, 0)
    # Addition with a non-replicated operand: Mosaic relayouts the
    # replicated side down (the legal direction), never up.
    return leaf + jnp.asarray(0, leaf.dtype) * rows.astype(leaf.dtype)


def _where_field(mask: Array, a: ConeField, b: ConeField) -> ConeField:
    """Per-batch select; ``mask`` broadcasts over the cone axis.

    The broadcast is explicit (``broadcast_to`` before ``where``):
    Mosaic rejects sublane-replicating relayouts inside ``select``."""
    return [jnp.where(jnp.broadcast_to(mask, x.shape), x, y)
            for x, y in zip(a, b)]


def _gap(x: ConeField, z: ConeField, k: int) -> Array:
    return jnp.sum(x[0] * z[0] + x[1] * z[1] + x[2] * z[2],
                   axis=0, keepdims=True) / (2.0 * k)


def solve_ipm_mj(M: Smat, Jc: ConeMat, qc: ConeField, eps,
                 iterations: int) -> ConeField:
    """SoA port of ``socp_solver.solve_cone_qp_ipm_mj`` (see there for the
    algorithm documentation). Returns the impulse as a cone field."""
    k = Jc[0][0].shape[0]
    n_v = len(M)
    F_M = soa.ldlt(M)

    def q_dot(x: ConeField) -> ConeField:
        h = soa.ldlt_solve(F_M, jt_dot(Jc, x))
        jw = j_dot(Jc, h)
        return [jw[i] + eps * x[i] for i in range(3)]

    scale = jnp.maximum(
        jnp.sqrt(_field_sqnorm(qc) / float(3 * k)), 1.0)
    sqrt_scale = jnp.sqrt(scale)
    like = qc[0]
    dtype = like.dtype
    x = [_materialize(jnp.broadcast_to(sqrt_scale, like.shape)),
         _materialize(jnp.zeros_like(like)),
         _materialize(jnp.zeros_like(like))]
    z = [leaf for leaf in x]

    def _violation(u: ConeField) -> Array:
        return jnp.sum(jnp.maximum(
            jnp.sqrt(u[1] * u[1] + u[2] * u[2]) - u[0], 0.0),
            axis=0, keepdims=True)

    def merit(x, z, r):
        return _gap(x, z, k) + jnp.sqrt(_field_sqnorm(r)) + \
            1e6 * (_violation(x) + _violation(z))

    def body(_, carry):
        x, z, x_best, merit_best = carry
        qx = q_dot(x)
        r = [qx[i] + qc[i] - z[i] for i in range(3)]
        mu = _gap(x, z, k)

        m = merit(x, z, r)
        better = jnp.isfinite(m) & (m < merit_best)
        x_best = _where_field(better, x, x_best)
        merit_best = jnp.where(better, m, merit_best)

        scaling, lam = soa_cones.nt_scaling(x, z)
        A_inv = soa_cones.nt_w2_inverse(scaling, eps)   # 3x3 of (k, B)

        # Schur complement S = M + J^T A^{-1} J (n_v x n_v of (B,)).
        AJ = [[A_inv[i][0] * Jc[0][v] + A_inv[i][1] * Jc[1][v] +
               A_inv[i][2] * Jc[2][v] for v in range(n_v)]
              for i in range(3)]
        S = [row[:] for row in M]
        for v1 in range(n_v):
            for v2 in range(v1 + 1):
                acc = jnp.sum(Jc[0][v1] * AJ[0][v2] +
                              Jc[1][v1] * AJ[1][v2] +
                              Jc[2][v1] * AJ[2][v2], axis=0, keepdims=True)
                S[v1][v2] = S[v1][v2] + acc
                if v2 < v1:
                    S[v2][v1] = S[v2][v1] + acc
        F_S = soa.ldlt(S)

        def kkt_solve(d: ConeField) -> Tuple[ConeField, ConeField,
                                             ConeField]:
            """Returns ``(dx, W dx, W^{-1} dz)``.

            ``dz`` is recovered from the scaled complementarity relation
            ``W^{-1} dz + W dx = d`` instead of the first KKT row
            ``dz = Q dx + r`` — algebraically identical given the exact
            Schur solve, but two scaling applies replace a second
            ``q_dot`` (an F_M back-substitution plus two Jacobian
            applies), the dominant per-iteration cost after the Schur
            assembly (cf. the ECOS/conelp recovery)."""
            wd = scaling.apply(d)
            rhs = [wd[i] - r[i] for i in range(3)]
            u = soa.matvec(A_inv, rhs)
            h = soa.ldlt_solve(F_S, jt_dot(Jc, u))
            jh = j_dot(Jc, h)
            ajh = soa.matvec(A_inv, jh)
            dx = [u[i] - ajh[i] for i in range(3)]
            wdx = scaling.apply(dx)
            wizd = [d[i] - wdx[i] for i in range(3)]
            return dx, wdx, wizd

        # --- affine (predictor) step. All cone bookkeeping runs in NT-
        # scaled coordinates: W is a cone automorphism, so
        # ``x + a dx in K  <=>  lam + a W dx in K`` (and z likewise with
        # W^{-1} dz), and ``<xa, za> = <W xa, W^{-1} za>`` — the scaled
        # directions are already in hand, the unscaled ``dz`` never needs
        # materializing here.
        ll = soa_cones.jordan_product(lam, lam)
        d_aff = soa_cones.arrow_solve(lam, [-c for c in ll])
        dx_aff, wdx_aff, wizd_aff = kkt_solve(d_aff)
        alpha_aff = jnp.minimum(_step_to_boundary(lam, wdx_aff),
                                _step_to_boundary(lam, wizd_aff))
        la_x = [lam[i] + alpha_aff * wdx_aff[i] for i in range(3)]
        la_z = [lam[i] + alpha_aff * wizd_aff[i] for i in range(3)]
        mu_aff = _gap(la_x, la_z, k)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, _MIN_DET)) ** 3,
                         0.0, 1.0)

        # --- corrector step (same Schur factorization)
        corr = soa_cones.jordan_product(wdx_aff, wizd_aff)
        rhs_c = [sigma * mu - ll[0] - corr[0],
                 -ll[1] - corr[1],
                 -ll[2] - corr[2]]
        d = soa_cones.arrow_solve(lam, rhs_c)
        dx, wdx, wizd = kkt_solve(d)
        dz = scaling.apply(wizd)

        alpha = _STEP_BACKOFF * jnp.minimum(
            _step_to_boundary(lam, wdx), _step_to_boundary(lam, wizd))
        converged = mu <= 100.0 * jnp.finfo(dtype).eps * scale
        step_ok = _field_isfinite(dx) & _field_isfinite(dz)
        move = step_ok & ~converged
        x = _where_field(move, [x[i] + alpha * dx[i] for i in range(3)], x)
        z = _where_field(move, [z[i] + alpha * dz[i] for i in range(3)], z)
        return (x, z, x_best, merit_best)

    # fori_loop (not scan): the same function serves as a Pallas kernel
    # body (ops/soa_pallas.py), where Mosaic supports fori but not scan.
    big = jnp.full_like(scale, jnp.inf)
    (x, z, x_best, merit_best) = jax.lax.fori_loop(
        0, iterations, body, (x, z, list(x), big))
    qx = q_dot(x)
    r_final = [qx[i] + qc[i] - z[i] for i in range(3)]
    m_final = merit(x, z, r_final)
    return _where_field(jnp.isfinite(m_final) & (m_final < merit_best),
                        x, x_best)


def _step_to_boundary(u: ConeField, du: ConeField) -> Array:
    """Min over cones of the per-cone step-to-boundary, capped at 1
    (cf. ``cones.step_to_boundary``). Leaves are ``(k, B)``."""
    alpha = soa_cones.step_to_boundary_one(u, du)     # (k, B)
    return jnp.minimum(jnp.min(alpha, axis=0, keepdims=True), 1.0)


# -- SAP-Newton polish -----------------------------------------------------------
def _crease_breakpoints(z0: ConeField, dz: ConeField) -> List[Array]:
    """Step lengths in ``(0, 1)`` where a cone argument crosses a
    projection crease (SoA port of ``sap_solver._crease_breakpoints``);
    returns ``2k`` candidate ``(B,)`` arrays, invalid ones clipped to 1."""
    n0, dn = z0[0], dz[0]
    A = dz[1] * dz[1] + dz[2] * dz[2] - dn * dn
    B = 2.0 * (z0[1] * dz[1] + z0[2] * dz[2] - n0 * dn)
    C = z0[1] * z0[1] + z0[2] * z0[2] - n0 * n0

    disc = B * B - 4.0 * A * C
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    tiny = 1e-30
    safe_A = jnp.where(jnp.abs(A) > tiny, A, tiny)
    safe_B = jnp.where(jnp.abs(B) > tiny, B, tiny)

    r1 = (-B - jnp.sign(safe_B) * sqrt_disc) / (2.0 * safe_A)
    r2 = C / jnp.where(jnp.abs(safe_A * r1) > tiny, safe_A * r1, tiny)
    lin = -C / safe_B
    is_linear = jnp.abs(A) <= 1e-12 * jnp.maximum(jnp.abs(B), 1.0)
    r1 = jnp.where(is_linear, lin, r1)
    r2 = jnp.where(is_linear, 1.0, r2)
    no_root = (disc < 0.0) & ~is_linear

    out = []
    k = z0[0].shape[0]
    for r in (r1, r2):
        valid = (r > 1e-12) & (r < 1.0) & ~no_root
        clipped = jnp.where(valid, r, jnp.ones_like(r))   # (k, B)
        # Keep rows 2D ((1, B)) — Pallas kernel bodies reject rank-1.
        out.extend(clipped[c:c + 1] for c in range(k))
    return out


def _line_search(M: Smat, Jc: ConeMat, qc: ConeField, eps, w: Svec,
                 dw: Svec) -> Svec:
    """Exact line search (SoA port of ``sap_solver._line_search``)."""
    inv_eps = 1.0 / eps
    jw = j_dot(Jc, w)
    jdw = j_dot(Jc, dw)
    z0 = [-(jw[i] + qc[i]) * inv_eps for i in range(3)]
    dz = [-jdw[i] * inv_eps for i in range(3)]
    a0 = soa.dot(dw, soa.matvec(M, w))
    a1 = soa.dot(dw, soa.matvec(M, dw))

    def g_prime(alpha):
        za = [z0[i] + alpha * dz[i] for i in range(3)]
        gamma = soa_cones.project(za)
        return a0 + a1 * alpha + eps * jnp.sum(
            dz[0] * gamma[0] + dz[1] * gamma[1] + dz[2] * gamma[2], axis=0, keepdims=True)

    # The SAP primal is convex along the ray (Castro et al. 2022 prove
    # the regularized cost convex and C^1), so ``g'`` is nondecreasing
    # and the bracket below — max of candidates with ``g' <= 0``, min
    # with ``g' > 0`` — is order-independent: no need to sort the crease
    # breakpoints (a 45-compare-exchange network for 10 candidates in
    # the round-2 form). The final candidate is the appended alpha=1, so
    # ``gp[-1]`` is still ``g'(1)`` for the full-step test.
    candidates = ([jnp.zeros_like(a0)] + _crease_breakpoints(z0, dz) +
                  [jnp.ones_like(a0)])
    gp = [g_prime(c) for c in candidates]

    big = 2.0
    lo = None
    hi = None
    for c, g in zip(candidates, gp):
        lo_c = jnp.where(g <= 0.0, c, -big)
        hi_c = jnp.where(g > 0.0, c, big)
        lo = lo_c if lo is None else jnp.maximum(lo, lo_c)
        hi = hi_c if hi is None else jnp.minimum(hi, hi_c)
    take_full = gp[-1] <= 0.0
    lo = jnp.maximum(lo, 0.0)
    hi = jnp.where(hi > 1.0, 1.0, hi)
    hi = jnp.maximum(hi, lo)

    def polish(_, state):
        lo, hi, alpha = state
        # Fused g'/g'' at the same point: one projection pass supplies
        # both P(za) (for g') and D(za) dz (for g'').
        za = [z0[i] + alpha * dz[i] for i in range(3)]
        gamma, ddz = soa_cones.project_and_jacobian_apply(za, dz)
        gp_a = a0 + a1 * alpha + eps * jnp.sum(
            dz[0] * gamma[0] + dz[1] * gamma[1] + dz[2] * gamma[2],
            axis=0, keepdims=True)
        gpp_a = jnp.maximum(
            a1 + eps * jnp.sum(
                dz[0] * ddz[0] + dz[1] * ddz[1] + dz[2] * ddz[2],
                axis=0, keepdims=True), 1e-30)
        lo = jnp.where(gp_a <= 0.0, alpha, lo)
        hi = jnp.where(gp_a > 0.0, alpha, hi)
        newton = alpha - gp_a / gpp_a
        inside = (newton > lo) & (newton < hi)
        alpha = jnp.where(inside, newton, 0.5 * (lo + hi))
        return lo, hi, alpha

    alpha0 = 0.5 * (lo + hi)
    _, _, alpha = jax.lax.fori_loop(
        0, _POLISH_STEPS, polish, (lo, hi, alpha0))
    alpha = jnp.where(take_full, jnp.ones_like(alpha), alpha)
    return [w[i] + alpha * dw[i] for i in range(len(w))]


def sap_newton(M: Smat, Jc: ConeMat, qc: ConeField, eps, iterations: int,
               w0: Svec) -> Tuple[ConeField, Svec]:
    """SoA port of ``sap_solver._sap_newton_cone_major``: fixed-count
    Newton on the velocity-space primal with exact line search. Returns
    ``(impulse cone field, w)``."""
    n_v = len(M)
    inv_eps = 1.0 / eps

    def newton_step(_, w):
        jw = j_dot(Jc, w)
        z = [-(jw[i] + qc[i]) * inv_eps for i in range(3)]
        # Fused P(z)/D(z): gradient and Hessian share one projection pass.
        gamma, D = soa_cones.project_and_jacobian_matrix(z)
        grad = soa.vsub(soa.matvec(M, w), jt_dot(Jc, gamma))
        DJ = [[D[i][0] * Jc[0][v] + D[i][1] * Jc[1][v] +
               D[i][2] * Jc[2][v] for v in range(n_v)]
              for i in range(3)]
        H = [row[:] for row in M]
        for v1 in range(n_v):
            for v2 in range(v1 + 1):
                acc = inv_eps * jnp.sum(
                    Jc[0][v1] * DJ[0][v2] + Jc[1][v1] * DJ[1][v2] +
                    Jc[2][v1] * DJ[2][v2], axis=0, keepdims=True)
                H[v1][v2] = H[v1][v2] + acc
                if v2 < v1:
                    H[v2][v1] = H[v2][v1] + acc
        for i in range(n_v):
            H[i][i] = H[i][i] + 1e-10
        dw = [-g for g in soa.spd_solve(H, grad)]
        return _line_search(M, Jc, qc, eps, w, dw)

    w = jax.lax.fori_loop(0, iterations, newton_step, w0)
    jw = j_dot(Jc, w)
    gamma = soa_cones.project(
        [-(jw[i] + qc[i]) * inv_eps for i in range(3)])
    return gamma, w


def solve_contact_impulse_soa(M: Smat, Jc: ConeMat, qc: ConeField, eps,
                              ipm_iterations: int, newton_iterations: int
                              ) -> Tuple[ConeField, Array]:
    """Hybrid contact solve (IPM warm start + SAP-Newton polish) with the
    standard per-sample failure masking (reference
    ``multibody_learnable_system.py:186-192``). Returns
    ``(impulse cone field, valid (B,) mask)``."""
    x0 = solve_ipm_mj(M, Jc, qc, eps, ipm_iterations)
    w0 = soa.spd_solve(M, jt_dot(Jc, x0))
    gamma, _ = sap_newton(M, Jc, qc, eps, newton_iterations, w0)

    finite = _field_isfinite(gamma)
    bounded = jnp.all((jnp.abs(gamma[0]) <= 1e3) &
                      (jnp.abs(gamma[1]) <= 1e3) &
                      (jnp.abs(gamma[2]) <= 1e3), axis=0, keepdims=True)
    valid = finite & bounded
    gamma = [jnp.where(valid, jnp.nan_to_num(comp),
                       jnp.zeros_like(comp)) for comp in gamma]
    return gamma, valid


def primal_cost(M: Smat, Jc: ConeMat, qc: ConeField, eps,
                w: Svec) -> Array:
    """Regularized SAP primal objective per sample (``(1, B)``)."""
    jw = j_dot(Jc, w)
    gamma = soa_cones.project([-(jw[i] + qc[i]) / eps for i in range(3)])
    quad = 0.5 * soa.dot(w, soa.matvec(M, w))
    return quad + 0.5 * eps * jnp.sum(
        gamma[0] ** 2 + gamma[1] ** 2 + gamma[2] ** 2, axis=0,
        keepdims=True)


def solve_warm_hybrid_soa(M: Smat, Jc: ConeMat, qc: ConeField,
                          w_carry: Svec, eps, ipm_iterations: int,
                          newton_iterations: int
                          ) -> Tuple[ConeField, Svec, Array]:
    """Warm-started hybrid solve for sequential rollouts: a short IPM
    central path, then SAP-Newton from the better (by primal cost) of the
    carried primal ``w_carry`` and the IPM iterate, with per-sample
    failure masking. The rollout path's counterpart of
    :func:`solve_contact_impulse_soa` (cf.
    ``sap_solver.solve_cone_qp_hybrid_warm``). Returns
    ``(impulse cone field, w, valid)``."""
    n_v = len(M)
    x_ipm = solve_ipm_mj(M, Jc, qc, eps, ipm_iterations)
    w_ipm = soa.spd_solve(M, jt_dot(Jc, x_ipm))
    better = primal_cost(M, Jc, qc, eps, w_carry) < \
        primal_cost(M, Jc, qc, eps, w_ipm)
    w_init = [jnp.where(better, w_carry[i], w_ipm[i])
              for i in range(n_v)]
    gamma, w = sap_newton(M, Jc, qc, eps, newton_iterations, w_init)

    finite = _field_isfinite(gamma)
    bounded = jnp.all((jnp.abs(gamma[0]) <= 1e3) &
                      (jnp.abs(gamma[1]) <= 1e3) &
                      (jnp.abs(gamma[2]) <= 1e3), axis=0, keepdims=True)
    valid = finite & bounded
    gamma = [jnp.where(valid, jnp.nan_to_num(comp),
                       jnp.zeros_like(comp)) for comp in gamma]
    w = [jnp.where(valid, jnp.nan_to_num(comp), jnp.zeros_like(comp))
         for comp in w]
    return gamma, w, valid
