r"""SAP-style Newton solver for the contact cone QP.

A second-order replacement for the APGD solver in ``cone_solver.py``,
following the algorithm class of the reference's C++ ``sappy`` (Drake's
SAP solver, Castro-Permenter-Kuchar 2022; reference usage
``/root/reference/dair_pll/multibody_learnable_system.py:179-184``): the
dual QCQP

.. math:: \min_{f \in K} \tfrac12 f^T (J M^{-1} J^T + \epsilon I) f + f^T q

over the product Lorentz cone :math:`K` is equivalent to the smooth,
strongly convex, *unconstrained* primal in generalized-velocity space

.. math::
   \min_{w \in \mathbb R^{n_v}} \ \ell(w) = \tfrac12 w^T M w +
   \tfrac{\epsilon}{2}\,\lVert P_K(-(J w + q)/\epsilon)\rVert^2,

with optimal impulse :math:`f^* = P_K(-(J w^* + q)/\epsilon)` and
:math:`w^* = M^{-1} J^T f^*`. Moreau's decomposition gives the exact
gradient :math:`\nabla\ell = M w - J^T \gamma` (no projection Jacobian in
the gradient), and the generalized Hessian :math:`H = M + J^T
\partial P_K J / \epsilon` is PSD — Newton converges in <= ~10 iterations
where APGD needs hundreds, so the sequential dependency-chain latency on
TPU drops accordingly.

**Exact line search.** Along a ray the cost derivative
:math:`g'(\alpha) = \nabla\ell(w + \alpha dw)^T dw` is continuous,
nondecreasing (convexity), and piecewise smooth with breakpoints exactly
where a cone argument crosses a projection crease
(:math:`\lVert t(\alpha)\rVert = \pm n(\alpha)`, the roots of one
quadratic per cone). The search therefore (1) enumerates all breakpoints
analytically, (2) brackets the root of :math:`g'` between consecutive
candidates, and (3) polishes with safeguarded Newton on :math:`g'` inside
the smooth segment — near-machine-precision steps with fixed control
flow, eliminating the crease-crossing slow tails of plain backtracking
(this mirrors what Drake's SAP line search achieves).

**TPU layout.** All internals are cone-major and matrix-free
(``ops/cones.py``): per-cone ``(k, 3)`` vector algebra, projection
Jacobians applied without materializing ``(3k, 3k)`` operators, and one
unrolled ``n_v x n_v`` Cholesky per Newton step — no padded tiny-matmul
layouts (the round-1 ``small_matmul`` finding).

All iterations are fixed-count and branchless; callers ``vmap`` over the
batch.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.ops import cones
from dair_pll_tpu.ops.linear import cholesky_unrolled, cho_solve_unrolled

DEFAULT_NEWTON_ITERATIONS = 10
# Kept equal to ``soa_solver._POLISH_STEPS`` so the vmapped and SoA
# paths stay algorithm-identical. Evidence for 6: the f32 sweep in
# results/polish_accuracy.json, AND the f64 machine-precision bounds in
# tests/test_socp_solver.py (1e-10/1e-9), which were re-verified at
# polish=6 when the trim landed — the f32-only sweep is not the sole
# support for the f64 path.
_POLISH_STEPS = 6


def _jt_dot(Jc: Array, u: Array) -> Array:
    """``J^T u`` with cone-major ``Jc (k, 3, n)`` and ``u (k, 3)``."""
    return jnp.sum(Jc * u[..., None], axis=(-3, -2))


def _j_dot(Jc: Array, w: Array) -> Array:
    """``J w`` per cone: ``(k, 3, n) x (n,) -> (k, 3)``."""
    return jnp.sum(Jc * w, axis=-1)


def _jt_block_j(Jc: Array, D: Array) -> Array:
    """``sum_k J_k^T D_k J_k``: ``(k, 3, n), (k, 3, 3) -> (n, n)`` as
    broadcast-multiply-reduce (no batched tiny dot_generals)."""
    DJ = jnp.sum(D[..., None] * Jc[..., None, :, :], axis=-2)  # (k, 3, n)
    return jnp.sum(Jc[..., :, :, None] * DJ[..., :, None, :],
                   axis=(-4, -3))


def _primal_gamma(Jc, qc, eps, w):
    return cones.project(-(_j_dot(Jc, w) + qc) / eps)


def _crease_breakpoints(z0: Array, dz: Array) -> Array:
    r"""Step lengths in ``(0, 1)`` where ``z0 + alpha dz`` crosses a
    Lorentz-cone projection crease (cone-major inputs ``(k, 3)``).

    Creases satisfy :math:`\lVert t \rVert^2 = n^2` (covers both the cone
    boundary ``s = n`` and the polar boundary ``s = -n``), a quadratic in
    ``alpha`` per cone. Invalid/out-of-range roots are clipped to 1.

    Returns:
        ``(2k,)`` candidate step lengths.
    """
    n0, dn = z0[..., 0], dz[..., 0]
    t0, dt = z0[..., 1:], dz[..., 1:]

    A = jnp.sum(dt * dt, axis=-1) - dn * dn
    B = 2.0 * (jnp.sum(t0 * dt, axis=-1) - n0 * dn)
    C = jnp.sum(t0 * t0, axis=-1) - n0 * n0

    disc = B * B - 4.0 * A * C
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    tiny = jnp.asarray(1e-30, z0.dtype)
    safe_A = jnp.where(jnp.abs(A) > tiny, A, tiny)
    safe_B = jnp.where(jnp.abs(B) > tiny, B, tiny)

    # Quadratic roots (numerically stable split form), linear fallback.
    r1 = (-B - jnp.sign(safe_B) * sqrt_disc) / (2.0 * safe_A)
    r2 = C / jnp.where(jnp.abs(safe_A * r1) > tiny, safe_A * r1, tiny)
    lin = -C / safe_B
    is_linear = jnp.abs(A) <= 1e-12 * jnp.maximum(jnp.abs(B), 1.0)
    r1 = jnp.where(is_linear, lin, r1)
    r2 = jnp.where(is_linear, 1.0, r2)
    no_root = (disc < 0.0) & ~is_linear

    def clip_valid(r):
        valid = (r > 1e-12) & (r < 1.0) & ~no_root
        return jnp.where(valid, r, jnp.ones_like(r))

    return jnp.concatenate((clip_valid(r1), clip_valid(r2)))


def _line_search(M, Jc, qc, eps, w, dw):
    r"""Exact line search on ``g(alpha) = l(w + alpha dw)`` over
    ``[0, 1]``: analytic crease breakpoints bracket the root of the
    nondecreasing ``g'``, then safeguarded Newton polishes inside the
    smooth segment. Fixed-count and branchless."""
    dtype = w.dtype
    z0 = -(_j_dot(Jc, w) + qc) / eps
    dz = -_j_dot(Jc, dw) / eps
    a0 = dw @ (M @ w)
    a1 = dw @ (M @ dw)

    def g_prime(alpha):
        gamma = cones.project(z0 + alpha * dz)
        return a0 + a1 * alpha + eps * jnp.sum(dz * gamma)

    def g_second(alpha):
        Ddz = cones.projection_jacobian_apply(z0 + alpha * dz, dz)
        return a1 + eps * jnp.sum(dz * Ddz)

    # 1) candidate steps: 0, crease crossings, 1.
    candidates = jnp.sort(jnp.concatenate((
        jnp.zeros((1,), dtype), _crease_breakpoints(z0, dz),
        jnp.ones((1,), dtype))))
    gp = jax.vmap(g_prime)(candidates)

    # 2) bracket the root of the nondecreasing g'.
    big = jnp.asarray(2.0, dtype)
    lo = jnp.max(jnp.where(gp <= 0.0, candidates, -big))
    hi = jnp.min(jnp.where(gp > 0.0, candidates, big))
    take_full = gp[-1] <= 0.0          # still descending at alpha = 1
    lo = jnp.maximum(lo, 0.0)
    hi = jnp.where(hi > 1.0, 1.0, hi)
    hi = jnp.maximum(hi, lo)

    # 3) safeguarded Newton on g' inside the (smooth) bracket.
    def polish(_, state):
        lo, hi, alpha = state
        gp_a = g_prime(alpha)
        gpp_a = jnp.maximum(g_second(alpha), 1e-30)
        lo = jnp.where(gp_a <= 0.0, alpha, lo)
        hi = jnp.where(gp_a > 0.0, alpha, hi)
        newton = alpha - gp_a / gpp_a
        inside = (newton > lo) & (newton < hi)
        alpha = jnp.where(inside, newton, 0.5 * (lo + hi))
        return lo, hi, alpha

    alpha0 = 0.5 * (lo + hi)
    _, _, alpha = jax.lax.fori_loop(
        0, _POLISH_STEPS, polish, (lo, hi, alpha0))
    alpha = jnp.where(take_full, jnp.ones((), dtype), alpha)
    return w + alpha * dw


def _sap_newton_cone_major(M: Array, Jc: Array, qc: Array, eps,
                           iterations: int, w0: Array
                           ) -> Tuple[Array, Array]:
    """Fixed-count Newton on the velocity-space primal; cone-major
    inputs. Returns (impulse (k, 3), w)."""
    n_v = M.shape[-1]

    def newton_step(w, _):
        z = -(_j_dot(Jc, w) + qc) / eps
        gamma = cones.project(z)
        grad = M @ w - _jt_dot(Jc, gamma)
        D = cones.projection_jacobian_matrix(z)
        H = M + _jt_block_j(Jc, D) / eps
        # Levenberg-style floor keeps H well-posed on projection facets.
        H = H + 1e-10 * jnp.eye(n_v, dtype=qc.dtype)
        L = cholesky_unrolled(H)
        dw = -cho_solve_unrolled(L, grad)
        return _line_search(M, Jc, qc, eps, w, dw), None

    w, _ = jax.lax.scan(newton_step, w0, None, length=iterations)
    gamma = _primal_gamma(Jc, qc, eps, w)
    return gamma, w


def _sap_newton(M: Array, J: Array, q: Array, eps, iterations: int,
                w0: Array) -> Tuple[Array, Array]:
    """Stacked-layout wrapper: returns (impulse (3k,), w)."""
    Jc = cones.rows_to_cone_major(J)
    qc = cones.stacked_to_cone_major(q)
    gamma, w = _sap_newton_cone_major(M, Jc, qc, eps, iterations, w0)
    return cones.cone_major_to_stacked(gamma), w


@functools.partial(jax.jit, static_argnums=(4,))
def solve_cone_qp_sap(M: Array, J: Array, q: Array, eps,
                      iterations: int = DEFAULT_NEWTON_ITERATIONS,
                      w0: Optional[Array] = None) -> Array:
    """Solves ``min_{f in K} 0.5 f'(J M^-1 J' + eps I) f + f'q`` by Newton
    on the unconstrained velocity-space primal.

    Args:
        M: ``(n_v, n_v)`` SPD mass matrix.
        J: ``(3k, n_v)`` contact Jacobian (stacked cone layout).
        q: ``(3k,)`` cost vector.
        eps: scalar regularization (the dual's ``eps I``).
        iterations: fixed Newton iteration count.
        w0: optional warm start in velocity space (e.g. the previous
          step's ``M^{-1} J^T f`` during rollouts).

    Returns:
        ``(3k,)`` optimal impulse in the stacked layout.
    """
    eps = jnp.asarray(eps, q.dtype)
    if w0 is None:
        w0 = jnp.zeros((M.shape[-1],), q.dtype)
    gamma, _ = _sap_newton(M, J, q, eps, iterations, w0)
    return gamma


@functools.partial(jax.jit, static_argnums=(4,))
def solve_cone_qp_sap_with_state(M: Array, J: Array, q: Array, eps,
                                 iterations: int =
                                 DEFAULT_NEWTON_ITERATIONS,
                                 w0: Optional[Array] = None
                                 ) -> Tuple[Array, Array]:
    """Like :func:`solve_cone_qp_sap` but also returns the velocity-space
    primal ``w`` for warm-starting the next solve."""
    eps = jnp.asarray(eps, q.dtype)
    if w0 is None:
        w0 = jnp.zeros((M.shape[-1],), q.dtype)
    return _sap_newton(M, J, q, eps, iterations, w0)


# Minimal budgets, measured (results/ipm_convergence.json, round 4):
# loss-family QPs (eps = 1e-3) are machine-precision at (10, 6);
# dynamics-family QPs (eps = 1e-4, grazing impacts) need (14, 6) — see
# learnable_system.DEFAULT_WARM_IPM_ITERATIONS. Documented NEGATIVE
# results from the same battery: Newton-only from the IPM init point
# fails badly even at 16 iterations (p99 rel subopt 3-50 on both
# families — the central path's active-set discovery is load-bearing,
# not a warm-start nicety), and short-IPM variants with Gondzio
# correctors ((8,6)+2corr etc.) trail the plain budgets. Iteration
# count is therefore NOT the available perf lever for the fused kernel.
DEFAULT_HYBRID_IPM_ITERATIONS = 10
DEFAULT_HYBRID_NEWTON_ITERATIONS = 6


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def solve_cone_qp_hybrid(Q: Array, q: Array, M: Array, J: Array, eps,
                         ipm_iterations: int =
                         DEFAULT_HYBRID_IPM_ITERATIONS,
                         newton_iterations: int =
                         DEFAULT_HYBRID_NEWTON_ITERATIONS) -> Array:
    r"""Interior-point warm start + SAP-Newton polish: the high-accuracy
    cone-QP solve.

    The IPM (``socp_solver.py``) discovers the active set reliably through
    the central path (semismooth Newton alone can stall when the optimum
    flips a cone whose crease is far from the iterate); the SAP-Newton
    polish with exact line search then reaches machine precision in a few
    iterations. Measured on realistic cube contact QPs: relative
    suboptimality ~1e-16 worst-case at (10, 6) iterations, vs p95 2e-7 /
    max 2e-5 for APGD-200.

    Gradients: the solution depends on ``(Q, q)`` only; ``M``/``J``/
    ``eps`` are algorithmic inputs (warm start + polish geometry) and
    receive zero cotangents. The backward pass is the implicit-function
    theorem on the projection fixed point (``cone_solver.ift_cotangents``).
    """
    from dair_pll_tpu.ops.linear import spd_solve
    from dair_pll_tpu.ops.socp_solver import solve_cone_qp_ipm_mj
    eps = jnp.asarray(eps, q.dtype)
    x0 = solve_cone_qp_ipm_mj(M, J, q, eps, ipm_iterations)
    w0 = spd_solve(M, J.T @ x0)
    gamma, _ = _sap_newton(M, J, q, eps, newton_iterations, w0)
    return gamma


def _hybrid_fwd(Q, q, M, J, eps, ipm_iterations, newton_iterations):
    x = solve_cone_qp_hybrid(Q, q, M, J, eps, ipm_iterations,
                             newton_iterations)
    return x, (Q, q, x, M, J, eps)


def _hybrid_bwd(ipm_iterations, newton_iterations, residuals, g):
    del ipm_iterations, newton_iterations
    from dair_pll_tpu.ops.cone_solver import ift_cotangents
    Q, q, x, M, J, eps = residuals
    bar_Q, bar_q = ift_cotangents(Q, q, x, g)
    return (bar_Q, bar_q, jnp.zeros_like(M), jnp.zeros_like(J),
            jnp.zeros_like(eps))


solve_cone_qp_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def solve_contact_impulse_hybrid(delassus: Array, M: Array, J: Array,
                                 q_vec: Array, eps,
                                 ipm_iterations: int =
                                 DEFAULT_HYBRID_IPM_ITERATIONS,
                                 newton_iterations: int =
                                 DEFAULT_HYBRID_NEWTON_ITERATIONS
                                 ) -> Tuple[Array, Array]:
    """Hybrid contact solve with the standard failure masking (reference
    ``multibody_learnable_system.py:186-192``). Gradients flow through
    ``delassus`` and ``q_vec`` via the IFT."""
    n = delassus.shape[-1]
    eps = jnp.asarray(eps, q_vec.dtype)
    Q = delassus + eps * jnp.eye(n, dtype=delassus.dtype)
    impulse = solve_cone_qp_hybrid(Q, q_vec, M, J, eps, ipm_iterations,
                                   newton_iterations)
    finite = jnp.all(jnp.isfinite(impulse))
    bounded = jnp.all(jnp.abs(impulse) <= 1e3)
    valid = finite & bounded
    impulse = jnp.where(valid, impulse, jnp.zeros_like(impulse))
    return jnp.nan_to_num(impulse), valid


def solve_cone_qp_hybrid_warm(M: Array, J: Array, q: Array, eps,
                              w_carry: Array,
                              ipm_iterations: int = 10,
                              newton_iterations: int = 6,
                              correctors: int = 0
                              ) -> Tuple[Array, Array]:
    """Warm-started hybrid solve for sequential rollouts (ROADMAP #3).

    Consecutive simulation steps solve nearly identical cone QPs, so the
    previous step's velocity-space primal is usually already near the
    optimum — but a *new* impact is a genuine cold start where semismooth
    Newton alone can stall in active-set discovery. This keeps a SHORT
    central-path phase for robustness and then polishes from whichever
    start is better *by primal cost* (branchless per-sample select):

    1. run ``ipm_iterations`` IPM iterations;
    2. pick ``w0 = argmin(l(w_ipm), l(w_carry))``;
    3. run ``newton_iterations`` exact-line-search Newton steps.

    Measured on batched bouncing-cube rollouts (f64): fresh impacts are
    genuine cold starts that need the full central-path length — any
    reduction of the IPM phase below 10 leaves O(1) worst-case step
    errors at some impact, so warm-starting cannot shrink a fixed-count
    branchless scan's budget. The carried start is still selected when
    it wins on primal cost: accuracy improves at equal cost (Newton
    converges in ~1 iteration on persistent-contact steps).

    Returns ``(impulse (3k,), w)`` with ``w`` the carry for the next step.
    """
    from dair_pll_tpu.ops.linear import spd_solve
    from dair_pll_tpu.ops.socp_solver import solve_cone_qp_ipm_mj
    eps = jnp.asarray(eps, q.dtype)
    x_ipm = solve_cone_qp_ipm_mj(M, J, q, eps, ipm_iterations,
                                 correctors)
    w_ipm = spd_solve(M, J.T @ x_ipm)
    cost_ipm, _ = _primal_cost(M, J, q, eps, w_ipm)
    cost_carry, _ = _primal_cost(M, J, q, eps, w_carry)
    w0 = jnp.where(cost_carry < cost_ipm, w_carry, w_ipm)
    return _sap_newton(M, J, q, eps, newton_iterations, w0)


def solve_contact_impulse_sap(M: Array, J: Array, q_vec: Array, eps,
                              iterations: int = DEFAULT_NEWTON_ITERATIONS,
                              w0: Optional[Array] = None
                              ) -> Tuple[Array, Array]:
    """SAP-Newton contact solve with the standard failure masking
    (counterpart of ``cone_solver.solve_contact_impulse``; reference
    masking ``multibody_learnable_system.py:186-192``)."""
    impulse = solve_cone_qp_sap(M, J, q_vec, eps, iterations, w0)
    finite = jnp.all(jnp.isfinite(impulse))
    bounded = jnp.all(jnp.abs(impulse) <= 1e3)
    valid = finite & bounded
    impulse = jnp.where(valid, impulse, jnp.zeros_like(impulse))
    return jnp.nan_to_num(impulse), valid


def _primal_cost(M, J, q, eps, w):
    """Stacked-layout primal cost (kept for tests/diagnostics)."""
    from dair_pll_tpu.ops.tensor import project_lorentz
    gamma = project_lorentz(-(J @ w + q) / eps)
    return 0.5 * w @ (M @ w) + 0.5 * eps * jnp.sum(gamma * gamma), gamma
