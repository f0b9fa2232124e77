r"""SAP-style Newton solver for the contact cone QP.

A second-order replacement for the APGD solver in ``cone_solver.py``,
following the structure of the reference's C++ ``sappy`` (Drake's SAP
solver, Castro-Permenter-Kuchar 2022): the dual QCQP

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
\partial P_K J / \epsilon` is PSD — Newton with backtracking converges in
~10 iterations where APGD needs hundreds, and the sequential
dependency-chain latency on TPU drops accordingly.

All iterations are fixed-count, branchless (masked backtracking), and
per-problem; callers ``vmap`` over the batch.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.ops.cone_solver import _projection_jacobian
from dair_pll_tpu.ops.linear import cholesky_unrolled, cho_solve_unrolled
from dair_pll_tpu.ops.tensor import project_lorentz

DEFAULT_NEWTON_ITERATIONS = 10
_BISECTION_STEPS = 14


def _primal_cost(M, J, q, eps, w):
    gamma = project_lorentz(-(J @ w + q) / eps)
    return 0.5 * w @ (M @ w) + 0.5 * eps * jnp.sum(gamma * gamma), gamma


def _line_search(M, J, q, eps, w, dw):
    r"""Exact-ish line search: :math:`g(\alpha) = \ell(w + \alpha\,dw)` is
    convex and piecewise quadratic, so bisect on the sign of
    :math:`g'(\alpha) = \nabla\ell(w + \alpha dw)^T dw` over ``[0, 1]``
    (full Newton step accepted when still descending at 1). Fixed-count
    and branchless."""

    def g_prime(alpha):
        w_try = w + alpha * dw
        gamma = project_lorentz(-(J @ w_try + q) / eps)
        return (M @ w_try - J.T @ gamma) @ dw

    lo = jnp.zeros((), w.dtype)
    hi = jnp.ones((), w.dtype)
    take_full = g_prime(hi) <= 0.0

    def bisect(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        descending = g_prime(mid) <= 0.0
        lo = jnp.where(descending, mid, lo)
        hi = jnp.where(descending, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECTION_STEPS, bisect, (lo, hi))
    alpha = jnp.where(take_full, 1.0, 0.5 * (lo + hi))
    return w + alpha * dw


@functools.partial(jax.jit, static_argnums=(4,))
def solve_cone_qp_sap(M: Array, J: Array, q: Array, eps,
                      iterations: int = DEFAULT_NEWTON_ITERATIONS
                      ) -> Array:
    """Solves ``min_{f in K} 0.5 f'(J M^-1 J' + eps I) f + f'q`` by Newton
    on the unconstrained velocity-space primal.

    Args:
        M: ``(n_v, n_v)`` SPD mass matrix.
        J: ``(3k, n_v)`` contact Jacobian (stacked cone layout).
        q: ``(3k,)`` cost vector.
        eps: scalar regularization (the dual's ``eps I``).
        iterations: fixed Newton iteration count.

    Returns:
        ``(3k,)`` optimal impulse in the stacked layout.
    """
    n_v = M.shape[-1]
    eps = jnp.asarray(eps, q.dtype)

    def newton_step(w, _):
        _, gamma = _primal_cost(M, J, q, eps, w)
        grad = M @ w - J.T @ gamma
        z = -(J @ w + q) / eps
        D = _projection_jacobian(z)
        H = M + (J.T @ D @ J) / eps
        # Levenberg-style floor keeps H well-posed on projection facets.
        H = H + 1e-10 * jnp.eye(n_v, dtype=q.dtype)
        L = cholesky_unrolled(H)
        dw = -cho_solve_unrolled(L, grad)
        return _line_search(M, J, q, eps, w, dw), None

    w0 = jnp.zeros((n_v,), q.dtype)
    w, _ = jax.lax.scan(newton_step, w0, None, length=iterations)
    _, gamma = _primal_cost(M, J, q, eps, w)
    return gamma


def solve_contact_impulse_sap(M: Array, J: Array, q_vec: Array, eps,
                              iterations: int = DEFAULT_NEWTON_ITERATIONS
                              ) -> Tuple[Array, Array]:
    """SAP-Newton contact solve with the standard failure masking
    (counterpart of ``cone_solver.solve_contact_impulse``)."""
    impulse = solve_cone_qp_sap(M, J, q_vec, eps, iterations)
    finite = jnp.all(jnp.isfinite(impulse))
    bounded = jnp.all(jnp.abs(impulse) <= 1e3)
    valid = finite & bounded
    impulse = jnp.where(valid, impulse, jnp.zeros_like(impulse))
    return jnp.nan_to_num(impulse), valid
