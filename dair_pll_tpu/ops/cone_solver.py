r"""Batched differentiable Lorentz-cone QP solver, TPU-native.

Replaces the reference's C++ ``sappy`` SAP solver
(``/root/reference/dair_pll/multibody_learnable_system.py:29,77,179-184,
293-298``) with a pure-JAX solver designed for TPU execution:

* **Problem.** Minimize ``f(x) = 0.5 x^T Q x + q^T x`` over the product of
  ``k`` Lorentz cones ``{x_i = (n_i, t_i): n_i >= ||t_i||}`` in the stacked
  layout ``[n_1..n_k, t_1x t_1y .. t_kx t_ky]``. This is the dual QCQP of
  Anitescu-convex contact dynamics (derivation reproduced in the reference
  docstring ``multibody_learnable_system.py:209-249``).
* **Algorithm.** Accelerated projected gradient (FISTA) with gradient-based
  adaptive restart, a fixed iteration count, and a Lipschitz constant from
  a few power-iteration steps — all static control flow (``lax.scan`` /
  ``fori_loop``), so the whole solve jits, vmaps over the batch, and maps
  onto the TPU VPU with zero host round trips.
* **Gradients.** A ``jax.custom_vjp`` implements the implicit-function
  theorem on the projection fixed point ``x* = P(x* - alpha (Q x* + q))``:
  the backward pass solves one small linear system with the (piecewise
  linear) projection Jacobian. This gives exact sensitivities without
  unrolling the iterations — O(1) memory and far fewer FLOPs than
  backprop-through-the-loop. (The ContactNets loss instead detaches the
  solve entirely per the envelope theorem — see
  ``multibody_learnable_system.py:172-176`` — which callers get with
  ``jax.lax.stop_gradient``.)

Shapes: unbatched ``(3k, 3k)``/``(3k,)``; callers ``vmap``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.ops.tensor import project_lorentz, small_matvec

DEFAULT_ITERATIONS = 200
POWER_ITERATIONS = 12


def _lipschitz_estimate(Q: Array, iters: int = POWER_ITERATIONS) -> Array:
    """Largest-eigenvalue estimate of PSD ``Q`` by power iteration,
    inflated 10% for safety (an underestimated step size breaks FISTA's
    monotonicity)."""
    n = Q.shape[-1]
    v0 = jnp.full((n,), 1.0 / jnp.sqrt(jnp.asarray(n, Q.dtype)), Q.dtype)

    def body(_, v):
        w = small_matvec(Q, v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    lam = v @ small_matvec(Q, v)
    return 1.1 * jnp.maximum(lam, 1e-12)


def _apgd(Q: Array, q: Array, x0: Array, iterations: int) -> Array:
    """FISTA with adaptive restart over the Lorentz-cone product."""
    L = _lipschitz_estimate(Q)
    inv_L = 1.0 / L

    def step(carry, _):
        x, y, t = carry
        grad = small_matvec(Q, y) + q
        x_new = project_lorentz(y - inv_L * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        momentum = (t - 1.0) / t_new
        # Gradient-based adaptive restart (O'Donoghue & Candes).
        restart = jnp.dot(y - x_new, x_new - x) > 0.0
        t_new = jnp.where(restart, 1.0, t_new)
        momentum = jnp.where(restart, 0.0, momentum)
        y_new = x_new + momentum * (x_new - x)
        return (x_new, y_new, t_new), None

    init = (x0, x0, jnp.asarray(1.0, Q.dtype))
    (x, _, _), _ = jax.lax.scan(step, init, None, length=iterations)
    return x


def _projection_jacobian(z: Array) -> Array:
    r"""Jacobian ``D`` of the Lorentz-cone-product projection at ``z``.

    For each cone element ``(n, t)`` at ``z``:

    * inside the cone (``||t|| <= n``): identity block;
    * inside the polar cone (``||t|| <= -n``): zero block;
    * otherwise, with ``s = ||t||``, ``u = t/s``, ``h = (n + s)/2``:

      .. math::
         \partial P = \begin{bmatrix} 1/2 & u^T/2 \\
           u/2 & (h/s)(I - u u^T) + u u^T / 2 \end{bmatrix}

    Returns the dense ``(3k, 3k)`` Jacobian in the stacked layout.
    """
    k = z.shape[-1] // 3
    dtype = z.dtype
    n = z[:k]
    t = z[k:].reshape(k, 2)
    s_sq = jnp.sum(t * t, axis=-1)
    s = jnp.sqrt(jnp.maximum(s_sq, 1e-30))
    u = t / s[:, None]

    in_cone = s <= n
    in_polar = s <= -n

    h = 0.5 * (n + s)
    eye2 = jnp.eye(2, dtype=dtype)
    uuT = u[:, :, None] * u[:, None, :]

    # Boundary-region blocks.
    d_nn = jnp.full((k,), 0.5, dtype)
    d_nt = 0.5 * u                                     # (k, 2)
    d_tt = (h / s)[:, None, None] * (eye2 - uuT) + 0.5 * uuT

    # Select per-cone region.
    one = jnp.ones((k,), dtype)
    zero = jnp.zeros((k,), dtype)
    d_nn = jnp.where(in_cone, one, jnp.where(in_polar, zero, d_nn))
    d_nt = jnp.where(in_cone[:, None] | in_polar[:, None],
                     jnp.zeros_like(d_nt), d_nt)
    d_tt = jnp.where(in_cone[:, None, None], eye2,
                     jnp.where(in_polar[:, None, None],
                               jnp.zeros_like(d_tt), d_tt))

    # Scatter blocks into the stacked layout:
    # normal index i; tangent indices k + 2i, k + 2i + 1.
    D = jnp.zeros((3 * k, 3 * k), dtype)
    idx_n = jnp.arange(k)
    idx_t0 = k + 2 * jnp.arange(k)
    idx_t1 = idx_t0 + 1
    D = D.at[idx_n, idx_n].set(d_nn)
    D = D.at[idx_n, idx_t0].set(d_nt[:, 0])
    D = D.at[idx_n, idx_t1].set(d_nt[:, 1])
    D = D.at[idx_t0, idx_n].set(d_nt[:, 0])
    D = D.at[idx_t1, idx_n].set(d_nt[:, 1])
    D = D.at[idx_t0, idx_t0].set(d_tt[:, 0, 0])
    D = D.at[idx_t0, idx_t1].set(d_tt[:, 0, 1])
    D = D.at[idx_t1, idx_t0].set(d_tt[:, 1, 0])
    D = D.at[idx_t1, idx_t1].set(d_tt[:, 1, 1])
    return D


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def solve_cone_qp(Q: Array, q: Array,
                  iterations: int = DEFAULT_ITERATIONS) -> Array:
    """Solves ``min 0.5 x^T Q x + q^T x`` over the Lorentz-cone product.

    Args:
        Q: ``(3k, 3k)`` PSD cost matrix (Delassus + regularization).
        q: ``(3k,)`` cost vector, stacked ``[normals; tangent pairs]``.
        iterations: static APGD iteration count.

    Returns:
        ``(3k,)`` optimal impulse in the stacked layout.
    """
    x0 = jnp.zeros_like(q)
    return _apgd(Q, q, x0, iterations)


def ift_cotangents(Q: Array, q: Array, x: Array,
                   g: Array) -> Tuple[Array, Array]:
    """IFT cotangents for any solver of the cone QP: differentiate the
    projection fixed point ``F(x) = x - P(x - alpha (Q x + q)) = 0``
    (which holds at the optimum for every ``alpha > 0``)."""
    alpha = 1.0 / _lipschitz_estimate(Q)
    z = x - alpha * (Q @ x + q)
    D = _projection_jacobian(z)
    n = Q.shape[-1]
    eye = jnp.eye(n, dtype=Q.dtype)
    # dF/dx = I - D (I - alpha Q).
    dF_dx = eye - D @ (eye - alpha * Q)
    # Solve dF_dx^T w = g (small dense system; regularized for the
    # degenerate strictly-active case).
    reg = 1e-10 * eye
    w = jnp.linalg.solve(dF_dx.T + reg, g)
    # dF/dq = alpha D  =>  bar q = -alpha D^T w;  bar Q = bar q x^T (sym.)
    Dtw = D.T @ w
    bar_q = -alpha * Dtw
    bar_Q = jnp.outer(bar_q, x)
    return bar_Q, bar_q


def _solve_fwd(Q: Array, q: Array, iterations: int):
    x = solve_cone_qp(Q, q, iterations)
    return x, (Q, q, x)


def _solve_bwd(iterations: int, residuals, g: Array):
    del iterations
    Q, q, x = residuals
    return ift_cotangents(Q, q, x, g)


solve_cone_qp.defvjp(_solve_fwd, _solve_bwd)


def solve_contact_impulse(delassus: Array, q_vec: Array, eps: Array,
                          iterations: int = DEFAULT_ITERATIONS
                          ) -> Tuple[Array, Array]:
    """Contact-impulse solve with the reference's failure masking.

    Builds ``Q = delassus + eps I`` and solves the cone QP; impulses with
    any element exceeding 1e3 in magnitude or non-finite are zeroed, and a
    validity flag is returned so callers can mask loss contributions
    (reference ``multibody_learnable_system.py:186-192``).

    Args:
        delassus: ``(3k, 3k)`` Delassus operator.
        q_vec: ``(3k,)`` cost vector.
        eps: scalar regularization.

    Returns:
        impulse: ``(3k,)`` (zeroed where invalid).
        valid: scalar bool.
    """
    n = delassus.shape[-1]
    Q = delassus + eps * jnp.eye(n, dtype=delassus.dtype)
    impulse = solve_cone_qp(Q, q_vec, iterations)
    finite = jnp.all(jnp.isfinite(impulse))
    bounded = jnp.all(jnp.abs(impulse) <= 1e3)
    valid = finite & bounded
    impulse = jnp.where(valid, impulse, jnp.zeros_like(impulse))
    # Guard NaN propagation through where.
    impulse = jnp.nan_to_num(impulse)
    return impulse, valid
