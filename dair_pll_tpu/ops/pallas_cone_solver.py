r"""Pallas TPU kernel for the batched Lorentz-cone QP solve.

Fuses the entire APGD iteration loop of ``ops/cone_solver.py`` into one
TPU kernel: each grid program loads a *batch tile* of QPs into VMEM and
runs all iterations on-chip — zero HBM round trips between iterations,
unlike the XLA ``lax.scan`` version whose loop-carried state streams
through HBM every iteration.

Memory layout is transposed for the VPU: cone variables live in
*sublanes* (padded ``3k`` up) and the batch tile in *lanes* (128), so
every arithmetic op processes 128 problems at once. The ``Q`` matvec
unrolls over the (static, small) ``3k`` dimension as lane-parallel
multiply-adds.

The kernel solves the same problem as :func:`solve_cone_qp`
(replacement for the reference's C++ ``sappy`` solver,
``/root/reference/dair_pll/multibody_learnable_system.py:29``); gradients
are provided by the same implicit-function-theorem VJP.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dair_pll_tpu.ops import cone_solver as reference_solver

BATCH_TILE = 128
POWER_ITERATIONS = 12


def _cone_project_tile(x, k: int, n: int):
    """Projects a (n, TILE) tile onto the product Lorentz cone.

    Rows 0..k-1 are normals; rows k + 2i, k + 2i + 1 the tangent pairs.
    """
    outs = [None] * n
    for cone in range(k):
        n_row = x[cone, :]
        t0 = x[k + 2 * cone, :]
        t1 = x[k + 2 * cone + 1, :]
        s_sq = t0 * t0 + t1 * t1
        s = jnp.sqrt(jnp.maximum(s_sq, 1e-30))
        inside = s <= n_row
        polar = s <= -n_row
        h = 0.5 * (n_row + s)
        n_new = jnp.where(inside, n_row, jnp.where(polar, 0.0, h))
        scale = jnp.where(inside, jnp.ones_like(s),
                          jnp.where(polar, jnp.zeros_like(s), h / s))
        outs[cone] = n_new
        outs[k + 2 * cone] = t0 * scale
        outs[k + 2 * cone + 1] = t1 * scale
    return jnp.stack(outs, axis=0)


def _matvec_tile(Q_tile, v_tile, n: int):
    """(n, n, TILE) x (n, TILE) -> (n, TILE) lane-parallel matvec."""
    rows = []
    for i in range(n):
        acc = Q_tile[i, 0, :] * v_tile[0, :]
        for j in range(1, n):
            acc = acc + Q_tile[i, j, :] * v_tile[j, :]
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def _make_kernel(k: int, iterations: int):
    n = 3 * k

    def kernel(Q_ref, q_ref, x_ref):
        Q_tile = Q_ref[:]                 # (n, n, TILE)
        q_tile = q_ref[:]                 # (n, TILE)

        # Lipschitz estimate by power iteration (per problem, lanes).
        v = jnp.ones_like(q_tile) / jnp.sqrt(jnp.asarray(n, q_tile.dtype))

        def power_body(_, v):
            w = _matvec_tile(Q_tile, v, n)
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(w * w, axis=0, keepdims=True), 1e-30))
            return w / norm

        v = jax.lax.fori_loop(0, POWER_ITERATIONS, power_body, v)
        Qv = _matvec_tile(Q_tile, v, n)
        lam = jnp.sum(v * Qv, axis=0, keepdims=True)
        inv_L = 1.0 / (1.1 * jnp.maximum(lam, 1e-12))    # (1, TILE)

        zeros = jnp.zeros_like(q_tile)

        def apgd_body(_, carry):
            x, y, t = carry
            grad = _matvec_tile(Q_tile, y, n) + q_tile
            x_new = _cone_project_tile(y - inv_L * grad, k, n)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            momentum = (t - 1.0) / t_new
            restart = jnp.sum((y - x_new) * (x_new - x), axis=0,
                              keepdims=True) > 0.0
            t_new = jnp.where(restart, jnp.ones_like(t_new), t_new)
            momentum = jnp.where(restart, jnp.zeros_like(momentum),
                                 momentum)
            y_new = x_new + momentum * (x_new - x)
            return (x_new, y_new, t_new)

        t0 = jnp.ones((1, q_tile.shape[-1]), q_tile.dtype)
        x, _, _ = jax.lax.fori_loop(
            0, iterations, apgd_body, (zeros, zeros, t0))
        x_ref[:] = x

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def solve_cone_qp_pallas(Q: Array, q: Array,
                         iterations: int = 200,
                         interpret: bool = False) -> Array:
    """Batched cone-QP solve as a fused Pallas kernel.

    Args:
        Q: ``(B, 3k, 3k)`` PSD cost matrices.
        q: ``(B, 3k)`` cost vectors (stacked ``[normals; tangents]``).
        iterations: APGD iteration count (static).
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns:
        ``(B, 3k)`` optimal impulses.
    """
    B, n = q.shape
    assert n % 3 == 0
    k = n // 3

    # Pad the batch to a tile multiple and transpose to lane-major layout.
    pad = (-B) % BATCH_TILE
    if pad:
        Q = jnp.concatenate(
            (Q, jnp.broadcast_to(jnp.eye(n, dtype=Q.dtype),
                                 (pad, n, n))), axis=0)
        q = jnp.concatenate((q, jnp.zeros((pad, n), q.dtype)), axis=0)
    B_padded = B + pad

    Q_t = jnp.transpose(Q, (1, 2, 0))        # (n, n, B)
    q_t = jnp.transpose(q, (1, 0))           # (n, B)

    grid = (B_padded // BATCH_TILE,)
    kernel = _make_kernel(k, iterations)
    x_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, BATCH_TILE), lambda i: (0, 0, i)),
            pl.BlockSpec((n, BATCH_TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n, BATCH_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, B_padded), q.dtype),
        interpret=interpret,
    )(Q_t, q_t)
    x = jnp.transpose(x_t, (1, 0))
    return x[:B]


def solve_contact_impulse_pallas(delassus: Array, q_vec: Array, eps,
                                 iterations: int = 200,
                                 interpret: bool = False
                                 ) -> Tuple[Array, Array]:
    """Batched contact-impulse solve with failure masking, Pallas-backed.

    Batched counterpart of
    :func:`dair_pll_tpu.ops.cone_solver.solve_contact_impulse`.
    """
    n = delassus.shape[-1]
    Q = delassus + eps * jnp.eye(n, dtype=delassus.dtype)
    impulse = solve_cone_qp_pallas(Q, q_vec, iterations, interpret)
    finite = jnp.all(jnp.isfinite(impulse), axis=-1)
    bounded = jnp.all(jnp.abs(impulse) <= 1e3, axis=-1)
    valid = finite & bounded
    impulse = jnp.where(valid[:, None], impulse,
                        jnp.zeros_like(impulse))
    return jnp.nan_to_num(impulse), valid
