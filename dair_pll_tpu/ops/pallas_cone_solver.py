r"""Pallas TPU kernel for the batched Lorentz-cone QP solve.

Fuses the entire APGD iteration loop of ``ops/cone_solver.py`` into one
TPU kernel: each grid program loads a *batch tile* of QPs into VMEM and
runs all iterations on-chip — the ``Q`` matrices and loop-carried iterates
never round-trip through HBM between iterations, unlike the XLA
``lax.scan`` version.

Layout: problems live in *lanes* (batch tile of 128·U lanes) and the cone
variables in *sublanes*, reordered from the framework's stacked layout
``[n_1..n_k, t_1x t_1y ..]`` into contiguous blocks ``[n(k); t_x(k);
t_y(k)]`` so every kernel operation is a full-width ``(k, TILE)`` or
``(n, TILE)`` VPU op (no single-row arithmetic). The row permutation is
applied to ``Q``/``q`` outside the kernel (cheap gathers).

Replaces the reference's C++ ``sappy`` solver
(``/root/reference/dair_pll/multibody_learnable_system.py:29``) on the
batched-training hot path; gradients come from the envelope-theorem
detach (ContactNets) or the IFT VJP of the lax solver (simulation).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl

BATCH_TILE = 512
POWER_ITERATIONS = 12


def _block_permutation(k: int) -> np.ndarray:
    """Permutation p with ``blocked[i] = stacked[p[i]]`` mapping the
    stacked layout ``[n(k), t_1x t_1y ..]`` to ``[n(k); t_x(k); t_y(k)]``."""
    perm = list(range(k))                            # normals unchanged
    perm += [k + 2 * c for c in range(k)]            # t_x rows
    perm += [k + 2 * c + 1 for c in range(k)]        # t_y rows
    return np.asarray(perm, np.int32)


def _make_kernel(k: int, iterations: int):
    n = 3 * k

    def kernel(Q_ref, q_ref, x_ref):
        Q_tile = Q_ref[:]                 # (n, n, TILE) blocked rows/cols
        q_tile = q_ref[:]                 # (n, TILE)

        def matvec(v):
            # (n, TILE): accumulate rank-1 lane products over columns.
            acc = Q_tile[:, 0, :] * v[0:1, :]
            for j in range(1, n):
                acc = acc + Q_tile[:, j, :] * v[j:j + 1, :]
            return acc

        def project(x):
            # Blocked rows: [n(k); t_x(k); t_y(k)] -> full-width ops.
            n_rows = x[0:k, :]
            tx = x[k:2 * k, :]
            ty = x[2 * k:3 * k, :]
            s = jnp.sqrt(jnp.maximum(tx * tx + ty * ty, 1e-30))
            inside = s <= n_rows
            polar = s <= -n_rows
            h = 0.5 * (n_rows + s)
            n_new = jnp.where(inside, n_rows,
                              jnp.where(polar, 0.0, h))
            scale = jnp.where(inside, jnp.ones_like(s),
                              jnp.where(polar, jnp.zeros_like(s), h / s))
            return jnp.concatenate(
                (n_new, tx * scale, ty * scale), axis=0)

        # Lipschitz estimate by power iteration (per problem, lanes).
        v = jnp.ones_like(q_tile) / jnp.sqrt(jnp.asarray(n, q_tile.dtype))

        def power_body(_, v):
            w = matvec(v)
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(w * w, axis=0, keepdims=True), 1e-30))
            return w / norm

        v = jax.lax.fori_loop(0, POWER_ITERATIONS, power_body, v)
        lam = jnp.sum(v * matvec(v), axis=0, keepdims=True)
        inv_L = 1.0 / (1.1 * jnp.maximum(lam, 1e-12))    # (1, TILE)

        zeros = jnp.zeros_like(q_tile)

        def apgd_body(_, carry):
            x, y, t = carry
            grad = matvec(y) + q_tile
            x_new = project(y - inv_L * grad)
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
        Q: ``(B, 3k, 3k)`` PSD cost matrices (stacked layout).
        q: ``(B, 3k)`` cost vectors (stacked ``[normals; tangents]``).
        iterations: APGD iteration count (static).
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns:
        ``(B, 3k)`` optimal impulses (stacked layout).
    """
    B, n = q.shape
    assert n % 3 == 0
    k = n // 3

    # Reorder cone variables into contiguous blocks for the kernel.
    perm = jnp.asarray(_block_permutation(k))
    inv_perm = jnp.argsort(perm)
    Q = Q[:, perm][:, :, perm]
    q = q[:, perm]

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
    x = jnp.transpose(x_t, (1, 0))[:B]
    return x[:, inv_perm]


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
