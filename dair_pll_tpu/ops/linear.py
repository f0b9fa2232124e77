r"""Small-matrix linear algebra unrolled for TPU fusion.

XLA lowers ``cholesky``/``triangular_solve`` to custom calls that, for
batched tiny matrices (the ``n_v x n_v`` mass matrices here, ``n_v <=
~16``), dominate the training step (profiled at ~1/3 of the whole
ContactNets step). These helpers unroll the factorization and
substitutions over the *static* matrix dimension into plain elementwise
arithmetic on the batch — everything fuses into neighboring VPU work, no
custom calls, and gradients flow through ordinary autodiff.

Used by ``multibody/terms.py`` and ``multibody/learnable_system.py`` for
mass-matrix solves (replacing ``jax.scipy.linalg.cho_factor/cho_solve``).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
from jax import Array

# Above this size the unrolled code bloats; fall back to lax cholesky.
MAX_UNROLL_DIM = 20


def cholesky_unrolled(M: Array) -> Array:
    """Cholesky factor ``L`` (lower) of a small SPD matrix, unrolled.

    Args:
        M: ``(*, n, n)`` SPD matrices, ``n`` static and small.

    Returns:
        ``(*, n, n)`` lower-triangular factors with ``L L^T = M``.
    """
    n = M.shape[-1]
    if n > MAX_UNROLL_DIM:
        return jnp.linalg.cholesky(M)
    L: List[List[Array]] = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = []
    zero = jnp.zeros_like(M[..., 0, 0])
    for i in range(n):
        rows.append(jnp.stack(
            [L[i][j] if j <= i else zero for j in range(n)], axis=-1))
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(L: Array, rhs: Array) -> Array:
    """Solves ``L L^T x = rhs`` by unrolled forward/back substitution.

    Args:
        L: ``(*, n, n)`` lower Cholesky factors (static small ``n``).
        rhs: ``(*, n)`` or ``(*, n, m)`` right-hand sides.

    Returns:
        Solution with the shape of ``rhs``.
    """
    n = L.shape[-1]
    vector_rhs = rhs.ndim == L.ndim - 1
    if vector_rhs:
        rhs = rhs[..., None]
    if n > MAX_UNROLL_DIM:
        import jax
        x = jax.scipy.linalg.cho_solve((L, True), rhs)
        return x[..., 0] if vector_rhs else x

    # forward substitution: L y = rhs
    y: List[Array] = []
    for i in range(n):
        s = rhs[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y.append(s / L[..., i, i, None])

    # back substitution: L^T x = y
    x: List[Array] = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]

    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vector_rhs else out


def spd_solve(M: Array, rhs: Array) -> Array:
    """Solves ``M x = rhs`` for small SPD ``M`` via unrolled Cholesky."""
    return cho_solve_unrolled(cholesky_unrolled(M), rhs)
