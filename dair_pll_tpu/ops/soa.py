r"""Structure-of-arrays (batch-minor) small-matrix dialect for TPU.

Round-1/2 profiling of the ContactNets training step showed that the
residual cost after ``small_matmul`` (``ops/tensor.py``) is *layout*, not
FLOPs: ``vmap`` places the batch dimension first, so every tiny
intermediate (``(B, 4, 3, 6)`` Jacobian blocks, ``(B, 12)`` cone states,
``(B, 12, 12)`` Delassus operators) tiles its trailing tiny dimensions
onto ``(8, 128)`` TPU tiles — inflating HBM traffic 10–40x and splitting
the step into ~100 small fusions.

This module flips the layout: a *batched scalar* is a plain ``(B,)``
array (one full lane-major tile stream, zero padding), a small vector is
a Python ``list`` of batched scalars, and a small matrix is a nested
list. All small-dimension loops unroll at trace time into elementwise VPU
arithmetic that XLA fuses freely; the batch dimension is always the
minor-most axis of every materialized buffer. The same functions serve as
the body of Pallas kernels, where refs load ``(block,)`` slices.

This is the TPU-idiomatic dual of the reference's per-sample torch code
(``/root/reference/dair_pll/multibody_terms.py``,
``tensor_utils.py``): instead of batching tiny operators, we scalarize
the physics and batch the *data*.

Conventions: ``svec`` = ``List[Array]`` of ``(B,)`` leaves; ``smat`` =
``List[List[Array]]`` (row-major). Scalars broadcast; everything is
dtype-polymorphic and autodiff-transparent.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from jax import Array

Svec = List[Array]
Smat = List[List[Array]]


# -- packing -------------------------------------------------------------------
def unstack(arr: Array) -> Svec:
    """``(n, B)`` (or ``(n,)``) array -> list of ``n`` rows."""
    return [arr[i] for i in range(arr.shape[0])]


def stack(vec: Sequence[Array]) -> Array:
    """List of ``(B,)`` -> ``(n, B)``."""
    return jnp.stack(list(vec), axis=0)


def stack_contacts(leaves: Sequence[Array]) -> Array:
    """Stacks per-contact scalar leaves along a leading contact axis.

    Shape-polymorphic over the two SoA dialects: ``(B,)`` leaves (the XLA
    path) stack to ``(k, B)``; ``(1, B)`` leaves (Pallas kernel bodies,
    where rank-1 intermediates are rejected) concatenate to the same
    ``(k, B)``."""
    leaves = list(leaves)
    if leaves[0].ndim >= 2:
        return jnp.concatenate(leaves, axis=0)
    return jnp.stack(leaves, axis=0)


def unstack_mat(arr: Array) -> Smat:
    """``(m, n, B)`` -> nested list."""
    return [[arr[i, j] for j in range(arr.shape[1])]
            for i in range(arr.shape[0])]


def stack_mat(mat: Smat) -> Array:
    """Nested list -> ``(m, n, B)``."""
    return jnp.stack([jnp.stack(row, axis=0) for row in mat], axis=0)


def zeros_like_leaf(leaf: Array) -> Array:
    return jnp.zeros_like(leaf)


def zero_svec(n: int, like: Array) -> Svec:
    z = jnp.zeros_like(like)
    return [z for _ in range(n)]


# -- vector algebra ------------------------------------------------------------
def vadd(a: Svec, b: Svec) -> Svec:
    return [x + y for x, y in zip(a, b)]


def vsub(a: Svec, b: Svec) -> Svec:
    return [x - y for x, y in zip(a, b)]


def vscale(s, a: Svec) -> Svec:
    return [s * x for x in a]


def dot(a: Svec, b: Svec) -> Array:
    acc = a[0] * b[0]
    for x, y in zip(a[1:], b[1:]):
        acc = acc + x * y
    return acc


def cross3(a: Svec, b: Svec) -> Svec:
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def norm(a: Svec, floor: float = 0.0) -> Array:
    return jnp.sqrt(jnp.maximum(dot(a, a), floor))


# -- matrix algebra --------------------------------------------------------------
def matvec(A: Smat, x: Svec) -> Svec:
    return [dot(row, x) for row in A]


def matvec_t(A: Smat, x: Svec) -> Svec:
    """``A^T x`` without forming the transpose."""
    n = len(A[0])
    out = []
    for j in range(n):
        acc = A[0][j] * x[0]
        for i in range(1, len(A)):
            acc = acc + A[i][j] * x[i]
        out.append(acc)
    return out


def matmul(A: Smat, B: Smat) -> Smat:
    m, kk, n = len(A), len(B), len(B[0])
    out = []
    for i in range(m):
        row = []
        for j in range(n):
            acc = A[i][0] * B[0][j]
            for k in range(1, kk):
                acc = acc + A[i][k] * B[k][j]
            row.append(acc)
        out.append(row)
    return out


def matmul_t(A: Smat, B: Smat) -> Smat:
    """``A^T B``."""
    return matmul(transpose(A), B)


def transpose(A: Smat) -> Smat:
    return [list(col) for col in zip(*A)]


def madd(A: Smat, B: Smat) -> Smat:
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(A, B)]


def msub(A: Smat, B: Smat) -> Smat:
    return [[x - y for x, y in zip(ra, rb)] for ra, rb in zip(A, B)]


def mscale(s, A: Smat) -> Smat:
    return [[s * x for x in row] for row in A]


def outer(a: Svec, b: Svec) -> Smat:
    return [[x * y for y in b] for x in a]


def skew(v: Svec) -> Smat:
    """Cross-product matrix of a 3-vector."""
    z = jnp.zeros_like(v[0])
    return [[z, -v[2], v[1]],
            [v[2], z, -v[0]],
            [-v[1], v[0], z]]


def eye(n: int, like: Array) -> Smat:
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [[one if i == j else zero for j in range(n)] for i in range(n)]


def zero_smat(m: int, n: int, like: Array) -> Smat:
    z = jnp.zeros_like(like)
    return [[z for _ in range(n)] for _ in range(m)]


# -- factorizations --------------------------------------------------------------
def cholesky(M: Smat) -> Smat:
    """Unrolled lower-Cholesky of a small SPD ``smat`` (the SoA analogue
    of ``ops/linear.cholesky_unrolled``)."""
    n = len(M)
    L: List[List[Array]] = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(M[0][0])
    for i in range(n):
        for j in range(i + 1, n):
            L[i][j] = zero
    return L


def cho_solve(L: Smat, rhs: Svec) -> Svec:
    """Solves ``L L^T x = rhs`` (forward + back substitution, unrolled)."""
    n = len(L)
    y: List[Array] = []
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    x: List[Array] = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def ldlt(M: Smat) -> Tuple[Smat, Svec]:
    """Unrolled ``L D L^T`` factorization of a small SPD ``smat``.

    Returns ``(L, d_inv)`` with ``L`` unit-lower-triangular and ``d_inv``
    the *reciprocal* diagonal of ``D``. Preferred over :func:`cholesky`
    in hot paths: the factorization needs ``n`` reciprocals and **zero**
    square roots, and :func:`ldlt_solve` is division-free — on the TPU
    VPU a divide/sqrt costs several multiply slots, and the IPM solver
    re-solves against the same factorization many times per iteration.
    """
    n = len(M)
    L: List[List[Array]] = [[None] * n for _ in range(n)]
    # C[i][j] = L[i][j] * d[j] (the pre-scaled column), kept so inner
    # updates are multiply-adds without re-multiplying by d.
    C: List[List[Array]] = [[None] * n for _ in range(n)]
    d_inv: List[Array] = []
    one = jnp.ones_like(M[0][0])
    zero = jnp.zeros_like(M[0][0])
    for j in range(n):
        s = M[j][j]
        for k in range(j):
            s = s - L[j][k] * C[j][k]
        dj_inv = 1.0 / s
        d_inv.append(dj_inv)
        L[j][j] = one
        for i in range(j + 1, n):
            c = M[i][j]
            for k in range(j):
                c = c - L[i][k] * C[j][k]
            C[i][j] = c
            L[i][j] = c * dj_inv
    for i in range(n):
        for j in range(i + 1, n):
            L[i][j] = zero
    return L, d_inv


def ldlt_solve(fac: Tuple[Smat, Svec], rhs: Svec) -> Svec:
    """Solves ``L D L^T x = rhs`` from :func:`ldlt` with zero divisions
    (unit-lower forward sub, reciprocal-diagonal scale, back sub)."""
    L, d_inv = fac
    n = len(L)
    y: List[Array] = []
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s)
    x: List[Array] = [None] * n
    for i in reversed(range(n)):
        s = y[i] * d_inv[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s
    return x


def spd_solve(M: Smat, rhs: Svec) -> Svec:
    return ldlt_solve(ldlt(M), rhs)


def sym3_inverse(A: Smat, floor: float = 1e-30) -> Smat:
    """Analytic inverse of a symmetric 3x3 ``smat`` via the adjugate
    (branchless; SoA analogue of ``ops/cones.sym3_inverse``)."""
    a, b, c = A[0][0], A[0][1], A[0][2]
    d, e = A[1][1], A[1][2]
    f = A[2][2]
    co_a = d * f - e * e
    co_b = c * e - b * f
    co_c = b * e - c * d
    co_d = a * f - c * c
    co_e = b * c - a * e
    co_f = a * d - b * b
    det3 = a * co_a + b * co_b + c * co_c
    det3 = jnp.where(jnp.abs(det3) > floor, det3, floor)
    inv = 1.0 / det3
    return [[co_a * inv, co_b * inv, co_c * inv],
            [co_b * inv, co_d * inv, co_e * inv],
            [co_c * inv, co_e * inv, co_f * inv]]


# -- sorting networks --------------------------------------------------------------
def sort_with_payload(keys: Svec, payloads: List[Svec],
                      descending: bool = False
                      ) -> Tuple[Svec, List[Svec]]:
    """Sorts ``keys`` (list of ``(B,)``) per batch element with an
    insertion-style compare-exchange network, carrying ``payloads`` (each a
    list parallel to ``keys``) through the same swaps.

    The network is exact (total order); gradients flow through the
    ``jnp.where`` selects to whichever element wins each slot — matching
    the subgradient semantics of ``lax.top_k`` gather.
    """
    n = len(keys)
    keys = list(keys)
    payloads = [list(p) for p in payloads]
    for i in range(1, n):
        for j in range(i, 0, -1):
            a, b = keys[j - 1], keys[j]
            swap = (a < b) if descending else (a > b)
            keys[j - 1] = jnp.where(swap, b, a)
            keys[j] = jnp.where(swap, a, b)
            for p in payloads:
                pa, pb = p[j - 1], p[j]
                p[j - 1] = jnp.where(swap, pb, pa)
                p[j] = jnp.where(swap, pa, pb)
    return keys, payloads
