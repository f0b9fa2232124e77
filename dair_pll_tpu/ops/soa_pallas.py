r"""Pallas TPU kernel for the fused batch-minor hybrid cone solve.

The hybrid NT-IPM + SAP-Newton solve (``ops/soa_solver.py``) is ~3/4 of
the fused ContactNets step's device time under XLA: its per-iteration
state round-trips HBM through ~100 small fusions per iteration. This
kernel runs the ENTIRE solve — all IPM and Newton iterations, the exact
line search, the failure masking — VMEM-resident per batch block: inputs
are read from HBM once, the iterations never touch HBM, and one kernel
launch replaces hundreds.

The kernel body literally calls ``soa_solver.solve_contact_impulse_soa``
— the SoA dialect (every per-sample scalar a ``(1, block)`` or
``(k, block)`` array, ``fori_loop`` iterations, keepdims reductions) is
exactly the form Mosaic lowers; the XLA path and the kernel share one
implementation, so parity is structural.

Used under ``stop_gradient`` (envelope theorem) — no VJP needed.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dair_pll_tpu.ops import soa_solver

DEFAULT_BLOCK = 1024

#: Kernel batch layout: the flat batch axis enters every kernel reshaped
#: ``(..., B) -> (..., SUBLANES, B / SUBLANES)`` so per-sample leaves are
#: FULL ``(8, lanes)`` tiles instead of 1-sublane rows padded 8x, and
#: cone fields ``(k, 8, lanes)`` stack whole tiles along an untiled
#: leading axis (leading-axis reductions are plain tile adds). Measured
#: round-3: the 2-D ``(1, blk)`` layout wasted 7/8 of the VPU on all
#: per-sample algebra (Schur assembly, Cholesky, line search scalars).
SUBLANES = 8


def _tile_pack(arr: Array) -> Array:
    """``(..., B) -> (..., 8, B // 8)`` (B must divide by 8)."""
    return arr.reshape(arr.shape[:-1] + (SUBLANES,
                                         arr.shape[-1] // SUBLANES))


def _block_sizes(block: int, B: int) -> Tuple[int, int, int]:
    """Rounds the per-block sample count to a sublane multiple; returns
    ``(blk, n_blocks, padded)``."""
    blk = min(block, B)
    blk = max(SUBLANES, (blk + SUBLANES - 1) // SUBLANES * SUBLANES)
    n_blocks = -(-B // blk)
    return blk, n_blocks, n_blocks * blk


def _kernel(m_ref, jc_ref, qc_ref, force_ref, valid_ref, *, n_v: int,
            eps: float, ipm_iterations: int, newton_iterations: int):
    # Unpack refs into the SoA dialect: per-sample leaves as (1, 8,
    # lanes) full tiles, cone-field leaves as (k, 8, lanes).
    M = [[m_ref[i * n_v + j:i * n_v + j + 1] for j in range(n_v)]
         for i in range(n_v)]
    Jc = [[jc_ref[i, v] for v in range(n_v)] for i in range(3)]
    qc = [qc_ref[i] for i in range(3)]

    force, valid = soa_solver.solve_contact_impulse_soa(
        M, Jc, qc, eps, ipm_iterations, newton_iterations)

    for i in range(3):
        force_ref[i] = force[i]
    valid_ref[0:1] = valid.astype(valid_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "ipm_iterations",
                                    "newton_iterations", "block",
                                    "interpret"))
def solve_contact_impulse_soa_pallas(
        M: List[List[Array]], Jc: List[List[Array]], qc: List[Array],
        eps: float, ipm_iterations: int, newton_iterations: int,
        block: int = DEFAULT_BLOCK, interpret: bool = False
        ) -> Tuple[List[Array], Array]:
    """Pallas-fused counterpart of
    ``soa_solver.solve_contact_impulse_soa`` (same inputs/outputs:
    ``M`` smat of ``(B,)``-broadcastable leaves, ``Jc`` ``(3, n_v)`` of
    ``(k, B)``, ``qc`` cone field; returns ``(force cone field, valid)``).

    ``eps`` must be a static Python float (it is a fixed loss
    hyperparameter at every call site).
    """
    n_v = len(M)
    k, B = qc[0].shape
    dtype = qc[0].dtype

    blk, n_blocks, padded = _block_sizes(block, B)
    lanes = blk // SUBLANES

    def pad(leaf):
        if padded == B:
            return leaf
        pad_width = [(0, 0)] * (leaf.ndim - 1) + [(0, padded - B)]
        return jnp.pad(leaf, pad_width, mode="edge")

    m_arr = _tile_pack(pad(jnp.stack(
        [jnp.broadcast_to(M[i][j], (B,)) for i in range(n_v)
         for j in range(n_v)])))                   # (n_v^2, 8, P/8)
    jc_arr = _tile_pack(pad(jnp.stack(
        [jnp.stack([Jc[i][v] for v in range(n_v)]) for i in range(3)])))
    qc_arr = _tile_pack(pad(jnp.stack(qc)))        # (3, k, 8, P/8)

    kernel = functools.partial(
        _kernel, n_v=n_v, eps=eps, ipm_iterations=ipm_iterations,
        newton_iterations=newton_iterations)

    force_arr, valid_arr = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_v * n_v, SUBLANES, lanes),
                         lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_v, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, k, SUBLANES, padded // SUBLANES),
                                 dtype),
            jax.ShapeDtypeStruct((1, SUBLANES, padded // SUBLANES),
                                 dtype),
        ),
        interpret=interpret,
    )(m_arr, jc_arr, qc_arr)

    force = [force_arr[i].reshape(k, padded)[:, :B] for i in range(3)]
    valid = valid_arr.reshape(1, padded)[:, :B] > 0.5
    return force, valid


def _warm_kernel(m_ref, jc_ref, qc_ref, w0_ref, force_ref, w_ref,
                 valid_ref, *, n_v: int, eps: float, ipm_iterations: int,
                 newton_iterations: int):
    M = [[m_ref[i * n_v + j:i * n_v + j + 1] for j in range(n_v)]
         for i in range(n_v)]
    Jc = [[jc_ref[i, v] for v in range(n_v)] for i in range(3)]
    qc = [qc_ref[i] for i in range(3)]
    w_carry = [w0_ref[v:v + 1] for v in range(n_v)]

    force, w, valid = soa_solver.solve_warm_hybrid_soa(
        M, Jc, qc, w_carry, eps, ipm_iterations, newton_iterations)

    for i in range(3):
        force_ref[i] = force[i]
    for v in range(n_v):
        w_ref[v:v + 1] = jnp.broadcast_to(w[v], (1,) + w_ref.shape[1:])
    valid_ref[0:1] = valid.astype(valid_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "ipm_iterations",
                                    "newton_iterations", "block",
                                    "interpret"))
def solve_warm_hybrid_soa_pallas(
        M: List[List[Array]], Jc: List[List[Array]], qc: List[Array],
        w_carry: List[Array], eps: float, ipm_iterations: int,
        newton_iterations: int, block: int = DEFAULT_BLOCK,
        interpret: bool = False
        ) -> Tuple[List[Array], List[Array], Array]:
    """Pallas-fused counterpart of
    ``soa_solver.solve_warm_hybrid_soa`` — the rollout path's
    warm-started hybrid solve, VMEM-resident per block (same structural
    parity as :func:`solve_contact_impulse_soa_pallas`: the kernel body
    calls the same SoA solver code). ``w_carry`` is an svec of ``(1, B)``
    (or ``(B,)``) carried primals."""
    n_v = len(M)
    k, B = qc[0].shape
    dtype = qc[0].dtype

    blk, n_blocks, padded = _block_sizes(block, B)
    lanes = blk // SUBLANES

    def pad(leaf):
        if padded == B:
            return leaf
        pad_width = [(0, 0)] * (leaf.ndim - 1) + [(0, padded - B)]
        return jnp.pad(leaf, pad_width, mode="edge")

    m_arr = _tile_pack(pad(jnp.stack(
        [jnp.broadcast_to(M[i][j], (B,)) for i in range(n_v)
         for j in range(n_v)])))                   # (n_v^2, 8, P/8)
    jc_arr = _tile_pack(pad(jnp.stack(
        [jnp.stack([Jc[i][v] for v in range(n_v)]) for i in range(3)])))
    qc_arr = _tile_pack(pad(jnp.stack(qc)))        # (3, k, 8, P/8)
    w0_arr = _tile_pack(pad(jnp.stack(
        [jnp.broadcast_to(jnp.asarray(w_carry[v]).reshape(-1)[-B:], (B,))
         for v in range(n_v)])))                   # (n_v, 8, P/8)

    kernel = functools.partial(
        _warm_kernel, n_v=n_v, eps=eps, ipm_iterations=ipm_iterations,
        newton_iterations=newton_iterations)

    force_arr, w_arr, valid_arr = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_v * n_v, SUBLANES, lanes),
                         lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_v, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_v, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_v, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, k, SUBLANES, padded // SUBLANES),
                                 dtype),
            jax.ShapeDtypeStruct((n_v, SUBLANES, padded // SUBLANES),
                                 dtype),
            jax.ShapeDtypeStruct((1, SUBLANES, padded // SUBLANES),
                                 dtype),
        ),
        interpret=interpret,
    )(m_arr, jc_arr, qc_arr, w0_arr)

    force = [force_arr[i].reshape(k, padded)[:, :B] for i in range(3)]
    w = [w_arr[v].reshape(1, padded)[:, :B] for v in range(n_v)]
    valid = valid_arr.reshape(1, padded)[:, :B] > 0.5
    return force, w, valid
