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


def _kernel(m_ref, jc_ref, qc_ref, force_ref, valid_ref, *, n_v: int,
            eps: float, ipm_iterations: int, newton_iterations: int):
    # Unpack refs into the SoA dialect: M rows as (1, blk), cone-field
    # leaves as (k, blk).
    M = [[m_ref[i * n_v + j:i * n_v + j + 1, :] for j in range(n_v)]
         for i in range(n_v)]
    Jc = [[jc_ref[i, v] for v in range(n_v)] for i in range(3)]
    qc = [qc_ref[i] for i in range(3)]

    force, valid = soa_solver.solve_contact_impulse_soa(
        M, Jc, qc, eps, ipm_iterations, newton_iterations)

    for i in range(3):
        force_ref[i] = force[i]
    valid_ref[0:1, :] = valid.astype(valid_ref.dtype)


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

    blk = min(block, B)
    n_blocks = -(-B // blk)
    padded = n_blocks * blk

    def pad(leaf):
        if padded == B:
            return leaf
        pad_width = [(0, 0)] * (leaf.ndim - 1) + [(0, padded - B)]
        return jnp.pad(leaf, pad_width, mode="edge")

    m_arr = pad(jnp.stack(
        [jnp.broadcast_to(M[i][j], (B,)) for i in range(n_v)
         for j in range(n_v)]))                          # (n_v^2, B)
    jc_arr = pad(jnp.stack(
        [jnp.stack([Jc[i][v] for v in range(n_v)]) for i in range(3)]))
    qc_arr = pad(jnp.stack(qc))                          # (3, k, B)

    kernel = functools.partial(
        _kernel, n_v=n_v, eps=eps, ipm_iterations=ipm_iterations,
        newton_iterations=newton_iterations)

    force_arr, valid_arr = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_v * n_v, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_v, k, blk), lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, blk), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, k, blk), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, k, padded), dtype),
            jax.ShapeDtypeStruct((1, padded), dtype),
        ),
        interpret=interpret,
    )(m_arr, jc_arr, qc_arr)

    force = [force_arr[i, :, :B] for i in range(3)]
    valid = valid_arr[0:1, :B] > 0.5
    return force, valid
