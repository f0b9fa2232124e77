r"""Single-kernel Pallas terms+solve+loss forward and terms+loss backward.

Round-2 profiling (ROADMAP 0b): at batch 1M the fused ContactNets step
spends ~67 ms in the Pallas hybrid solve and ~53 ms in XLA fusions of the
SoA terms chain and its autodiff transpose, all of which round-trip HBM
between fusions. This module collapses the WHOLE loss step into two
VMEM-resident kernels:

* **forward**: per batch block, read ``x``/``x_plus`` once, run the full
  SoA terms chain (``multibody/soa_terms.soa_loss_parts``), the hybrid
  cone solve (``ops/soa_solver``), and the loss assembly — one kernel
  launch for the entire forward.
* **backward**: the loss gradient does not flow through the solve
  (envelope theorem, reference ``multibody_learnable_system.py:172-184``),
  so the backward kernel recomputes terms+assembly at the saved impulse
  and differentiates **in-kernel** (``jax.grad`` inside the kernel body)
  with respect to (a) the ~15 derived scalar parameters threaded through
  SMEM and (b) the state inputs. Derived-parameter gradients accumulate
  across the sequential grid into an SMEM output; state cotangents write
  per block.

The kernel bodies call the same SoA functions as the XLA path
(``soa_loss_parts`` / ``soa_loss_assemble`` / ``solve_contact_impulse_soa``)
— parity is structural, not re-derived.

The chain from ``MultibodyParams`` to the packed derived vector
(``soa_terms.derive_scalar_params`` + :func:`pack_derived`) is ordinary
traced JAX outside the kernel; its VJP composes with the kernel's
``custom_vjp`` automatically.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dair_pll_tpu.ops import soa_solver
from dair_pll_tpu.ops.soa_pallas import (SUBLANES, _block_sizes,
                                         _tile_pack)

DEFAULT_BLOCK = 1024

# The backward kernel's transpose graph holds many (k, blk) live
# intermediates on the Mosaic stack; a generous scoped-VMEM limit plus a
# smaller block keeps it resident (measured: blk=4096 needs ~16.3 MB
# scoped, over the 16 MB default).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
# Measured on v5e at batch 1M/2M (scripts/tune_kernel_blocks.py): fwd
# 1024 / bwd 2048 is the fastest combination; larger forward blocks lose
# to VMEM pressure.
DEFAULT_BWD_BLOCK = 2048


# -- derived-parameter packing ---------------------------------------------------
def derived_size(model) -> int:
    """Number of packed derived scalars for a kernel-supported model."""
    count = 10 * model.n_bodies + len(model.geometries)
    for spec in model.geometries:
        if spec.geom_type == "box":
            count += 3
        elif spec.geom_type == "polygon":
            count += 3 * len(spec.vertices_init)
        elif spec.geom_type == "sphere":
            count += 1
    return count


def pack_derived(model, derived) -> Array:
    """Flattens the derived-parameter pytree into a ``(P,)`` vector in
    the fixed layout :func:`unpack_scalarized` mirrors. Differentiable —
    the VJP back to ``MultibodyParams`` is ordinary autodiff."""
    parts = [derived["pi"].reshape(-1), derived["mu"].reshape(-1)]
    for spec, entry in zip(model.geometries, derived["geom"]):
        if spec.geom_type == "box":
            parts.append(entry["half"].reshape(-1))
        elif spec.geom_type == "polygon":
            parts.append(entry["verts"].reshape(-1))
        elif spec.geom_type == "sphere":
            parts.append(jnp.reshape(entry["radius"], (1,)))
    return jnp.concatenate(parts)


def unpack_scalarized(model, read) -> dict:
    """Rebuilds the scalarized derived structure
    (``soa_terms.scalarize_derived`` shape) from an indexed scalar reader
    (SMEM ref reads inside a kernel; array indexing outside)."""
    idx = [0]

    def nxt():
        value = read(idx[0])
        idx[0] += 1
        return value

    pi = [[nxt() for _ in range(10)] for _ in range(model.n_bodies)]
    mu = [nxt() for _ in range(len(model.geometries))]
    geom = []
    for spec in model.geometries:
        if spec.geom_type == "box":
            geom.append({"half": [nxt() for _ in range(3)]})
        elif spec.geom_type == "polygon":
            geom.append({"verts": [
                [nxt() for _ in range(3)]
                for _ in range(len(spec.vertices_init))]})
        elif spec.geom_type == "sphere":
            geom.append({"radius": nxt()})
        else:
            geom.append({})
    return {"pi": pi, "mu": mu, "geom": geom}


def _split_state(model, xin_block):
    """``(n_x [+ n_u], 8, lanes)`` block -> (q, v, u) per-sample-leaf
    lists (each leaf a ``(1, 8, lanes)`` full-tile row)."""
    n_q, n_v, n_u = model.n_q, model.n_v, model.n_u
    rows = [xin_block[i:i + 1] for i in range(n_q + n_v + n_u)]
    q = rows[:n_q]
    v = rows[n_q:n_q + n_v]
    u = rows[n_q + n_v:]
    return q, v, u


# -- kernels ---------------------------------------------------------------------
def _fwd_kernel(pvec_ref, xin_ref, xp_ref, loss_ref, force_ref, valid_ref,
                *, model, dt: float, eps: float, ipm_iterations: int,
                newton_iterations: int):
    from dair_pll_tpu.multibody.soa_terms import (soa_loss_assemble,
                                                  soa_loss_parts)
    sp = unpack_scalarized(model, lambda i: pvec_ref[0, i])
    _, v, u = _split_state(model, xin_ref[...])
    q_plus, v_plus, _ = _split_state(model, xp_ref[...])

    M, Jc, phi, qc, dv = soa_loss_parts(model, sp, v, q_plus, v_plus, u,
                                        dt)
    force, valid = soa_solver.solve_contact_impulse_soa(
        M, Jc, qc, eps, ipm_iterations, newton_iterations)
    loss = soa_loss_assemble(M, Jc, phi, qc, dv, force, valid, eps)

    loss_ref[0:1] = loss
    for i in range(3):
        force_ref[i] = force[i]
    valid_ref[0:1] = valid.astype(valid_ref.dtype)


def _fwd_kernel_warm(pvec_ref, xin_ref, xp_ref, fprev_ref, loss_ref,
                     force_ref, valid_ref, *, model, dt: float,
                     eps: float, ipm_iterations: int,
                     newton_iterations: int):
    """Epoch-warm forward: like :func:`_fwd_kernel`, but the hybrid
    solve warm-starts from the impulses the same samples solved to on a
    previous epoch (``w = M^{-1} J^T gamma_prev`` at the CURRENT
    parameters, then better-of-primal-cost vs a short IPM path —
    ``soa_solver.solve_warm_hybrid_soa``)."""
    from dair_pll_tpu.multibody.soa_terms import (soa_loss_assemble,
                                                  soa_loss_parts)
    from dair_pll_tpu.ops import soa
    sp = unpack_scalarized(model, lambda i: pvec_ref[0, i])
    _, v, u = _split_state(model, xin_ref[...])
    q_plus, v_plus, _ = _split_state(model, xp_ref[...])

    M, Jc, phi, qc, dv = soa_loss_parts(model, sp, v, q_plus, v_plus, u,
                                        dt)
    fprev = [fprev_ref[i] for i in range(3)]
    w_carry = soa.spd_solve(M, soa_solver.jt_dot(Jc, fprev))
    force, _, valid = soa_solver.solve_warm_hybrid_soa(
        M, Jc, qc, w_carry, eps, ipm_iterations, newton_iterations)
    loss = soa_loss_assemble(M, Jc, phi, qc, dv, force, valid, eps)

    loss_ref[0:1] = loss
    for i in range(3):
        force_ref[i] = force[i]
    valid_ref[0:1] = valid.astype(valid_ref.dtype)


def _bwd_kernel(pvec_ref, xin_ref, xp_ref, force_ref, valid_ref, ct_ref,
                dp_ref, dxin_ref, dxp_ref, *, model, dt: float,
                eps: float, n_p: int):
    from dair_pll_tpu.multibody.soa_terms import (soa_loss_assemble,
                                                  soa_loss_parts)
    force = [force_ref[i] for i in range(3)]
    valid = valid_ref[0:1] > 0.5
    ct = ct_ref[0:1]
    pvals = [pvec_ref[0, i] for i in range(n_p)]
    xin_block = xin_ref[...]
    xp_block = xp_ref[...]

    def weighted_loss(pvals_in, xin_b, xp_b):
        sp = unpack_scalarized(model, lambda i: pvals_in[i])
        _, v, u = _split_state(model, xin_b)
        q_plus, v_plus, _ = _split_state(model, xp_b)
        M, Jc, phi, qc, dv = soa_loss_parts(model, sp, v, q_plus, v_plus,
                                            u, dt)
        loss = soa_loss_assemble(M, Jc, phi, qc, dv, force, valid, eps)
        return jnp.sum(loss * ct)

    dp, dxin, dxp = jax.grad(weighted_loss, argnums=(0, 1, 2))(
        pvals, xin_block, xp_block)

    # Sequential-grid accumulation of the derived-parameter gradient.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n_p):
            dp_ref[0, i] = jnp.zeros((), dp_ref.dtype)

    for i in range(n_p):
        dp_ref[0, i] += dp[i].astype(dp_ref.dtype)

    dxin_ref[...] = dxin
    dxp_ref[...] = dxp


# -- pallas_call wrappers --------------------------------------------------------
def _pad_minor(leaf: Array, padded: int) -> Array:
    B = leaf.shape[-1]
    if padded == B:
        return leaf
    pad_width = [(0, 0)] * (leaf.ndim - 1) + [(0, padded - B)]
    return jnp.pad(leaf, pad_width, mode="edge")


def _fused_loss_fwd_call(model, dt, eps, ipm_iterations,
                         newton_iterations, block, interpret, pvec, xin,
                         xp):
    n_rows = xin.shape[0]
    n_x = xp.shape[0]
    B = xin.shape[-1]
    k = model.n_contacts
    dtype = xin.dtype

    blk, n_blocks, padded = _block_sizes(block, B)
    lanes = blk // SUBLANES
    p_lanes = padded // SUBLANES
    n_p = pvec.shape[0]

    kernel = functools.partial(
        _fwd_kernel, model=model, dt=dt, eps=eps,
        ipm_iterations=ipm_iterations,
        newton_iterations=newton_iterations)

    loss_arr, force_arr, valid_arr = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, n_p), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, SUBLANES, lanes),
                         lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_x, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, SUBLANES, p_lanes), dtype),
            jax.ShapeDtypeStruct((3, k, SUBLANES, p_lanes), dtype),
            jax.ShapeDtypeStruct((1, SUBLANES, p_lanes), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(pvec.reshape(1, n_p), _tile_pack(_pad_minor(xin, padded)),
      _tile_pack(_pad_minor(xp, padded)))
    return loss_arr.reshape(padded)[:B], force_arr, valid_arr


def _fused_loss_bwd_call(model, dt, eps, block, interpret, pvec, xin, xp,
                         force_arr, valid_arr, ct):
    n_rows = xin.shape[0]
    n_x = xp.shape[0]
    B = xin.shape[-1]
    k = model.n_contacts
    dtype = xin.dtype

    # The saved force/valid residuals are padded to the FORWARD block's
    # multiple; the backward block (kept small — see DEFAULT_BWD_BLOCK)
    # must tile that padding exactly.
    p_lanes = force_arr.shape[-1]
    padded = p_lanes * SUBLANES
    blk = min(min(block, DEFAULT_BWD_BLOCK), padded)
    blk = max(SUBLANES, blk // SUBLANES * SUBLANES)
    while p_lanes % (blk // SUBLANES):
        blk -= SUBLANES
    lanes = blk // SUBLANES
    n_blocks = p_lanes // lanes
    n_p = pvec.shape[0]

    kernel = functools.partial(
        _bwd_kernel, model=model, dt=dt, eps=eps, n_p=n_p)

    # Cotangent padding is ZERO so padded duplicates contribute nothing
    # to the accumulated parameter gradient.
    ct_pad = _tile_pack(
        jnp.zeros((1, padded), dtype).at[0, :B].set(ct))

    dp_arr, dxin_arr, dxp_arr = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, n_p), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, SUBLANES, lanes),
                         lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_x, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_p), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, SUBLANES, lanes),
                         lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_x, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_p), dtype),
            jax.ShapeDtypeStruct((n_rows, SUBLANES, p_lanes), dtype),
            jax.ShapeDtypeStruct((n_x, SUBLANES, p_lanes), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(pvec.reshape(1, n_p), _tile_pack(_pad_minor(xin, padded)),
      _tile_pack(_pad_minor(xp, padded)), force_arr, valid_arr, ct_pad)
    return (dp_arr[0],
            dxin_arr.reshape(n_rows, padded)[:, :B],
            dxp_arr.reshape(n_x, padded)[:, :B])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _fused_loss(model, dt, eps, ipm_iterations, newton_iterations, block,
                interpret, pvec, xin, xp):
    loss, _, _ = _fused_loss_fwd_call(
        model, dt, eps, ipm_iterations, newton_iterations, block,
        interpret, pvec, xin, xp)
    return loss


def _fused_loss_vjp_fwd(model, dt, eps, ipm_iterations, newton_iterations,
                        block, interpret, pvec, xin, xp):
    loss, force_arr, valid_arr = _fused_loss_fwd_call(
        model, dt, eps, ipm_iterations, newton_iterations, block,
        interpret, pvec, xin, xp)
    return loss, (pvec, xin, xp, force_arr, valid_arr)


def _fused_loss_vjp_bwd(model, dt, eps, ipm_iterations, newton_iterations,
                        block, interpret, residuals, ct):
    pvec, xin, xp, force_arr, valid_arr = residuals
    dp, dxin, dxp = _fused_loss_bwd_call(
        model, dt, eps, block, interpret, pvec, xin, xp, force_arr,
        valid_arr, ct)
    return dp, dxin, dxp


_fused_loss.defvjp(_fused_loss_vjp_fwd, _fused_loss_vjp_bwd)


def fused_contactnets_loss_kernel(model, params, x: Array, u: Array,
                                  x_plus: Array, dt: float,
                                  loss_epsilon: float,
                                  ipm_iterations: int,
                                  newton_iterations: int,
                                  block: int = DEFAULT_BLOCK,
                                  interpret: bool = False) -> Array:
    """Single-kernel ContactNets loss ``(B, n_x) -> (B,)`` with in-kernel
    parameter/state gradients (ROADMAP 0b). Numerically matches
    ``soa_terms.soa_contactnets_loss`` (same SoA code inside the kernel).
    Requires ``soa_terms.supports_fused_kernel(model)``."""
    from dair_pll_tpu.multibody.soa_terms import derive_scalar_params
    derived = derive_scalar_params(model, params)
    pvec = pack_derived(model, derived)
    xin = jnp.concatenate([x.T, u.T], axis=0) if model.n_u > 0 else x.T
    return _fused_loss(model, float(dt), float(loss_epsilon),
                       ipm_iterations, newton_iterations, block,
                       interpret, pvec, xin, x_plus.T)


# -- epoch-warm variant ------------------------------------------------------------
def _fused_loss_warm_fwd_call(model, dt, eps, ipm_iterations,
                              newton_iterations, block, interpret, pvec,
                              xin, xp, fprev):
    """Like :func:`_fused_loss_fwd_call` with one extra ``(3, k, B)``
    previous-impulse input feeding the warm-started solve."""
    n_rows = xin.shape[0]
    n_x = xp.shape[0]
    B = xin.shape[-1]
    k = model.n_contacts
    dtype = xin.dtype

    blk, n_blocks, padded = _block_sizes(block, B)
    lanes = blk // SUBLANES
    p_lanes = padded // SUBLANES
    n_p = pvec.shape[0]

    kernel = functools.partial(
        _fwd_kernel_warm, model=model, dt=dt, eps=eps,
        ipm_iterations=ipm_iterations,
        newton_iterations=newton_iterations)

    loss_arr, force_arr, valid_arr = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, n_p), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, SUBLANES, lanes),
                         lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_x, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, SUBLANES, lanes),
                         lambda b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, lanes), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, SUBLANES, p_lanes), dtype),
            jax.ShapeDtypeStruct((3, k, SUBLANES, p_lanes), dtype),
            jax.ShapeDtypeStruct((1, SUBLANES, p_lanes), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(pvec.reshape(1, n_p), _tile_pack(_pad_minor(xin, padded)),
      _tile_pack(_pad_minor(xp, padded)),
      _tile_pack(_pad_minor(fprev, padded)))
    return loss_arr.reshape(padded)[:B], force_arr, valid_arr


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _fused_loss_warm(model, dt, eps, ipm_iterations, newton_iterations,
                     block, interpret, pvec, xin, xp, fprev):
    loss, force_arr, _ = _fused_loss_warm_fwd_call(
        model, dt, eps, ipm_iterations, newton_iterations, block,
        interpret, pvec, xin, xp, fprev)
    return loss, force_arr


def _fused_loss_warm_vjp_fwd(model, dt, eps, ipm_iterations,
                             newton_iterations, block, interpret, pvec,
                             xin, xp, fprev):
    loss, force_arr, valid_arr = _fused_loss_warm_fwd_call(
        model, dt, eps, ipm_iterations, newton_iterations, block,
        interpret, pvec, xin, xp, fprev)
    return (loss, force_arr), (pvec, xin, xp, force_arr, valid_arr)


def _fused_loss_warm_vjp_bwd(model, dt, eps, ipm_iterations,
                             newton_iterations, block, interpret,
                             residuals, cts):
    # The refreshed-impulse output is a detached cache (envelope
    # theorem): its cotangent is discarded and the previous-impulse
    # input gets zeros. The loss backward is IDENTICAL to the cold
    # path — the gradient never flows through the solve, only through
    # terms+assembly at the saved impulse.
    ct, _ct_force = cts
    pvec, xin, xp, force_arr, valid_arr = residuals
    dp, dxin, dxp = _fused_loss_bwd_call(
        model, dt, eps, block, interpret, pvec, xin, xp, force_arr,
        valid_arr, ct)
    dfprev = jnp.zeros((3, model.n_contacts, xin.shape[-1]), xin.dtype)
    return dp, dxin, dxp, dfprev


_fused_loss_warm.defvjp(_fused_loss_warm_vjp_fwd, _fused_loss_warm_vjp_bwd)


def fused_contactnets_loss_kernel_warm(model, params, x: Array,
                                       u: Array, x_plus: Array,
                                       dt: float, loss_epsilon: float,
                                       ipm_iterations: int,
                                       newton_iterations: int,
                                       force_prev: Array,
                                       block: int = DEFAULT_BLOCK,
                                       interpret: bool = False
                                       ) -> Tuple[Array, Array]:
    """Epoch-warm single-kernel ContactNets loss.

    Like :func:`fused_contactnets_loss_kernel`, but the in-kernel
    hybrid solve warm-starts from ``force_prev`` — a ``(3, k, B)``
    stacked cone field of the impulses these SAME samples solved to on
    a previous epoch (zeros == cold samples; the primal-cost selection
    inside ``solve_warm_hybrid_soa`` routes those to the IPM iterate).
    Returns ``(loss (B,), force (3, k, B))`` where ``force`` is the
    refreshed, already-detached impulse cache for the next epoch.
    """
    from dair_pll_tpu.multibody.soa_terms import derive_scalar_params
    derived = derive_scalar_params(model, params)
    pvec = pack_derived(model, derived)
    xin = jnp.concatenate([x.T, u.T], axis=0) if model.n_u > 0 else x.T
    loss, force_arr = _fused_loss_warm(
        model, float(dt), float(loss_epsilon), ipm_iterations,
        newton_iterations, block, interpret, pvec, xin, x_plus.T,
        jax.lax.stop_gradient(force_prev))
    B = x.shape[0]
    k = model.n_contacts
    padded = force_arr.shape[-1] * SUBLANES
    force = jax.lax.stop_gradient(
        force_arr.reshape(3, k, padded)[..., :B])
    return loss, force
