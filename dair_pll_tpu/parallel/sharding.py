r"""Device meshes and data-parallel training steps.

The reference is single-process CPU with no parallelism (its only
batch-scaling mechanism is a Python serialization loop,
``/root/reference/dair_pll/system.py:113-124``). The TPU-native analog is
SPMD over a :class:`jax.sharding.Mesh`:

* trajectory/transition batches shard over the ``"dp"`` mesh axis,
* parameters replicate,
* gradients all-reduce over ICI via ``psum`` inside ``shard_map``.

Contact problems here are small and embarrassingly batch-parallel, so data
parallelism is the right (and complete) decomposition — the analog of
tensor/pipeline axes has no counterpart at n_v <= 8. Multi-host scale-out
composes with ``jax.distributed.initialize`` +
``jax.make_array_from_process_local_data``; study-level sweeps stay
embarrassingly parallel across slices (DCN), mirroring the reference's
optuna-server design (``study.py:134-148``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

import inspect

# jax renamed check_rep -> check_vma (~0.9) and may drop it entirely;
# pass whichever replication-check flag this jax accepts, disabled (the
# rollout/step bodies use psum, which trips the conservative checker).
_SHARD_MAP_CHECK_KEY = None
for _key in ("check_rep", "check_vma"):
    if _key in inspect.signature(_shard_map).parameters:
        _SHARD_MAP_CHECK_KEY = _key
        break


def shard_map(f, **kwargs):
    if _SHARD_MAP_CHECK_KEY is not None:
        kwargs.setdefault(_SHARD_MAP_CHECK_KEY, False)
    return _shard_map(f, **kwargs)

DATA_AXIS = "dp"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """Builds a 1-D data-parallel mesh over the given (default: all)
    devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Places a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Shards a batch pytree along its leading dim over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def make_data_parallel_step(
        loss_fn: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
        optimizer: optax.GradientTransformation, mesh: Mesh,
        axis_name: str = DATA_AXIS) -> Callable:
    """Builds a jitted SPMD training step.

    Args:
        loss_fn: ``(params, x_past, x_future) -> (local_batch,)``
          per-sample loss.
        optimizer: optax transformation.
        mesh: data-parallel mesh.
        axis_name: mesh axis to shard batches over.

    Returns:
        ``step(params, opt_state, x_past, x_future) -> (params, opt_state,
        loss)`` with params/opt_state replicated and batches sharded on
        their leading axis; gradients are ``psum``-reduced over ICI.
    """

    def local_step(params, opt_state, x_past, x_future):
        def mean_loss(p):
            return jnp.mean(loss_fn(p, x_past, x_future))

        loss, grads = jax.value_and_grad(mean_loss)(params)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        )
    return jax.jit(sharded)


def make_data_parallel_rollout(simulate_fn: Callable, mesh: Mesh,
                               axis_name: str = DATA_AXIS) -> Callable:
    """Builds a jitted SPMD batched rollout.

    Args:
        simulate_fn: ``(params, x_0_batch) -> (batch, T, n_x)`` local
          batched rollout.
        mesh: data-parallel mesh.

    Returns:
        ``rollout(params, x_0)`` with ``x_0`` sharded on its leading axis.
    """
    sharded = shard_map(
        simulate_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        )
    return jax.jit(sharded)
