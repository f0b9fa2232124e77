r"""Dynamical-system abstraction over state spaces.

Functional JAX counterpart of the reference's ``system.py``
(``/root/reference/dair_pll/system.py``). A :class:`System` bundles a state
space, an :class:`~dair_pll_tpu.integrator.Integrator`, and a parameter
pytree; simulation is fully batched with ``vmap`` — the reference's
``max_batch_dim`` serialization loop (``system.py:113-129``) has no TPU
analog and is gone.

``SystemSummary`` (scalars / videos / meshes for logging) mirrors reference
``system.py:29-44``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.integrator import Integrator
from dair_pll_tpu.state_space import StateSpace, StateSpaceSampler


@dataclasses.dataclass
class MeshSummary:
    """Triangle mesh for visualization (reference ``system.py:29-36``)."""
    vertices: np.ndarray
    faces: np.ndarray


@dataclasses.dataclass
class SystemSummary:
    """Per-evaluation logging payload (reference ``system.py:38-44``)."""
    scalars: Dict[str, float]
    videos: Dict[str, Tuple[np.ndarray, int]]
    meshes: Dict[str, MeshSummary]


class System:
    """Base dynamical system: a state space + integrator + parameters.

    Subclasses provide ``partial_step`` (via the integrator) and may
    override :meth:`preprocess_initial_condition` (e.g. recurrent systems
    warm up their hidden state over the history window — reference
    ``system.py:147-173``).
    """

    space: StateSpace
    integrator: Integrator

    #: True for systems whose stepping is stateful host code (e.g. the
    #: MuJoCo oracle) — evaluation then uses sequential host rollouts
    #: instead of jit/vmap (the reference's ``max_batch_dim = 0`` systems,
    #: ``system.py:113-124``).
    host_stepped: bool = False

    def __init__(self, space: StateSpace, integrator: Integrator) -> None:
        self.space = space
        self.integrator = integrator

    # -- carry -----------------------------------------------------------
    def initial_carry(self, x_0: Array) -> Any:
        """Default hidden state: an empty array pytree."""
        return jnp.zeros((0,), dtype=x_0.dtype)

    def preprocess_initial_condition(self, params: Any, x_history: Array,
                                     carry: Any) -> Tuple[Array, Any]:
        """Maps an initial-condition history ``(T_history, n_x)`` to the
        starting state and carry. Default: take the last state."""
        return x_history[-1], carry

    # -- simulation --------------------------------------------------------
    def simulate(self, params: Any, x_0: Array, steps: int,
                 carry_0: Optional[Any] = None,
                 remat: bool = False) -> Array:
        """Unbatched rollout returning ``(steps + 1, n_x)``.

        Pass ``remat=True`` when differentiating long rollouts (gradient
        checkpointing per step)."""
        if carry_0 is None:
            carry_0 = self.initial_carry(x_0)
        trajectory, _ = self.integrator.simulate(params, x_0, carry_0,
                                                 steps, remat=remat)
        return trajectory

    def simulate_batch(self, params: Any, x_0: Array, steps: int) -> Array:
        """Batched rollout: ``(*, n_x) -> (*, steps + 1, n_x)``.

        Arbitrary leading batch dims are flattened, vmapped, and restored —
        replacing the reference's ``max_batch_dim`` Python loop fallback
        (``system.py:113-124``) with device-wide parallelism.
        """
        batch_shape = x_0.shape[:-1]
        flat = x_0.reshape((-1, x_0.shape[-1]))
        rollout = jax.vmap(
            lambda x: self.simulate(params, x, steps))(flat)
        return rollout.reshape(batch_shape + rollout.shape[1:])

    def sample_initial_condition(self, sampler: StateSpaceSampler,
                                 key: Array, dtype=jnp.float32) -> Array:
        """Draws one initial state from a sampler."""
        return sampler.get_sample(key, dtype)

    # -- logging -----------------------------------------------------------
    def summary(self, params: Any, statistics: Dict) -> SystemSummary:
        """Evaluation summary; default is empty."""
        del params, statistics
        return SystemSummary(scalars={}, videos={}, meshes={})
