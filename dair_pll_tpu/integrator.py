r"""Trajectory integrators as ``lax.scan`` rollouts.

Functional JAX counterpart of the reference's ``integrator.py``
(``/root/reference/dair_pll/integrator.py``). The reference's Python
``for``-loop over time (``integrator.py:95-98``) becomes a single
``jax.lax.scan`` — one compiled XLA while-loop per rollout, batched over
trajectories with ``vmap``.

An :class:`Integrator` pairs a state space with a *partial step* callback
``(params, x, carry) -> (out, carry)`` whose output is interpreted per the
integrator kind (the reference's six ``Integrator`` subclasses,
``integrator.py:123-227``):

=====================  ====================================================
kind                   meaning of ``out``
=====================  ====================================================
``state``              next state (projected onto the space)
``delta_state``        Lie-algebra state perturbation ``(2 n_v,)``
``velocity``           next velocity; configuration by geodesic Euler step
``delta_velocity``     velocity increment
``configuration``      next configuration; velocity by finite difference
``delta_configuration``configuration perturbation; velocity = dq / dt
=====================  ====================================================
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.state_space import StateSpace

PartialStepCallback = Callable[[Any, Array, Any], Tuple[Array, Any]]

INTEGRATOR_KINDS = (
    "state", "delta_state", "velocity", "delta_velocity",
    "configuration", "delta_configuration")


class Integrator:
    """Steps a state forward using a partial-step callback.

    Attributes:
        space: state space of the integrated system.
        partial_step: ``(params, x, carry) -> (out, carry)`` unbatched.
        dt: time step in seconds.
        kind: one of :data:`INTEGRATOR_KINDS`.
    """

    def __init__(self, space: StateSpace, partial_step: PartialStepCallback,
                 dt: float, kind: str) -> None:
        assert kind in INTEGRATOR_KINDS, kind
        self.space = space
        self.partial_step = partial_step
        self.dt = dt
        self.kind = kind

    def out_size(self) -> int:
        """Final dimension of the partial step output (reference
        ``integrator.py:117-121`` and per-subclass overrides)."""
        space = self.space
        return {
            "state": space.n_x,
            "delta_state": 2 * space.n_v,
            "velocity": space.n_v,
            "delta_velocity": space.n_v,
            "configuration": space.n_q,
            "delta_configuration": space.n_v,
        }[self.kind]

    def step(self, params: Any, x: Array, carry: Any
             ) -> Tuple[Array, Any]:
        """Single unbatched time step."""
        space = self.space
        dt = self.dt
        out, carry = self.partial_step(params, x, carry)
        if self.kind == "state":
            x_next = space.project_state(out)
        elif self.kind == "delta_state":
            x_next = space.shift_state(x, out)
        elif self.kind == "velocity":
            q_next = space.euler_step(space.q(x), out, dt)
            x_next = space.x(q_next, out)
        elif self.kind == "delta_velocity":
            v_next = space.v(x) + out
            q_next = space.euler_step(space.q(x), v_next, dt)
            x_next = space.x(q_next, v_next)
        elif self.kind == "configuration":
            q = space.q(x)
            q_next = space.project_configuration(out)
            v_next = space.finite_difference(q, q_next, dt)
            x_next = space.x(q_next, v_next)
        elif self.kind == "delta_configuration":
            q = space.q(x)
            q_next = space.exponential(q, out)
            v_next = out / dt
            x_next = space.x(q_next, v_next)
        else:
            raise ValueError(self.kind)
        return x_next, carry

    def simulate(self, params: Any, x_0: Array, carry_0: Any,
                 steps: int, remat: bool = False) -> Tuple[Array, Any]:
        """Unbatched rollout via ``lax.scan``.

        Args:
            params: system parameter pytree (closed over statically-shaped).
            x_0: ``(n_x,)`` initial state.
            carry_0: initial hidden-state pytree.
            steps: number of steps (static).
            remat: rematerialize each step under differentiation
              (``jax.checkpoint``), trading recompute for O(1)-per-step
              memory on long-horizon gradient rollouts — the TPU analog of
              sequence-length scaling for this workload (SURVEY.md §5).

        Returns:
            ``(steps + 1, n_x)`` trajectory (including ``x_0``) and the
            stacked carry trajectory.
        """

        def scan_step(state, _):
            x, carry = state
            x_next, carry_next = self.step(params, x, carry)
            return (x_next, carry_next), (x_next, carry_next)

        if remat:
            scan_step = jax.checkpoint(scan_step)

        (_, _), (xs, carries) = jax.lax.scan(
            scan_step, (x_0, carry_0), None, length=steps)
        trajectory = jnp.concatenate((x_0[None], xs), axis=0)
        carry_traj = jax.tree_util.tree_map(
            lambda c0, cs: jnp.concatenate((c0[None], cs), axis=0),
            carry_0, carries)
        return trajectory, carry_traj
