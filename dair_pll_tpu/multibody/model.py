r"""Static multibody model description.

Replaces the reference's Drake-backed plant construction
(``/root/reference/dair_pll/drake_utils.py:248-335`` and the symbolic term
extraction of ``multibody_terms.py:104-319``) with a self-contained,
JAX-friendly description: a :class:`MultibodyModel` is *static metadata*
(plain numpy, Python ints/strings) describing the kinematic tree, collision
geometries, and initial parameter values. All runtime dynamics evaluate pure
functions of ``(model, params, state)`` where ``params`` is a JAX pytree
(:class:`MultibodyParams`).

Conventions:

* Bodies are indexed topologically; each non-root body has one inboard
  joint. ``parent == -1`` denotes the world.
* Joint types: ``"free"`` (6-DoF floating base), ``"revolute"`` (1-DoF,
  URDF ``continuous``/``revolute``), ``"fixed"``/``"weld"``.
* State layout per URDF model matches the reference's
  :class:`FloatingBaseSpace` (``state_space.py:402-424``): configuration
  ``[quat(4, wxyz), world position(3), joint angles]``; velocity
  ``[body-frame angular velocity(3), world linear velocity(3), rates]``.
  Multiple models concatenate into a :class:`ProductSpace`.
* A ground half-space ``z = 0`` with friction 1.0 is always present,
  mirroring reference ``drake_utils.py:280-288``.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from dair_pll_tpu import inertia as inertia_mod
from dair_pll_tpu import state_space as space_mod
from dair_pll_tpu.geometry import (CollisionGeometrySpec,
                                   default_geometry_params)

GROUND_FRICTION = 1.0
GRAVITY = 9.81


@dataclasses.dataclass(frozen=True)
class JointSpec:
    """Inboard joint of a body.

    Attributes:
        joint_type: "free", "revolute", or "fixed".
        parent: parent body index (-1 = world).
        R_PJ: (3, 3) rotation of the joint frame in the parent body frame.
        p_PJ: (3,) joint frame origin in the parent body frame.
        axis: (3,) revolute axis in the joint (= child) frame.
        name: joint name (URDF).
        actuated: whether a URDF <transmission> drives this joint.
    """
    joint_type: str
    parent: int
    R_PJ: Tuple[Tuple[float, ...], ...]
    p_PJ: Tuple[float, ...]
    axis: Tuple[float, ...]
    name: str
    actuated: bool = False


@dataclasses.dataclass(frozen=True)
class BodySpec:
    """Rigid body with its inboard joint and initial inertial parameters.

    ``pi_cm_init`` is the 10-vector ``[m, m*p_com, I_cm(6)]`` (see
    ``dair_pll_tpu.inertia``).
    """
    name: str
    model_index: int
    joint: JointSpec
    pi_cm_init: Tuple[float, ...]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """One URDF model: its name and body index range in the global list."""
    name: str
    body_indices: Tuple[int, ...]
    floating: bool
    n_joints: int


@dataclasses.dataclass(frozen=True)
class MultibodyModel:
    """Complete static description of a multibody scene.

    Attributes:
        models: per-URDF model specs.
        bodies: all bodies, topologically ordered (parents precede children).
        geometries: all collision geometries; index 0 is always the ground
          plane attached to the world.
        collision_candidates: (a, b) geometry index pairs, ordered so the
          type ordering ``Plane < Polygon < Box < Sphere <
          DeepSupportConvex`` places ``a`` first (reference
          ``geometry.py:46,536``).
        n_q, n_v, n_u: configuration/velocity/actuation dimensions.
        contacts_per_pair: number of contact points per candidate pair.
        urdf_paths: original URDF paths by model name (for re-export).
    """
    models: Tuple[ModelSpec, ...]
    bodies: Tuple[BodySpec, ...]
    geometries: Tuple[CollisionGeometrySpec, ...]
    collision_candidates: Tuple[Tuple[int, int], ...]
    n_q: int
    n_v: int
    n_u: int
    contacts_per_pair: Tuple[int, ...]
    urdf_paths: Tuple[Tuple[str, str], ...] = ()

    # -- derived static layout ------------------------------------------------
    @property
    def n_bodies(self) -> int:
        return len(self.bodies)

    @property
    def n_contacts(self) -> int:
        """Total (static) number of contact points."""
        return sum(self.contacts_per_pair)

    def body_q_offset(self, body_index: int) -> int:
        """Configuration offset of the body's joint coordinates."""
        return self._layout()[0][body_index]

    def body_v_offset(self, body_index: int) -> int:
        """Velocity offset of the body's joint coordinates."""
        return self._layout()[1][body_index]

    def _layout(self):
        """Per-body (q_offset, v_offset); cached on first use."""
        if not hasattr(self, "_layout_cache"):
            q_offsets, v_offsets = [], []
            q_off = v_off = 0
            for body in self.bodies:
                q_offsets.append(q_off)
                v_offsets.append(v_off)
                if body.joint.joint_type == "free":
                    q_off += 7
                    v_off += 6
                elif body.joint.joint_type in ("revolute", "prismatic"):
                    q_off += 1
                    v_off += 1
            object.__setattr__(self, "_layout_cache", (q_offsets, v_offsets))
        return self._layout_cache

    def state_space(self) -> space_mod.StateSpace:
        """Builds the reference-layout state space for this model (a
        :class:`ProductSpace` over per-URDF Floating/Fixed base spaces,
        mirroring ``drake_utils.py:309-335``)."""
        spaces: List[space_mod.StateSpace] = []
        for model in self.models:
            if model.floating:
                spaces.append(space_mod.FloatingBaseSpace(model.n_joints))
            else:
                spaces.append(space_mod.FixedBaseSpace(model.n_joints))
        if len(spaces) == 1:
            return spaces[0]
        return space_mod.ProductSpace(spaces)

    # -- parameter initialization ---------------------------------------------
    def initial_params(self, dtype=jnp.float32) -> "MultibodyParams":
        """Initial learnable parameters from the URDF values."""
        pi_cm = np.stack([np.asarray(b.pi_cm_init) for b in self.bodies])
        theta = inertia_mod.pi_cm_to_theta(jnp.asarray(pi_cm, dtype))
        friction = np.array([g.mu for g in self.geometries], dtype=np.float64)
        geometry = tuple(
            default_geometry_params(g, dtype) for g in self.geometries)
        return MultibodyParams(
            theta=jnp.asarray(theta, dtype),
            friction=jnp.asarray(friction, dtype),
            geometry=geometry,
        )

    def __hash__(self):
        return hash((self.models, self.bodies, self.geometries,
                     self.collision_candidates))


@dataclasses.dataclass
class MultibodyParams:
    """Learnable parameter pytree.

    Attributes:
        theta: ``(n_bodies, 10)`` unconstrained inertial parameters
          (Rucker-Wensing; see ``dair_pll_tpu.inertia``).
        friction: ``(n_geometries,)`` friction parameters; the coefficient
          in use is ``|friction|`` (reference ``multibody_terms.py:321-324``).
        geometry: per-geometry parameter pytrees (see
          ``dair_pll_tpu.geometry``); ``None`` for parameter-free shapes.
    """
    theta: jnp.ndarray
    friction: jnp.ndarray
    geometry: Tuple

    def friction_coefficients(self) -> jnp.ndarray:
        """Non-negative friction coefficients."""
        return jnp.abs(self.friction)

    def pi_cm(self) -> jnp.ndarray:
        """Inertial parameters in ``pi_cm`` format, ``(n_bodies, 10)``."""
        return inertia_mod.theta_to_pi_cm(self.theta)


def register_params_pytree():
    """Registers :class:`MultibodyParams` as a JAX pytree node."""
    import jax.tree_util as jtu

    def flatten(p):
        return (p.theta, p.friction, p.geometry), None

    def unflatten(aux, children):
        del aux
        return MultibodyParams(*children)

    try:
        jtu.register_pytree_node(MultibodyParams, flatten, unflatten)
    except ValueError:
        pass  # already registered


register_params_pytree()
