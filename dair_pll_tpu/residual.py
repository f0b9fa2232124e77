r"""Residual physics: structured contact dynamics + learned correction.

Composes the structured :class:`MultibodyLearnableSystem` (Anitescu
contact dynamics with learnable inertia/friction/geometry) with a small
MLP residual on the next-step velocity:

.. math::
    v^+ = v^+_{\text{structured}}(\theta, x) +
          s \cdot \mathrm{MLP}_\phi(\bar x)

Both parameter sets train jointly on the prediction loss. This is the
experiment binding the round-1 ROADMAP called for (item 12): the
structured model captures contact (which black-box nets provably fail to
roll out, see ``results/README.md`` baselines), while the residual mops
up unmodeled effects (air drag, asymmetric restitution) — the
"physics-plus-residual" program the reference's discussion of deep
models motivates (reference ``deep_learnable_system.py`` provides the
black-box half; no residual composition exists there).

Gradients flow into the structured parameters through the contact
solve's IFT custom VJP and into the residual through ordinary autodiff;
the residual output is scaled by ``residual_scale`` so training starts
at (approximately) the structured model.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.deep_learnable import _apply_mlp, _init_mlp
from dair_pll_tpu.integrator import Integrator
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.system import System, SystemSummary


@dataclasses.dataclass
class ResidualPhysicsConfig:
    """Configuration of the residual head.

    Attributes:
        layers/hidden_size/nonlinearity: MLP shape.
        residual_scale: output scale (start near the structured model).
    """
    layers: int = 2
    hidden_size: int = 64
    nonlinearity: str = "tanh"
    residual_scale: float = 0.1


class ResidualPhysicsSystem(System):
    """Structured multibody system with an additive learned velocity
    residual."""

    def __init__(self, structured: MultibodyLearnableSystem,
                 config: ResidualPhysicsConfig, key: Array,
                 training_data: Optional[Array] = None,
                 dtype=jnp.float32) -> None:
        self.structured = structured
        self.config = config
        space = structured.space
        integrator = Integrator(space, self._partial_step,
                                structured.dt, "velocity")
        super().__init__(space, integrator)
        self._init_params = self._build_params(key, training_data, dtype)

    def _build_params(self, key, training_data, dtype) -> Dict[str, Any]:
        space = self.space
        n_x = space.n_x
        if training_data is not None:
            flat = np.asarray(training_data).reshape(-1, n_x)
            mean = jnp.asarray(flat.mean(axis=0), dtype)
            std = jnp.asarray(flat.std(axis=0) + 1e-8, dtype)
        else:
            mean = jnp.zeros((n_x,), dtype)
            std = jnp.ones((n_x,), dtype)
        net = _init_mlp(key, n_x, self.config.hidden_size, space.n_v,
                        self.config.layers, dtype)
        return {
            "structured": self.structured.model.initial_params(dtype),
            "residual": {"net": net, "mean": mean, "std": std},
        }

    def initial_params(self) -> Dict[str, Any]:
        return self._init_params

    def residual_velocity(self, params: Dict[str, Any],
                          x: Array) -> Array:
        """The learned velocity correction for one state."""
        res = params["residual"]
        x_n = (x - res["mean"]) / res["std"]
        return self.config.residual_scale * _apply_mlp(
            res["net"], x_n, self.config.nonlinearity)

    def _partial_step(self, params: Dict[str, Any], x: Array,
                      carry: Any) -> Tuple[Array, Any]:
        q, v = self.space.q_v(x)
        u = jnp.zeros((self.structured.model.n_u,), x.dtype)
        v_plus = self.structured.forward_dynamics(
            params["structured"], q, v, u)
        return v_plus + self.residual_velocity(params, x), carry

    def summary(self, params: Dict[str, Any],
                statistics: Dict) -> SystemSummary:
        """Physical parameters of the structured half plus the residual
        magnitude."""
        summary = self.structured.summary(params["structured"], statistics)
        norms = [float(jnp.linalg.norm(m))
                 for m in jax.tree_util.tree_leaves(
                     params["residual"]["net"])]
        summary.scalars["residual_weight_norm"] = float(np.sum(norms))
        return summary


class ResidualPhysicsExperiment:
    """Mixin providing a residual-physics ``get_learned_system``; compose
    with ``SupervisedLearningExperiment`` subclasses the same way
    ``DeepLearnableExperiment`` does. Trains with the prediction loss
    (the default ``loss_callback``)."""

    def get_learned_system(self):
        config = self.config.learnable_config
        assert isinstance(config, ResidualPhysicsLearnableConfig)
        from dair_pll_tpu.urdf import build_multibody_model
        model = build_multibody_model(
            dict(config.urdfs),
            mesh_representation=config.mesh_representation)
        structured = MultibodyLearnableSystem(model, self.config.
                                              data_config.dt)
        train_states = getattr(self, "train_states", None)
        system = ResidualPhysicsSystem(
            structured, config.residual, jax.random.PRNGKey(0),
            train_states)
        return system, system.initial_params()


@dataclasses.dataclass
class ResidualPhysicsLearnableConfig:
    """Learnable-config payload for residual-physics experiments."""
    urdfs: Dict[str, str] = dataclasses.field(default_factory=dict)
    mesh_representation: str = "polygon"
    residual: ResidualPhysicsConfig = dataclasses.field(
        default_factory=ResidualPhysicsConfig)
