r"""Black-box deep learnable dynamics baselines (MLP / GRU).

Rebuild of the reference's ``deep_learnable_model.py`` /
``deep_learnable_system.py``
(``/root/reference/dair_pll/deep_learnable_model.py:8-107``,
``deep_learnable_system.py:16-67``): learned dynamics as either an MLP on
the (normalized) current state or an encoder-GRU-decoder over the state
history, driving any integrator kind. Parameters are plain pytree dicts
(consistent with the rest of the framework); rollouts ride the shared
``lax.scan`` integrator.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.integrator import Integrator
from dair_pll_tpu.system import System


def _init_linear(key, in_size, out_size, dtype):
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_size)
    return {
        "w": jax.random.uniform(k_w, (in_size, out_size), dtype,
                                -bound, bound),
        "b": jax.random.uniform(k_b, (out_size,), dtype, -bound, bound),
    }


def _apply_linear(params, x):
    return x @ params["w"] + params["b"]


def _init_mlp(key, in_size, hidden, out_size, layers, dtype):
    """MLP params: ``layers`` hidden layers (reference ``_mlp``,
    ``deep_learnable_model.py:64-75``)."""
    if layers == 0:
        return [_init_linear(key, in_size, out_size, dtype)]
    keys = jax.random.split(key, layers + 1)
    mats = [_init_linear(keys[0], in_size, hidden, dtype)]
    for i in range(layers - 1):
        mats.append(_init_linear(keys[i + 1], hidden, hidden, dtype))
    mats.append(_init_linear(keys[-1], hidden, out_size, dtype))
    return mats


def _apply_mlp(mats, x, nonlinearity):
    act = {"relu": jax.nn.relu, "tanh": jnp.tanh,
           "elu": jax.nn.elu}[nonlinearity]
    for layer in mats[:-1]:
        x = act(_apply_linear(layer, x))
    return _apply_linear(mats[-1], x)


def _init_gru(key, in_size, hidden, dtype):
    k_i, k_h, k_b = jax.random.split(key, 3)
    bound = 1.0 / np.sqrt(hidden)
    return {
        "w_i": jax.random.uniform(k_i, (in_size, 3 * hidden), dtype,
                                  -bound, bound),
        "w_h": jax.random.uniform(k_h, (hidden, 3 * hidden), dtype,
                                  -bound, bound),
        "b": jax.random.uniform(k_b, (3 * hidden,), dtype, -bound, bound),
    }


def _apply_gru(params, x, h):
    """Standard GRU cell; ``h`` is the hidden state."""
    hidden = h.shape[-1]
    gates_x = x @ params["w_i"] + params["b"]
    gates_h = h @ params["w_h"]
    r = jax.nn.sigmoid(gates_x[..., :hidden] + gates_h[..., :hidden])
    z = jax.nn.sigmoid(gates_x[..., hidden:2 * hidden] +
                       gates_h[..., hidden:2 * hidden])
    n = jnp.tanh(gates_x[..., 2 * hidden:] + r * gates_h[..., 2 * hidden:])
    return (1.0 - z) * n + z * h


@dataclasses.dataclass
class DeepLearnableSystemConfig:
    """Configuration (reference ``deep_learnable_system.py:16-22``).

    Attributes:
        integrator_kind: interpretation of model output (see
          ``dair_pll_tpu.integrator``).
        layers: MLP depth.
        nonlinearity: "relu" / "tanh" / "elu".
        hidden_size: hidden width (also GRU state size).
        model_kind: "mlp", "recurrent", or "zero".
    """
    integrator_kind: str = "velocity"
    layers: int = 1
    nonlinearity: str = "relu"
    hidden_size: int = 128
    model_kind: str = "recurrent"


class DeepLearnableSystem(System):
    """Black-box learned dynamics over a base system's state space.

    The ``params`` pytree holds the network weights plus the (fixed)
    normalization constants (reference
    ``deep_learnable_model.py:21-28``).
    """

    def __init__(self, base_system: System,
                 config: DeepLearnableSystemConfig,
                 key: Array,
                 training_data: Optional[Array] = None,
                 dtype=jnp.float32) -> None:
        self.config = config
        space = base_system.space
        integrator = Integrator(space, self._partial_step,
                                base_system.integrator.dt,
                                config.integrator_kind)
        super().__init__(space, integrator)
        self.out_size = integrator.out_size()
        self._init_params = self._build_params(key, training_data, dtype)

    def _build_params(self, key, training_data, dtype) -> Dict:
        config = self.config
        space = self.space
        n_x = space.n_x
        hidden = config.hidden_size
        params: Dict[str, Any] = {}
        if training_data is not None:
            flat = np.asarray(training_data).reshape(-1, n_x)
            params["mean"] = jnp.asarray(flat.mean(axis=0), dtype)
            params["std"] = jnp.asarray(flat.std(axis=0) + 1e-8, dtype)
        else:
            params["mean"] = jnp.zeros((n_x,), dtype)
            params["std"] = jnp.ones((n_x,), dtype)

        k_enc, k_gru, k_dec, k_mlp = jax.random.split(key, 4)
        if config.model_kind == "recurrent":
            params["encoder"] = _init_mlp(
                k_enc, n_x, hidden, hidden, config.layers // 2, dtype)
            params["gru"] = _init_gru(k_gru, hidden, hidden, dtype)
            params["decoder"] = _init_mlp(
                k_dec, hidden, hidden, self.out_size,
                config.layers - config.layers // 2, dtype)
        elif config.model_kind == "mlp":
            params["net"] = _init_mlp(
                k_mlp, n_x, hidden, self.out_size, config.layers, dtype)
        elif config.model_kind == "zero":
            params["dummy"] = jnp.ones((), dtype)
        else:
            raise ValueError(config.model_kind)
        return params

    def initial_params(self) -> Dict:
        return self._init_params

    # -- carry -------------------------------------------------------------
    def initial_carry(self, x_0: Array) -> Array:
        return jnp.zeros((self.config.hidden_size,), x_0.dtype)

    def _normalize(self, params, x):
        return (x - params["mean"]) / params["std"]

    def _partial_step(self, params: Dict, x: Array,
                      carry: Array) -> Tuple[Array, Array]:
        config = self.config
        x_n = self._normalize(params, x)
        if config.model_kind == "recurrent":
            encoded = _apply_mlp(params["encoder"], x_n,
                                 config.nonlinearity)
            carry = _apply_gru(params["gru"], encoded, carry)
            out = _apply_mlp(params["decoder"], carry, config.nonlinearity)
            return out, carry
        if config.model_kind == "mlp":
            return _apply_mlp(params["net"], x_n,
                              config.nonlinearity), carry
        # zero model
        return params["dummy"] * jnp.zeros((self.out_size,), x.dtype), carry

    def preprocess_initial_condition(self, params: Dict, x_history: Array,
                                     carry: Any) -> Tuple[Array, Any]:
        """Recurrent warm-up over the history window (reference
        ``deep_learnable_system.py:49-58``)."""
        if self.config.model_kind != "recurrent" or \
                x_history.shape[0] <= 1:
            return x_history[-1], carry

        def scan_step(h, x_t):
            _, h = self._partial_step(params, x_t, h)
            return h, None

        carry, _ = jax.lax.scan(scan_step, carry, x_history[:-1])
        return x_history[-1], carry


class DeepLearnableExperiment:
    """Mixin providing a deep-learnable ``get_learned_system`` (reference
    ``deep_learnable_system.py:61-67``); compose with
    ``SupervisedLearningExperiment`` subclasses."""

    def get_learned_system(self):
        config = self.config.learnable_config
        assert isinstance(config, DeepLearnableSystemConfig)
        base_system, _ = self.get_base_system()
        train_states = getattr(self, "train_states", None)
        system = DeepLearnableSystem(
            base_system, config, jax.random.PRNGKey(0), train_states)
        return system, system.initial_params()
