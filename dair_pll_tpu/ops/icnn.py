r"""Homogeneous input-convex neural network (deep support function).

JAX rebuild of the reference's ``deep_support_function.py``
(``/root/reference/dair_pll/deep_support_function.py:125-266``). Represents
a convex shape by its support function

.. math:: f(d) = \max_{s \in S} s \cdot d,

implemented as a positively-homogeneous ICNN: bias-free layers with
non-negative hidden weights and convex monotone LeakyReLU activations.
Support *points* are the input-gradient of the support value; where the
reference hand-writes this backprop (``deep_support_function.py:238-266``)
we simply use ``jax.grad`` — exact, fused by XLA, and correct under vmap.

Network parameters are a plain pytree dict so they slot into
``MultibodyParams.geometry``. Mesh extraction (for export/visualization)
lives in ``dair_pll_tpu.mesh_extraction`` since it is host-side code.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import Array

DEFAULT_NEGATIVE_SLOPE = 0.5


def init_homogeneous_icnn(key: Array, depth: int, width: int,
                          negative_slope: float = DEFAULT_NEGATIVE_SLOPE,
                          scale: float = 1.0, dtype=jnp.float32) -> Dict:
    r"""Initializes ICNN parameters.

    Variance-preserving init mirroring reference
    ``deep_support_function.py:151-187``: hidden weights uniform scaled by
    ``2 sqrt(2 / (1 + slope^2)) / width``, input weights Kaiming-uniform
    (with :math:`1/\sqrt 2` damping past the first layer), output weights
    scaled by the object length scale.

    Args:
        key: PRNG key.
        depth: number of hidden layers ``D``.
        width: hidden width.
        negative_slope: LeakyReLU negative slope (convexity requires
          ``0 <= slope < 1``).
        scale: object length scale in meters.

    Returns:
        Parameter dict with ``input_weights`` (list of ``(3, width)``),
        ``hidden_weights`` (list of ``(width, width)``),
        ``output_weight`` (``(width,)``) and the static ``negative_slope``.
    """
    assert 0.0 <= negative_slope < 1.0
    keys = jax.random.split(key, 2 * depth + 1)

    hidden_weights: List[Array] = []
    scale_hidden = 2.0 * (2.0 / (1 + negative_slope**2))**0.5 / width
    for layer in range(depth - 1):
        w = jax.random.uniform(
            keys[layer], (width, width), dtype=dtype, minval=-1.0,
            maxval=1.0) * scale_hidden
        hidden_weights.append(w)

    input_weights: List[Array] = []
    # Kaiming-uniform bound for fan_in = 3: sqrt(6 / fan_in).
    bound = (6.0 / 3.0)**0.5
    for layer in range(depth):
        w = jax.random.uniform(
            keys[depth + layer], (3, width), dtype=dtype, minval=-bound,
            maxval=bound)
        if layer > 0:
            w = w * 2**(-0.5)
        input_weights.append(w)

    scale_out = scale * 2.0 * (2.0 / (width * (1 + negative_slope**2)))**0.5
    output_weight = jax.random.uniform(
        keys[-1], (width,), dtype=dtype, minval=-1.0, maxval=1.0) * scale_out

    # negative_slope is static (not learnable) and lives in the geometry
    # spec; only weights appear in the parameter pytree.
    return {
        "input_weights": input_weights,
        "hidden_weights": hidden_weights,
        "output_weight": output_weight,
    }


def icnn_value(params: Dict, direction: Array,
               negative_slope: float = DEFAULT_NEGATIVE_SLOPE) -> Array:
    r"""Support function value ``f(d)`` for a single direction.

    Hidden and output weights enter through their absolute value so the
    network stays convex for any parameter value (reference
    ``deep_support_function.py:189-194``).

    Args:
        params: parameter dict from :func:`init_homogeneous_icnn`.
        direction: ``(3,)`` input direction.

    Returns:
        scalar support value.
    """
    slope = negative_slope

    def act(x):
        return jnp.where(x >= 0, x, slope * x)

    input_weights = params["input_weights"]
    hidden = act(direction @ input_weights[0])
    for w_hidden, w_input in zip(params["hidden_weights"],
                                 input_weights[1:]):
        hidden = act(hidden @ jnp.abs(w_hidden) + direction @ w_input)
    return jnp.dot(hidden, jnp.abs(params["output_weight"]))


def icnn_support_point(params: Dict, direction: Array,
                       negative_slope: float = DEFAULT_NEGATIVE_SLOPE
                       ) -> Array:
    r"""Support point (argmax witness) for a direction: the input gradient
    :math:`\partial_d f(d)` of the support value.

    Args:
        params: ICNN parameter dict.
        direction: ``(3,)`` unit direction.

    Returns:
        ``(3,)`` support point on the shape boundary.
    """
    return jax.grad(icnn_value, argnums=1)(params, direction,
                                           negative_slope)
