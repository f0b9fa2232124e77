r"""Lie group/algebra state spaces, TPU-native.

JAX rebuild of the reference's ``state_space.py``
(``/root/reference/dair_pll/state_space.py``). Each state space models
configurations on a Lie group :math:`G` (e.g. :math:`SE(3)\times\mathbb R^m`)
and velocities on its algebra :math:`\mathfrak g`.

Design differences from the reference:

* Space objects are immutable, hashable static metadata — safe to close over
  under ``jax.jit`` and to pass as static args.
* All operations are pure functions of arrays, broadcast over arbitrary
  leading batch dims, and jit/vmap/grad-safe.
* Randomness (noisers/samplers, reference ``state_space.py:750-955``) takes
  explicit ``jax.random`` PRNG keys instead of global torch RNG state.

Batching convention matches the reference (``state_space.py:15-17``): the
state index is the last dim; time, when present, is second-to-last.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from dair_pll_tpu.ops import quaternion

N_QUAT = 4
N_ANG_VEL = 3
N_COM = 3

ComparisonCallable = Callable[[Array, Array], Array]


class StateSpace:
    r"""Mathematical model of a state space :math:`G \times \mathfrak g`.

    Concrete subclasses implement the four primitive operations
    (:meth:`configuration_difference`, :meth:`exponential`,
    :meth:`project_configuration`, :meth:`zero_state`); the rest are derived.
    Mirrors reference ``state_space.py:55-399``.
    """

    n_q: int
    n_v: int
    n_x: int

    def __init__(self, n_q: int, n_v: int) -> None:
        assert n_q >= 0 and n_v >= 0
        self.n_q = n_q
        self.n_v = n_v
        self.n_x = n_q + n_v

    # -- primitives ---------------------------------------------------------
    def configuration_difference(self, q_1: Array, q_2: Array) -> Array:
        r"""Returns ``dq = log(q_1^{-1} * q_2)`` such that
        ``q_1 * exp(dq) = q_2``. Shape ``(*, n_q) x (*, n_q) -> (*, n_v)``."""
        raise NotImplementedError

    def exponential(self, q: Array, dq: Array) -> Array:
        """Returns ``q * exp(dq)``. Shape ``(*, n_q) x (*, n_v) -> (*, n_q)``."""
        raise NotImplementedError

    def project_configuration(self, q: Array) -> Array:
        """Projects ``(*, n_q)`` onto the group G (e.g. quaternion renorm)."""
        raise NotImplementedError

    def zero_state(self, dtype=jnp.float32) -> Array:
        """Identity element of G x g as an ``(n_x,)`` array."""
        raise NotImplementedError

    def auxiliary_comparisons(self) -> Dict[str, ComparisonCallable]:
        """Extra named state-pair comparisons (see reference
        ``state_space.py:269-272``)."""
        return {}

    def auxiliary_pointwise_comparisons(self) -> Dict[str,
                                                      ComparisonCallable]:
        """Per-state variants of :meth:`auxiliary_comparisons`: callables
        mapping ``(*, n_x) x (*, n_x) -> (*)`` without the batch mean, so
        padded/masked trajectory evaluation can weight steps itself."""
        return {}

    # -- selectors ----------------------------------------------------------
    def q(self, x: Array) -> Array:
        """Configuration slice of state(s)."""
        return x[..., :self.n_q]

    def v(self, x: Array) -> Array:
        """Velocity slice of state(s)."""
        return x[..., self.n_q:]

    def q_v(self, x: Array) -> Tuple[Array, Array]:
        """Splits state(s) into configuration and velocity."""
        return self.q(x), self.v(x)

    def x(self, q: Array, v: Array) -> Array:
        """Concatenates configuration and velocity into state(s)."""
        return jnp.concatenate((q, v), axis=-1)

    # -- derived operations --------------------------------------------------
    def config_square_error(self, q_1: Array, q_2: Array) -> Array:
        """Squared geodesic distance between configurations, summed over the
        coordinate dim: ``(*, n_q) -> (*)``."""
        diff = self.configuration_difference(q_1, q_2)
        return jnp.sum(diff * diff, axis=-1)

    def velocity_square_error(self, v_1: Array, v_2: Array) -> Array:
        """Squared Euclidean distance between velocities: ``(*, n_v) -> (*)``."""
        dv = v_2 - v_1
        return jnp.sum(dv * dv, axis=-1)

    def state_square_error(self, x_1: Array, x_2: Array) -> Array:
        """Squared geodesic distance between states: ``(*, n_x) -> (*)``."""
        q_1, v_1 = self.q_v(x_1)
        q_2, v_2 = self.q_v(x_2)
        return self.config_square_error(q_1, q_2) + \
            self.velocity_square_error(v_1, v_2)

    def finite_difference(self, q: Array, q_plus: Array, dt: float) -> Array:
        """Lie-algebra rate of change such that ``q_plus = q * exp(v dt)``."""
        return self.configuration_difference(q, q_plus) / dt

    def euler_step(self, q: Array, v: Array, dt: float) -> Array:
        """Geodesic forward Euler step ``q * exp(v dt)``."""
        return self.exponential(q, v * dt)

    def state_difference(self, x_1: Array, x_2: Array) -> Array:
        """Lie-algebra difference on G x g: ``(*, n_x) -> (*, 2 n_v)``."""
        q_1, v_1 = self.q_v(x_1)
        q_2, v_2 = self.q_v(x_2)
        return jnp.concatenate(
            (self.configuration_difference(q_1, q_2), v_2 - v_1), axis=-1)

    def shift_state(self, x: Array, dx: Array) -> Array:
        """Perturbs state by Lie-algebra element ``dx`` of shape
        ``(*, 2 n_v)``; inverse of :meth:`state_difference`."""
        q, v = self.q_v(x)
        dq = dx[..., :self.n_v]
        dv = dx[..., self.n_v:]
        return self.x(self.exponential(q, dq), v + dv)

    def project_state(self, x: Array) -> Array:
        """Projects state batch onto G x g."""
        return self.x(self.project_configuration(self.q(x)), self.v(x))

    def project_derivative(self, x: Array, dt: float) -> Array:
        """Replaces velocities in trajectory ``(*, T, n_x)`` with
        finite differences of consecutive configurations; drops step 0.
        Mirrors reference ``state_space.py:379-399``."""
        q = self.q(x)
        q_pre = q[..., :-1, :]
        q_plus = q[..., 1:, :]
        v_plus = self.finite_difference(q_pre, q_plus, dt)
        return self.x(q_plus, v_plus)


class FloatingBaseSpace(StateSpace):
    """State space ``SE(3) x R^n_joints``.

    Configuration = unit quaternion (4, scalar-first) + world-frame base
    position (3) + joint angles. Velocity = body-frame angular velocity (3)
    + world-frame linear velocity (3) + joint rates. Mirrors reference
    ``state_space.py:402-572``.
    """

    def __init__(self, n_joints: int) -> None:
        assert n_joints >= 0
        super().__init__(7 + n_joints, 6 + n_joints)
        self.n_joints = n_joints

    def __hash__(self):
        return hash(("FloatingBaseSpace", self.n_joints))

    def __eq__(self, other):
        return isinstance(other, FloatingBaseSpace) and \
            other.n_joints == self.n_joints

    def quat(self, q_or_x: Array) -> Array:
        """Quaternion slice of configuration or state."""
        return q_or_x[..., :N_QUAT]

    def base(self, q_or_x: Array) -> Array:
        """Base-position slice of configuration or state."""
        return q_or_x[..., N_QUAT:N_QUAT + N_COM]

    def configuration_difference(self, q_1: Array, q_2: Array) -> Array:
        quat_shift = quaternion.multiply(
            quaternion.inverse(self.quat(q_1)), self.quat(q_2))
        rot = quaternion.log(quat_shift)
        linear = q_2[..., N_QUAT:] - q_1[..., N_QUAT:]
        return jnp.concatenate((rot, linear), axis=-1)

    def exponential(self, q: Array, dq: Array) -> Array:
        delta_quat = quaternion.exp(dq[..., :N_ANG_VEL])
        quat_plus = quaternion.multiply(self.quat(q), delta_quat)
        linear_plus = q[..., N_QUAT:] + dq[..., N_ANG_VEL:]
        return jnp.concatenate((quat_plus, linear_plus), axis=-1)

    def project_configuration(self, q: Array) -> Array:
        quats = quaternion.normalize(self.quat(q))
        return jnp.concatenate((quats, q[..., N_QUAT:]), axis=-1)

    def zero_state(self, dtype=jnp.float32) -> Array:
        zero = jnp.zeros((self.n_x,), dtype=dtype)
        return zero.at[0].set(1.0)

    def auxiliary_comparisons(self) -> Dict[str, ComparisonCallable]:
        return {"rot_err": self.quaternion_error, "pos_err": self.base_error}

    def auxiliary_pointwise_comparisons(self) -> Dict[str,
                                                      ComparisonCallable]:
        return {"rot_err": self.pointwise_quaternion_error,
                "pos_err": self.pointwise_base_error}

    def pointwise_quaternion_error(self, x_1: Array, x_2: Array) -> Array:
        """Geodesic angle between base orientations, per state."""
        quat_shift = quaternion.multiply(
            quaternion.inverse(self.quat(x_1)), self.quat(x_2))
        rot = quaternion.log(quat_shift)
        return jnp.linalg.norm(rot, axis=-1)

    def pointwise_base_error(self, x_1: Array, x_2: Array) -> Array:
        """Euclidean base-position error, per state."""
        pos = self.base(x_1) - self.base(x_2)
        return jnp.linalg.norm(pos, axis=-1)

    def quaternion_error(self, x_1: Array, x_2: Array) -> Array:
        """Mean geodesic angle between base orientations over the batch."""
        return jnp.mean(self.pointwise_quaternion_error(x_1, x_2))

    def base_error(self, x_1: Array, x_2: Array) -> Array:
        """Mean Euclidean base-position error over the batch."""
        return jnp.mean(self.pointwise_base_error(x_1, x_2))


class FixedBaseSpace(StateSpace):
    """State space ``R^n_joints`` (group = algebra = vector space).

    Mirrors reference ``state_space.py:575-647``.
    """

    def __init__(self, n_joints: int) -> None:
        assert n_joints >= 0
        super().__init__(n_joints, n_joints)
        self.n_joints = n_joints

    def __hash__(self):
        return hash(("FixedBaseSpace", self.n_joints))

    def __eq__(self, other):
        return isinstance(other, FixedBaseSpace) and \
            other.n_joints == self.n_joints

    def configuration_difference(self, q_1: Array, q_2: Array) -> Array:
        return q_2 - q_1

    def exponential(self, q: Array, dq: Array) -> Array:
        return q + dq

    def project_configuration(self, q: Array) -> Array:
        return q

    def zero_state(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((self.n_x,), dtype=dtype)


class ProductSpace(StateSpace):
    """Cartesian product of state spaces; coordinates are concatenated
    per-kind (all configurations first, then all velocities). Mirrors
    reference ``state_space.py:650-741``.
    """

    def __init__(self, spaces) -> None:
        self.spaces = tuple(spaces)
        super().__init__(
            sum(s.n_q for s in self.spaces), sum(s.n_v for s in self.spaces))

    def __hash__(self):
        return hash(("ProductSpace",) + self.spaces)

    def __eq__(self, other):
        return isinstance(other, ProductSpace) and other.spaces == self.spaces

    def _splits(self, sizes):
        offsets = []
        total = 0
        for size in sizes:
            offsets.append((total, total + size))
            total += size
        return offsets

    def q_split(self, q: Array):
        """Splits configuration into per-subspace configurations."""
        return [q[..., a:b]
                for (a, b) in self._splits([s.n_q for s in self.spaces])]

    def v_split(self, v: Array):
        """Splits velocity into per-subspace velocities."""
        return [v[..., a:b]
                for (a, b) in self._splits([s.n_v for s in self.spaces])]

    def x_split(self, x: Array):
        """Splits state into per-subspace states (q_i ++ v_i per space)."""
        qs = self.q_split(self.q(x))
        vs = self.v_split(self.v(x))
        return [jnp.concatenate((qi, vi), axis=-1) for qi, vi in zip(qs, vs)]

    def configuration_difference(self, q_1: Array, q_2: Array) -> Array:
        return jnp.concatenate([
            s.configuration_difference(a, b) for s, a, b in
            zip(self.spaces, self.q_split(q_1), self.q_split(q_2))
        ], axis=-1)

    def exponential(self, q: Array, dq: Array) -> Array:
        return jnp.concatenate([
            s.exponential(qi, dqi) for s, qi, dqi in
            zip(self.spaces, self.q_split(q), self.v_split(dq))
        ], axis=-1)

    def project_configuration(self, q: Array) -> Array:
        return jnp.concatenate([
            s.project_configuration(qi)
            for s, qi in zip(self.spaces, self.q_split(q))
        ], axis=-1)

    def zero_state(self, dtype=jnp.float32) -> Array:
        zeros = [s.zero_state(dtype) for s in self.spaces]
        q = jnp.concatenate(
            [s.q(z) for s, z in zip(self.spaces, zeros)], axis=-1)
        v = jnp.concatenate(
            [s.v(z) for s, z in zip(self.spaces, zeros)], axis=-1)
        return jnp.concatenate((q, v), axis=-1)

    def _wrap_sub_comparisons(self, per_space) -> Dict[str,
                                                       ComparisonCallable]:
        comparisons: Dict[str, ComparisonCallable] = {}
        for index, space in enumerate(self.spaces):
            sub = per_space(space)
            if not sub:
                continue

            def _wrap(fn, idx):
                def compare(x_1: Array, x_2: Array) -> Array:
                    return fn(self.x_split(x_1)[idx], self.x_split(x_2)[idx])
                return compare

            prefix = "" if len(self.spaces) == 1 else f"space_{index}_"
            for name, fn in sub.items():
                comparisons[prefix + name] = _wrap(fn, index)
        return comparisons

    def auxiliary_comparisons(self) -> Dict[str, ComparisonCallable]:
        return self._wrap_sub_comparisons(
            lambda space: space.auxiliary_comparisons())

    def auxiliary_pointwise_comparisons(self) -> Dict[str,
                                                      ComparisonCallable]:
        return self._wrap_sub_comparisons(
            lambda space: space.auxiliary_pointwise_comparisons())


# -- noise and sampling ------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WhiteNoiser:
    r"""Zero-mean noise on the Lie algebra of a state space.

    Functional counterpart of reference ``state_space.py:750-816``: noise is
    drawn on :math:`\mathbb R^{2 n_v}` and applied with
    :meth:`StateSpace.shift_state`.

    Attributes:
        space: state space to perturb.
        kind: ``"gaussian"`` (unit std) or ``"uniform"`` (on ``[-1, 1]``).
    """
    space: StateSpace
    kind: str = "gaussian"

    @property
    def variance_factor(self) -> float:
        """Per-coordinate variance of the unit-scale noise."""
        return 1.0 / 3.0 if self.kind == "uniform" else 1.0

    def _unit_noise(self, key: Array, shape, dtype) -> Array:
        if self.kind == "uniform":
            return jax.random.uniform(
                key, shape, dtype=dtype, minval=-1.0, maxval=1.0)
        return jax.random.normal(key, shape, dtype=dtype)

    def noise(self, key: Array, x: Array, ranges: Array,
              independent: bool = True) -> Array:
        """Perturbs state batch ``x`` with noise scaled per-coordinate by
        ``ranges`` (shape ``(2 n_v,)``). If ``independent`` is False the same
        draw is applied to every state in the batch."""
        dx_shape = x.shape[:-1] + (2 * self.space.n_v,)
        noise_shape = dx_shape if independent else (2 * self.space.n_v,)
        noise = self._unit_noise(key, noise_shape, x.dtype) * ranges
        noise = jnp.broadcast_to(noise, dx_shape)
        return self.space.shift_state(x, noise)

    def covariance(self, ranges: Array) -> Array:
        """Lie-algebra covariance implied by ``ranges``."""
        return jnp.diag(self.variance_factor * ranges * ranges)


class StateSpaceSampler:
    """Distribution over a state space; samples with explicit PRNG keys.

    Mirrors reference ``state_space.py:833-955``.
    """
    space: StateSpace

    def __init__(self, space: StateSpace) -> None:
        self.space = space

    def get_sample(self, key: Array, dtype=jnp.float32) -> Array:
        """Draws one ``(n_x,)`` state."""
        raise NotImplementedError

    def get_samples(self, key: Array, n: int, dtype=jnp.float32) -> Array:
        """Draws ``(n, n_x)`` i.i.d. states."""
        keys = jax.random.split(key, n)
        return jax.vmap(lambda k: self.get_sample(k, dtype))(keys)

    def covariance(self, dtype=jnp.float32) -> Array:
        """Lie-algebra covariance of the distribution."""
        raise NotImplementedError


class ConstantSampler(StateSpaceSampler):
    """Samples a fixed state; zero covariance."""

    def __init__(self, space: StateSpace, x_0: Array) -> None:
        super().__init__(space)
        self.x_0 = x_0

    def get_sample(self, key: Array, dtype=jnp.float32) -> Array:
        del key
        return jnp.asarray(self.x_0, dtype=dtype)

    def covariance(self, dtype=jnp.float32) -> Array:
        n = 2 * self.space.n_v
        return jnp.zeros((n, n), dtype=dtype)


class ZeroSampler(ConstantSampler):
    """Samples the group identity."""

    def __init__(self, space: StateSpace) -> None:
        super().__init__(space, space.zero_state())


class CenteredSampler(StateSpaceSampler):
    """Samples ``x_0`` perturbed by white noise of per-coordinate scale
    ``ranges``. ``kind`` selects gaussian or uniform unit noise."""

    def __init__(self, space: StateSpace, ranges: Array,
                 kind: str = "gaussian", x_0: Array = None) -> None:
        super().__init__(space)
        if x_0 is None:
            x_0 = space.zero_state()
        self.x_0 = space.project_state(x_0)
        self.ranges = jnp.asarray(ranges)
        self.noiser = WhiteNoiser(space, kind)

    def get_sample(self, key: Array, dtype=jnp.float32) -> Array:
        x_0 = jnp.asarray(self.x_0, dtype=dtype)
        return self.noiser.noise(key, x_0, self.ranges.astype(dtype))

    def covariance(self, dtype=jnp.float32) -> Array:
        return self.noiser.covariance(self.ranges.astype(dtype))


class UniformSampler(CenteredSampler):
    """Centered sampler with uniform unit noise."""

    def __init__(self, space: StateSpace, ranges: Array, x_0: Array = None):
        super().__init__(space, ranges, "uniform", x_0)


class GaussianSampler(CenteredSampler):
    """Centered sampler with gaussian unit noise."""

    def __init__(self, space: StateSpace, ranges: Array, x_0: Array = None):
        super().__init__(space, ranges, "gaussian", x_0)
