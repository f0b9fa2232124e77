r"""Unscented Kalman Filter on manifolds (UKF-M), TPU-native.

JAX rebuild of the reference's vendored Brossard et al. UKF-M
(``/root/reference/dair_pll/ukf.py:6-216``; the reference repackages
https://github.com/CAOS-lab/ukfm per its ``README.md:10``). Differences:

* Sigma-point propagation/update loops (reference ``ukf.py:123-129,
  147-153, 188-192``) become ``vmap`` over the stacked sigma points.
* Filtering a whole measurement sequence is one ``lax.scan``
  (:func:`filter_trajectory`), so a trajectory's smoothing pass is a single
  compiled program, batched over trajectories with another ``vmap``.
* State is explicit ``(state, P)`` carried functionally; callbacks
  ``f``/``h``/``phi``/``phi_inv`` are closures over static models.

The filter operates on any :class:`~dair_pll_tpu.state_space.StateSpace`
via its exponential/difference maps (see :func:`state_space_retractions`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import Array

TOL = 1e-9


class SigmaWeights(NamedTuple):
    """Unscented-transform weights for one dimension/alpha pair
    (reference ``ukf.py:81-87``)."""
    sqrt_d_lambda: float
    wj: float
    wm: float
    w0: float


def sigma_weights(dim: int, alpha: float) -> SigmaWeights:
    """Computes sigma-point weights for a given dimension (host-side
    Python math so the weights are static under jit/scan)."""
    import math
    m = (alpha**2 - 1.0) * dim
    return SigmaWeights(
        sqrt_d_lambda=math.sqrt(dim + m),
        wj=1.0 / (2.0 * (dim + m)),
        wm=m / (m + dim),
        w0=m / (m + dim) + 3.0 - alpha**2,
    )


@dataclasses.dataclass(frozen=True)
class ManifoldUKF:
    """Functional UKF-M.

    Attributes:
        f: propagation ``f(state, omega, w, dt) -> state`` (``w`` is the
          noise input).
        h: observation ``h(state) -> (l,)``.
        phi: retraction ``phi(state, xi) -> state``.
        phi_inv: inverse retraction ``phi_inv(state_1, state_2) -> xi``.
        Q: ``(q, q)`` propagation noise covariance.
        R: ``(l, l)`` observation noise covariance.
        alpha: three sigma-point spread parameters (state-propagation,
          noise-propagation, update).
        d: state-uncertainty dimension.
    """
    f: Callable
    h: Callable
    phi: Callable
    phi_inv: Callable
    Q: Any
    R: Any
    alpha: Tuple[float, float, float]
    d: int

    def _weights(self):
        q = self.Q.shape[0]
        return (sigma_weights(self.d, self.alpha[0]),
                sigma_weights(q, self.alpha[1]),
                sigma_weights(self.d, self.alpha[2]))

    def propagation(self, state: Any, P: Array, omega: Any,
                    dt: float) -> Tuple[Any, Array]:
        """Mean/covariance propagation (reference ``ukf.py:90-164``).

        Returns:
            (new_state, new_P).
        """
        d = self.d
        q = self.Q.shape[0]
        w_d, w_q, _ = self._weights()
        P = P + TOL * jnp.eye(d, dtype=P.dtype)
        zero_noise = jnp.zeros((q,), P.dtype)

        new_state = self.f(state, omega, zero_noise, dt)

        # -- covariance from state uncertainty --------------------------------
        xis = w_d.sqrt_d_lambda * jnp.linalg.cholesky(P).T     # (d, d) rows
        xis_pm = jnp.concatenate((xis, -xis), axis=0)          # (2d, d)

        def propagate_sigma(xi):
            s = self.phi(state, xi)
            s_new = self.f(s, omega, zero_noise, dt)
            return self.phi_inv(new_state, s_new)

        new_xis = jax.vmap(propagate_sigma)(xis_pm)            # (2d, d)
        mean_xi = w_d.wj * jnp.sum(new_xis, axis=0)
        centered = new_xis - mean_xi
        new_P = (w_d.wj * centered.T @ centered +
                 w_d.w0 * jnp.outer(mean_xi, mean_xi))

        # -- covariance from propagation noise ---------------------------------
        cholQ = jnp.linalg.cholesky(self.Q).T
        noise_rows = w_q.sqrt_d_lambda * cholQ                  # (q, q)
        noise_pm = jnp.concatenate((noise_rows, -noise_rows), axis=0)

        def propagate_noise(w_vec):
            s_new = self.f(state, omega, w_vec, dt)
            return self.phi_inv(new_state, s_new)

        noise_xis = jax.vmap(propagate_noise)(noise_pm)         # (2q, d)
        mean_noise = w_q.wj * jnp.sum(noise_xis, axis=0)
        centered_noise = noise_xis - mean_noise
        Q_cov = (w_q.wj * centered_noise.T @ centered_noise +
                 w_q.w0 * jnp.outer(mean_noise, mean_noise))

        return new_state, new_P + Q_cov

    def update(self, state: Any, P: Array, y: Array) -> Tuple[Any, Array]:
        """Measurement update (reference ``ukf.py:166-216``).

        Returns:
            (updated_state, updated_P).
        """
        d = self.d
        _, _, w_u = self._weights()
        P = P + TOL * jnp.eye(d, dtype=P.dtype)

        xis = w_u.sqrt_d_lambda * jnp.linalg.cholesky(P).T
        xis_pm = jnp.concatenate((xis, -xis), axis=0)           # (2d, d)

        hat_y = self.h(state)
        ys = jax.vmap(lambda xi: self.h(self.phi(state, xi)))(xis_pm)

        y_bar = w_u.wm * hat_y + w_u.wj * jnp.sum(ys, axis=0)
        ys_centered = ys - y_bar
        hat_y_centered = hat_y - y_bar

        P_yy = (w_u.w0 * jnp.outer(hat_y_centered, hat_y_centered) +
                w_u.wj * ys_centered.T @ ys_centered + self.R)
        P_xiy = w_u.wj * xis_pm.T @ ys_centered

        K = jnp.linalg.solve(P_yy, P_xiy.T).T
        xi_plus = K @ (y - y_bar)
        new_state = self.phi(state, xi_plus)
        new_P = P - K @ P_yy @ K.T
        return new_state, 0.5 * (new_P + new_P.T)

    def step(self, state: Any, P: Array, omega: Any, y: Array,
             dt: float) -> Tuple[Any, Array]:
        """One propagate-then-update cycle."""
        state, P = self.propagation(state, P, omega, dt)
        return self.update(state, P, y)

    def filter_trajectory(self, state_0: Any, P_0: Array, omegas: Any,
                          ys: Array, dt: float) -> Tuple[Any, Array]:
        """Filters a whole measurement sequence with one ``lax.scan``.

        Args:
            state_0 / P_0: initial state and covariance.
            omegas: per-step inputs, leading dim T.
            ys: ``(T, l)`` measurements.
            dt: time step.

        Returns:
            (filtered states stacked over T, covariances ``(T, d, d)``).
        """

        def scan_step(carry, inputs):
            state, P = carry
            omega, y = inputs
            state, P = self.step(state, P, omega, y, dt)
            return (state, P), (state, P)

        _, (states, Ps) = jax.lax.scan(
            scan_step, (state_0, P_0), (omegas, ys))
        return states, Ps


def state_space_retractions(space) -> Tuple[Callable, Callable]:
    """Builds (phi, phi_inv) retractions from a state space's Lie
    structure: ``phi(x, xi) = shift_state(x, xi)`` and
    ``phi_inv(x1, x2) = state_difference(x1, x2)``."""
    return space.shift_state, space.state_difference
