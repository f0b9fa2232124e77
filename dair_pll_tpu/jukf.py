r"""Jacobian-inferring manifold UKF (JUKF), TPU-native.

Rebuild of the reference's ``JUKF`` (``/root/reference/dair_pll/ukf.py:
219-591``; the Brossard et al. UKF-M variant). Instead of propagating the
full covariance through sigma points, the JUKF *numerically infers* the
EKF Jacobians ``F``/``G``/``H`` from sigma points over a *reduced* subset
of the uncertainty coordinates — cheaper when only part of the state takes
part in a step, and the natural form for state augmentation.

Differences from the reference: sigma-point loops (``ukf.py:351-357,
411-417, 468-472``) are ``vmap``\ ed; the filter state ``(state, P)``
threads functionally; the multi-measurement stacking API (``H``/``r``/``R``
accumulators, ``ukf.py:488-490``) becomes explicit lists passed to
:meth:`state_update`. Reduced/update index subsets are static tuples so
everything jits.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.ukf import TOL, sigma_weights


@dataclasses.dataclass(frozen=True)
class JUKF:
    """Functional Jacobian-inferring UKF.

    Attributes:
        f: propagation ``f(state, omega, w, dt) -> state``.
        h: observation ``h(state) -> (l,)``.
        phi: full-state retraction ``phi(state, xi_full) -> state``.
        Q: ``(q, q)`` propagation noise covariance.
        alpha: five sigma-spread parameters (reduced-propagation, noise,
          update, augmentation-state, augmentation-noise) matching
          reference ``ukf.py:295-321``.
        d: full uncertainty dimension.
        red_idxs: static indices of coordinates active in propagation.
        red_phi / red_phi_inv: reduced retraction and inverse.
        up_idxs: static indices active in updates.
        up_phi: update retraction.
    """
    f: Callable
    h: Callable
    phi: Callable
    Q: Any
    alpha: Tuple[float, float, float, float, float]
    d: int
    red_idxs: Tuple[int, ...]
    red_phi: Callable
    red_phi_inv: Callable
    up_idxs: Tuple[int, ...]
    up_phi: Callable

    # -- propagation ----------------------------------------------------------
    def propagation(self, state: Any, P: Array, omega: Any,
                    dt: float) -> Tuple[Any, Array]:
        """EKF-style covariance propagation with numerically inferred
        ``F`` and ``G`` (reference ``ukf.py:367-435``)."""
        q_dim = self.Q.shape[0]
        zero_noise = jnp.zeros((q_dim,), P.dtype)
        new_state = self.f(state, omega, zero_noise, dt)
        F = self._F_num(state, new_state, P, omega, dt)
        G = self._G_num(state, new_state, omega, dt)
        new_P = F @ P @ F.T + G @ self.Q @ G.T
        return new_state, 0.5 * (new_P + new_P.T)

    def _F_num(self, state, new_state, P: Array, omega, dt) -> Array:
        red = jnp.asarray(self.red_idxs)
        red_d = len(self.red_idxs)
        w_d = sigma_weights(red_d, self.alpha[0])
        P_red = P[jnp.ix_(red, red)] + TOL * jnp.eye(red_d, dtype=P.dtype)
        q_dim = self.Q.shape[0]
        zero_noise = jnp.zeros((q_dim,), P.dtype)

        xis = w_d.sqrt_d_lambda * jnp.linalg.cholesky(P_red).T
        xis_pm = jnp.concatenate((xis, -xis), axis=0)

        def through(xi):
            s = self.red_phi(state, xi)
            return self.red_phi_inv(new_state,
                                    self.f(s, omega, zero_noise, dt))

        new_xis = jax.vmap(through)(xis_pm)
        mean = w_d.wj * jnp.sum(new_xis, axis=0)
        centered = new_xis - mean
        Xi = w_d.wj * centered.T @ xis_pm
        F_red = jnp.linalg.solve(P_red, Xi.T).T
        F = jnp.eye(self.d, dtype=P.dtype)
        return F.at[jnp.ix_(red, red)].set(F_red)

    def _G_num(self, state, new_state, omega, dt) -> Array:
        q_dim = self.Q.shape[0]
        w_q = sigma_weights(q_dim, self.alpha[1])
        cholQ = jnp.linalg.cholesky(self.Q).T
        noise_rows = w_q.sqrt_d_lambda * cholQ
        noise_pm = jnp.concatenate((noise_rows, -noise_rows), axis=0)

        def through(w_vec):
            return self.red_phi_inv(new_state,
                                    self.f(state, omega, w_vec, dt))

        new_xis = jax.vmap(through)(noise_pm)
        mean = w_q.wj * jnp.sum(new_xis, axis=0)
        centered = new_xis - mean
        Xi = (w_q.wj * centered.T @ noise_pm)
        G_red = jnp.linalg.solve(self.Q, Xi.T).T
        G = jnp.zeros((self.d, q_dim), dtype=self.Q.dtype)
        return G.at[jnp.asarray(self.red_idxs)].set(G_red)

    # -- update --------------------------------------------------------------
    def H_num(self, state: Any, P: Array,
              y: Array) -> Tuple[Array, Array]:
        """Numerically infers the measurement Jacobian ``H`` and residual
        (reference ``ukf.py:446-490``)."""
        up = jnp.asarray(self.up_idxs)
        up_d = len(self.up_idxs)
        w_u = sigma_weights(up_d, self.alpha[2])
        P_up = P[jnp.ix_(up, up)] + TOL * jnp.eye(up_d, dtype=P.dtype)

        xis = w_u.sqrt_d_lambda * jnp.linalg.cholesky(P_up).T
        xis_pm = jnp.concatenate((xis, -xis), axis=0)
        hat_y = self.h(state)
        ys = jax.vmap(lambda xi: self.h(self.up_phi(state, xi)))(xis_pm)

        y_bar = w_u.wm * hat_y + w_u.wj * jnp.sum(ys, axis=0)
        centered = ys - y_bar
        Y = w_u.wj * centered.T @ xis_pm
        H_up = jnp.linalg.solve(P_up, Y.T).T
        H = jnp.zeros((y.shape[0], self.d), dtype=P.dtype)
        H = H.at[:, up].set(H_up)
        return H, y - y_bar

    def state_update(self, state: Any, P: Array, H: Array, r: Array,
                     R: Array) -> Tuple[Any, Array]:
        """Kalman update from inferred Jacobian(s) (reference
        ``ukf.py:492-513``). Stack multiple measurements by concatenating
        ``H`` rows / ``r`` entries and block-diagonal ``R``."""
        S = H @ P @ H.T + R
        K = jnp.linalg.solve(S, (P @ H.T).T).T
        xi = K @ r
        new_state = self.phi(state, xi)
        new_P = (jnp.eye(self.d, dtype=P.dtype) - K @ H) @ P
        return new_state, 0.5 * (new_P + new_P.T)

    def update(self, state: Any, P: Array, y: Array,
               R: Array) -> Tuple[Any, Array]:
        """Single-measurement convenience update."""
        H, r = self.H_num(state, P, y)
        return self.state_update(state, P, H, r, R)

    def step(self, state: Any, P: Array, omega: Any, y: Array, R: Array,
             dt: float) -> Tuple[Any, Array]:
        """One propagate-then-update cycle."""
        state, P = self.propagation(state, P, omega, dt)
        return self.update(state, P, y, R)
