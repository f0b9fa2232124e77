r"""MuJoCo-backed oracle systems for cross-validation studies.

Rebuild of the reference's ``mujoco_system.py``
(``/root/reference/dair_pll/mujoco_system.py:17-463``) on the modern
``mujoco`` bindings (the reference uses the deprecated ``mujoco-py``).
Provides:

* :class:`MuJoCoSystem` — a soft-contact ground-truth simulator whose
  ``solref`` stiffness/damping is templated from (stiffness, damping
  ratio) exactly as the reference does (``mujoco_system.py:55-68``),
  driven through the shared :class:`System` interface. This is host-side
  C code (an *oracle*, not a training-path component), so rollouts run
  stepwise on CPU like the reference (``max_batch_dim = 0``).
* :class:`MuJoCoUKFSystem` — a UKF-smoothing oracle: estimates the
  maximum-likelihood state from noisy measurements using the manifold UKF
  (``dair_pll_tpu.ukf``) with the MuJoCo simulator as the propagation
  model (reference ``mujoco_system.py:122-463``).
* ``mll_estimate`` — initial-state fit by Nelder-Mead over the UKF/rollout
  likelihood (reference ``mujoco_system.py:383-463``), using scipy.

State conversion: MuJoCo lays out free-joint coordinates as
``[pos(3), quat(4), joints]`` / velocities ``[v_world(3), omega_body(3),
rates]``; the state space uses ``[quat, pos, joints]`` /
``[omega_body, v_world, rates]`` (reference ``mujoco_system.py:17-42``).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from dair_pll_tpu import state_space as space_mod
from dair_pll_tpu.integrator import Integrator
from dair_pll_tpu.system import System
from dair_pll_tpu.ukf import ManifoldUKF

try:
    import mujoco
    MUJOCO_AVAILABLE = True
except ImportError:  # pragma: no cover
    MUJOCO_AVAILABLE = False


def mujoco_to_state(qpos: np.ndarray, qvel: np.ndarray) -> np.ndarray:
    """MuJoCo ``(qpos, qvel)`` to state-space layout."""
    pos, quat, joints = qpos[:3], qpos[3:7], qpos[7:]
    v_lin, omega, v_joints = qvel[:3], qvel[3:6], qvel[6:]
    return np.concatenate((quat, pos, joints, omega, v_lin, v_joints))


def state_to_mujoco(x: np.ndarray, n_joints: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """State-space layout to MuJoCo ``(qpos, qvel)``."""
    n_q = 7 + n_joints
    q, v = x[:n_q], x[n_q:]
    qpos = np.concatenate((q[4:7], q[:4], q[7:]))
    qvel = np.concatenate((v[3:6], v[:3], v[6:]))
    return qpos, qvel


def solref_args(stiffness: float, damping_ratio: float,
                v200: bool) -> Tuple[float, float]:
    """Maps (stiffness, damping ratio) to MuJoCo ``solref`` arguments, both
    conventions of the reference (``mujoco_system.py:55-68``): the
    time-constant form and the direct (negative) stiffness/damping form
    for MuJoCo >= 2.0 semantics."""
    if v200:
        total_damping = damping_ratio * 2.0 * np.sqrt(stiffness)
        return -stiffness, -total_damping
    time_constant = 1.0 / (damping_ratio * np.sqrt(stiffness))
    return time_constant, damping_ratio


class MuJoCoSystem(System):
    """Soft-contact MuJoCo simulator as a :class:`System` oracle."""

    host_stepped = True

    def __init__(self, mjcf: str, dt: float, stiffness: float,
                 damping_ratio: float, v200: bool = False) -> None:
        if not MUJOCO_AVAILABLE:  # pragma: no cover
            raise ImportError("mujoco is not available")
        arg1, arg2 = solref_args(stiffness, damping_ratio, v200)
        with open(mjcf, "r", encoding="utf-8") as handle:
            xml = (handle.read()
                   .replace("$solrefarg1", str(arg1))
                   .replace("$solrefarg2", str(arg2))
                   .replace("$dt", str(dt)))
        self.mj_model = mujoco.MjModel.from_xml_string(xml)
        self.mj_data = mujoco.MjData(self.mj_model)
        n_joints = self.mj_model.nq - 7
        space = space_mod.FloatingBaseSpace(n_joints)
        integrator = Integrator(space, self._partial_step, dt, "state")
        super().__init__(space, integrator)
        self.n_joints = n_joints

    # MuJoCo stepping is stateful host code; simulation overrides the
    # scan-based path with a host loop (like the reference's
    # max_batch_dim=0 restriction, mujoco_system.py:78).
    def _partial_step(self, params: Any, x, carry):
        raise NotImplementedError("use simulate()")

    def step_state(self, x: np.ndarray) -> np.ndarray:
        """One MuJoCo step from a state-space state."""
        qpos, qvel = state_to_mujoco(np.asarray(x, np.float64),
                                     self.n_joints)
        self.mj_data.qpos[:] = qpos
        self.mj_data.qvel[:] = qvel
        mujoco.mj_forward(self.mj_model, self.mj_data)
        mujoco.mj_step(self.mj_model, self.mj_data)
        return mujoco_to_state(self.mj_data.qpos, self.mj_data.qvel)

    def simulate(self, params: Any, x_0, steps: int,
                 carry_0: Optional[Any] = None) -> np.ndarray:
        """Host-side rollout returning ``(steps + 1, n_x)``."""
        del params, carry_0
        trajectory = [np.asarray(x_0, np.float64)]
        for _ in range(steps):
            trajectory.append(self.step_state(trajectory[-1]))
        return np.stack(trajectory)

    def simulate_batch(self, params: Any, x_0, steps: int) -> np.ndarray:
        x_0 = np.asarray(x_0)
        batch_shape = x_0.shape[:-1]
        flat = x_0.reshape(-1, x_0.shape[-1])
        rollouts = np.stack(
            [self.simulate(params, x, steps) for x in flat])
        return rollouts.reshape(batch_shape + rollouts.shape[1:])


SENSE_VELOCITY = True


class MuJoCoUKFSystem(MuJoCoSystem):
    """UKF-smoothing oracle over the MuJoCo model.

    Mirrors reference ``MuJoCoUKFSystem`` (``mujoco_system.py:122-463``):
    the propagation model is the MuJoCo step perturbed on the state-space
    Lie algebra; measurements are log-coordinates of the state.

    With ``bias=True`` the filter state augments the (sensed) state with
    an estimated static configuration bias (reference BIAS mode,
    ``mujoco_system.py:117-119, 252-372`` with ``BIAS_VEL=False,
    SENSE_BIAS=True``): physics propagates the de-biased state, the bias
    itself is a random constant, and the measurement observes both the
    sensed state's log coordinates and a zero pseudo-measurement of the
    bias.
    """

    def __init__(self, mjcf: str, dt: float, stiffness: float,
                 damping_ratio: float, v200: bool = False,
                 P0: Optional[np.ndarray] = None,
                 R: Optional[np.ndarray] = None,
                 bias: bool = False) -> None:
        super().__init__(mjcf, dt, stiffness, damping_ratio, v200)
        self.bias = bias
        n_tan = (3 if bias else 2) * self.space.n_v
        self.P0 = np.eye(n_tan) if P0 is None else np.asarray(P0)
        self.R = (np.eye(n_tan) * 1e-2 if R is None else np.asarray(R))

    @staticmethod
    def noise_stds_to_P0_R_stds(static_stds: np.ndarray,
                                dynamic_std: np.ndarray, dt: float,
                                bias: bool = False
                                ) -> Tuple[np.ndarray, np.ndarray]:
        """Maps data-noise standard deviations to UKF P0/R diagonals
        (reference ``mujoco_system.py:126-160``).

        Bias-free branch (:150-160): configuration noise is the composite
        of static and dynamic stds; velocity noise is the finite-difference
        amplification of the dynamic std. Bias branch (:129-148): the
        dynamic std alone drives the state block (the static component is
        explained by the estimated bias), whose prior/pseudo-measurement
        std is the static std.
        """
        nv = static_stds.size // 2
        if bias:
            composite = dynamic_std[:nv]
            state0 = np.concatenate(
                (composite, dynamic_std[:nv] * np.sqrt(2.0 / dt)))
            bias0 = static_stds + 1e-8
            P0_diag = np.concatenate((state0, bias0[:nv]))
            R_diag = P0_diag.copy() if SENSE_VELOCITY \
                else composite.copy()
            return P0_diag, R_diag
        config_noise = np.sqrt(static_stds**2 + dynamic_std**2)[:nv]
        P0_diag = np.concatenate(
            (config_noise, dynamic_std[:nv] * np.sqrt(2.0 / dt)))
        R_diag = P0_diag.copy() if SENSE_VELOCITY else config_noise.copy()
        return P0_diag, R_diag

    def _build_ukf(self) -> ManifoldUKF:
        import jax.numpy as jnp
        space = self.space
        zero = np.asarray(space.zero_state(jnp.float64))

        def f(state, omega, w, dt):
            del omega, dt
            x = np.asarray(space.shift_state(
                jnp.asarray(state), jnp.asarray(w)))
            return self.step_state(x)

        def h(state):
            return np.asarray(space.state_difference(
                jnp.asarray(zero), jnp.asarray(state)))

        def phi(state, xi):
            return np.asarray(space.shift_state(
                jnp.asarray(state), jnp.asarray(xi)))

        def phi_inv(x1, x2):
            return np.asarray(space.state_difference(
                jnp.asarray(x1), jnp.asarray(x2)))

        n_v2 = 2 * space.n_v
        return ManifoldUKF(
            f=f, h=h, phi=phi, phi_inv=phi_inv,
            Q=1e-10 * np.eye(n_v2), R=self.R,
            alpha=(0.1, 0.1, 0.1), d=n_v2)

    def _build_bias_ukf(self) -> ManifoldUKF:
        """Bias-augmented filter: state ``[x (n_x), b (n_v)]``, tangent
        ``[dx (2 n_v), db (n_v)]`` (reference ``ukf_bias_estimate``,
        ``mujoco_system.py:252-372``)."""
        import jax.numpy as jnp
        space = self.space
        nv = space.n_v
        n_x = space.n_x
        zero = np.asarray(space.zero_state(jnp.float64))

        def phi(state, delta):
            x, b = state[:n_x], state[n_x:]
            dx, db = delta[:2 * nv], delta[2 * nv:]
            shifted = np.asarray(space.shift_state(
                jnp.asarray(x), jnp.asarray(dx)))
            return np.concatenate((shifted, b + db))

        def phi_inv(s1, s2):
            dx = np.asarray(space.state_difference(
                jnp.asarray(s1[:n_x]), jnp.asarray(s2[:n_x])))
            return np.concatenate((dx, s2[n_x:] - s1[n_x:]))

        def f(state, omega, w, dt):
            del omega, dt
            state = phi(state, w)
            x, b = state[:n_x], state[n_x:]
            # De-bias the sensed configuration, step real physics,
            # re-bias; the bias itself is a random constant.
            shift = np.concatenate((b, np.zeros_like(b)))
            real = np.asarray(space.shift_state(
                jnp.asarray(x), jnp.asarray(shift)))
            real_next = self.step_state(real)
            sensed_next = np.asarray(space.shift_state(
                jnp.asarray(real_next), jnp.asarray(-shift)))
            return np.concatenate((sensed_next, b))

        def h(state):
            x, b = state[:n_x], state[n_x:]
            ds = np.asarray(space.state_difference(
                jnp.asarray(zero), jnp.asarray(x)))
            return np.concatenate((ds, b))

        d = 3 * nv
        return ManifoldUKF(
            f=f, h=h, phi=phi, phi_inv=phi_inv,
            Q=1e-8 * np.eye(d), R=self.R,
            alpha=(0.1, 0.1, 0.1), d=d)

    def preprocess_initial_condition(self, params: Any, x_history,
                                     carry: Any) -> Tuple[np.ndarray, Any]:
        """UKF-smooths the (noisy) initial-condition history into the
        starting state — the defining behavior of the UKF oracle
        (reference ``mujoco_system.py:178-249``; bias mode :252-372,
        routed like :458-462). A length-1 history reduces to the raw
        state."""
        del params
        x_history = np.asarray(x_history, np.float64)
        if x_history.shape[0] > 1:
            estimate = self.ukf_bias_estimate(x_history) if self.bias \
                else self.ukf_estimate(x_history)
            return estimate, carry
        return x_history[-1], carry

    def ukf_bias_estimate(self, x_sequence: np.ndarray) -> np.ndarray:
        """Filters a noisy state sequence with the bias-augmented UKF and
        returns the final de-biased state (reference
        ``mujoco_system.py:252-372``): the smoothed sensed state shifted
        by the estimated configuration bias."""
        import jax.numpy as jnp
        space = self.space
        nv = space.n_v
        n_x = space.n_x
        ukf = self._build_bias_ukf()
        x_sequence = np.asarray(x_sequence, np.float64)
        state = np.concatenate((x_sequence[0], np.zeros(nv)))
        P = self.P0.copy()
        for x_i in x_sequence[1:]:
            measured = np.concatenate((x_i, np.zeros(nv)))
            state, P = _host_propagate_update(ukf, state, P, measured,
                                              self.integrator.dt)
        x, b = state[:n_x], state[n_x:]
        shift = np.concatenate((b, np.zeros_like(b)))
        return np.asarray(space.shift_state(
            jnp.asarray(x), jnp.asarray(shift)))

    def ukf_estimate(self, x_sequence: np.ndarray) -> np.ndarray:
        """Filters a noisy state sequence, returning the final smoothed
        state (reference ``mujoco_system.py:178-249``).

        Note: the MuJoCo propagation is host code, so this path runs the
        reference's sequential algorithm (numpy callbacks) rather than the
        scan-based JAX filter in ``dair_pll_tpu.ukf``.
        """
        ukf = self._build_ukf()
        x_sequence = np.asarray(x_sequence, np.float64)
        state = x_sequence[0]
        P = self.P0.copy()
        for x_i in x_sequence[1:]:
            state, P = _host_propagate_update(ukf, state, P, x_i,
                                              self.integrator.dt)
        return state

    def mll_estimate(self, x_sequence: np.ndarray,
                     max_iterations: int = 50) -> np.ndarray:
        """Maximum-likelihood initial-state estimate by Nelder-Mead over
        rollout error (reference ``mujoco_system.py:383-463``)."""
        from scipy.optimize import minimize
        import jax.numpy as jnp
        space = self.space
        x_sequence = np.asarray(x_sequence, np.float64)
        T = x_sequence.shape[0]
        x0_nominal = x_sequence[0]

        def cost(xi):
            x0 = np.asarray(space.shift_state(
                jnp.asarray(x0_nominal), jnp.asarray(xi)))
            rollout = self.simulate(None, x0, T - 1)
            err = space.state_square_error(
                jnp.asarray(rollout), jnp.asarray(x_sequence))
            return float(np.sum(np.asarray(err)))

        result = minimize(
            cost, np.zeros(2 * space.n_v), method="Nelder-Mead",
            options={"maxiter": max_iterations})
        return np.asarray(space.shift_state(
            jnp.asarray(x0_nominal), jnp.asarray(result.x)))


def _host_propagate_update(ukf: ManifoldUKF, state, P, y_state, dt):
    """Runs one UKF cycle with numpy host callbacks (MuJoCo propagation
    cannot trace through jit)."""
    import numpy as np

    d = ukf.d
    # propagation (mirrors ManifoldUKF.propagation with host callbacks)
    from dair_pll_tpu.ukf import sigma_weights, TOL
    w_d = sigma_weights(d, ukf.alpha[0])
    w_q = sigma_weights(ukf.Q.shape[0], ukf.alpha[1])
    P = P + TOL * np.eye(d)
    zero_noise = np.zeros(ukf.Q.shape[0])
    new_state = ukf.f(state, None, zero_noise, dt)

    xis = w_d.sqrt_d_lambda * np.linalg.cholesky(P).T
    new_xis = []
    for sign in (1.0, -1.0):
        for j in range(d):
            s_j = ukf.phi(state, sign * xis[j])
            new_xis.append(ukf.phi_inv(new_state, ukf.f(
                s_j, None, zero_noise, dt)))
    new_xis = np.stack(new_xis)
    mean_xi = w_d.wj * new_xis.sum(axis=0)
    centered = new_xis - mean_xi
    new_P = w_d.wj * centered.T @ centered + \
        w_d.w0 * np.outer(mean_xi, mean_xi)

    cholQ = np.linalg.cholesky(ukf.Q).T
    noise_xis = []
    for sign in (1.0, -1.0):
        for j in range(ukf.Q.shape[0]):
            w_vec = sign * w_q.sqrt_d_lambda * cholQ[j]
            noise_xis.append(ukf.phi_inv(new_state, ukf.f(
                state, None, w_vec, dt)))
    noise_xis = np.stack(noise_xis)
    mean_noise = w_q.wj * noise_xis.sum(axis=0)
    centered_noise = noise_xis - mean_noise
    Q_cov = w_q.wj * centered_noise.T @ centered_noise + \
        w_q.w0 * np.outer(mean_noise, mean_noise)
    P = new_P + Q_cov
    state = new_state

    # update
    w_u = sigma_weights(d, ukf.alpha[2])
    P = P + TOL * np.eye(d)
    xis = w_u.sqrt_d_lambda * np.linalg.cholesky(P).T
    hat_y = ukf.h(state)
    ys = []
    xis_pm = np.concatenate((xis, -xis), axis=0)
    for xi in xis_pm:
        ys.append(ukf.h(ukf.phi(state, xi)))
    ys = np.stack(ys)
    y = ukf.h(y_state)
    y_bar = w_u.wm * hat_y + w_u.wj * ys.sum(axis=0)
    ys_c = ys - y_bar
    hat_c = hat_y - y_bar
    P_yy = w_u.w0 * np.outer(hat_c, hat_c) + w_u.wj * ys_c.T @ ys_c + ukf.R
    P_xiy = w_u.wj * xis_pm.T @ ys_c
    K = np.linalg.solve(P_yy, P_xiy.T).T
    state = ukf.phi(state, K @ (y - y_bar))
    P = P - K @ P_yy @ K.T
    return state, 0.5 * (P + P.T)
