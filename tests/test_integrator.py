"""Integrator tests: all six kinds (reference integrator.py:123-227)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.integrator import INTEGRATOR_KINDS, Integrator
from dair_pll_tpu.state_space import FixedBaseSpace, FloatingBaseSpace

DT = 0.1


def test_out_sizes():
    space = FloatingBaseSpace(1)
    expected = {"state": 15, "delta_state": 14, "velocity": 7,
                "delta_velocity": 7, "configuration": 8,
                "delta_configuration": 7}
    for kind in INTEGRATOR_KINDS:
        integrator = Integrator(space, lambda p, x, c: (x, c), DT, kind)
        assert integrator.out_size() == expected[kind]


@pytest.mark.parametrize("kind", INTEGRATOR_KINDS)
def test_constant_dynamics_consistency(kind):
    """Every integrator kind advances a constant-velocity system the same
    way when fed the matching partial-step output."""
    space = FixedBaseSpace(2)
    v_const = jnp.asarray([0.5, -1.0])

    def partial_step(params, x, carry):
        del params
        q, v = space.q_v(x)
        q_next = q + v_const * DT
        outs = {
            "state": space.x(q_next, v_const),
            "delta_state": jnp.concatenate((v_const * DT,
                                            v_const - v)),
            "velocity": v_const,
            "delta_velocity": v_const - v,
            "configuration": q_next,
            "delta_configuration": v_const * DT,
        }
        return outs[kind], carry

    integrator = Integrator(space, partial_step, DT, kind)
    x0 = jnp.asarray([0.0, 0.0, 0.5, -1.0])
    trajectory, _ = integrator.simulate(None, x0, jnp.zeros(0), 10)
    assert trajectory.shape == (11, 4)
    np.testing.assert_allclose(
        np.asarray(trajectory[-1][:2]), np.asarray(v_const) * DT * 10,
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(trajectory[-1][2:]), np.asarray(v_const), atol=1e-6)


def test_velocity_integrator_quaternion_geodesic():
    """Velocity integration advances quaternions along the exponential."""
    space = FloatingBaseSpace(0)
    omega = jnp.asarray([0.0, 0.0, 1.0])  # yaw at 1 rad/s

    def partial_step(params, x, carry):
        return jnp.concatenate((omega, jnp.zeros(3))), carry

    integrator = Integrator(space, partial_step, DT, "velocity")
    x0 = space.zero_state(jnp.float64)
    trajectory, _ = integrator.simulate(None, x0, jnp.zeros(0), 10)
    # After 1 second: yaw of 1 rad.
    quat = np.asarray(trajectory[-1][:4])
    np.testing.assert_allclose(quat, [np.cos(0.5), 0, 0, np.sin(0.5)],
                               atol=1e-9)
    norms = np.linalg.norm(np.asarray(trajectory[:, :4]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
