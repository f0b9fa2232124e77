"""MuJoCo oracle system tests (skipped when mujoco is unavailable)."""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.mujoco_system import (MuJoCoSystem, MuJoCoUKFSystem,
                                        mujoco_to_state, state_to_mujoco,
                                        solref_args)

DT = 0.0068


@pytest.fixture(scope="module")
def cube_mjcf():
    return get_asset("cube_mjcf")


def test_state_conversion_roundtrip(rng):
    x = rng.standard_normal(13)
    x[:4] /= np.linalg.norm(x[:4])
    qpos, qvel = state_to_mujoco(x, 0)
    back = mujoco_to_state(qpos, qvel)
    np.testing.assert_allclose(back, x, atol=1e-12)


def test_solref_args():
    arg1, arg2 = solref_args(2500.0, 1.04, v200=False)
    np.testing.assert_allclose(arg1, 1.0 / (1.04 * np.sqrt(2500.0)))
    np.testing.assert_allclose(arg2, 1.04)
    arg1, arg2 = solref_args(2500.0, 1.04, v200=True)
    np.testing.assert_allclose(arg1, -2500.0)
    np.testing.assert_allclose(arg2, -1.04 * 2 * np.sqrt(2500.0))


def test_cube_drop_settles(cube_mjcf):
    system = MuJoCoSystem(cube_mjcf, DT, stiffness=2500.0,
                          damping_ratio=1.04)
    assert system.space.n_x == 13
    x0 = np.zeros(13)
    x0[0] = 1.0       # identity quaternion
    x0[6] = 0.15      # drop height
    trajectory = system.simulate(None, x0, 200)
    z = trajectory[:, 6]
    assert z.min() > 0.0
    # settles near half-edge height
    assert abs(z[-1] - 0.0524) < 0.02
    speed = np.linalg.norm(trajectory[-1, 7:])
    assert speed < 0.1


def test_ukf_estimate_improves_state(cube_mjcf, rng):
    system = MuJoCoUKFSystem(cube_mjcf, DT, stiffness=2500.0,
                             damping_ratio=1.04)
    x0 = np.zeros(13)
    x0[0] = 1.0
    x0[6] = 0.3       # free flight (no contact): smooth propagation
    x0[10] = 0.5
    clean = system.simulate(None, x0, 10)
    noisy = clean + 0.01 * rng.standard_normal(clean.shape)
    noisy[:, :4] /= np.linalg.norm(noisy[:, :4], axis=-1, keepdims=True)
    estimate = system.ukf_estimate(noisy)
    err_est = np.linalg.norm(estimate[4:7] - clean[-1][4:7])
    err_raw = np.linalg.norm(noisy[-1][4:7] - clean[-1][4:7])
    assert np.isfinite(err_est)
    assert err_est < 0.05


def test_ukf_bias_estimate_recovers_static_offset(cube_mjcf, rng):
    """Bias-augmented UKF (reference BIAS mode, mujoco_system.py:252-372):
    measurements carry a CONSTANT configuration offset plus small dynamic
    noise; the de-biased estimate must beat the raw last measurement."""
    system = MuJoCoUKFSystem(cube_mjcf, DT, stiffness=2500.0,
                             damping_ratio=1.04, bias=True)
    assert system.P0.shape == (18, 18)      # 3 n_v tangent
    x0 = np.zeros(13)
    x0[0] = 1.0
    x0[6] = 0.3       # free flight: smooth propagation
    x0[10] = 0.5
    clean = system.simulate(None, x0, 10)
    # Constant position bias + tiny dynamic noise.
    bias = np.zeros(13)
    bias[4:7] = [0.02, -0.015, 0.01]
    noisy = clean + bias + 0.002 * rng.standard_normal(clean.shape)
    noisy[:, :4] /= np.linalg.norm(noisy[:, :4], axis=-1, keepdims=True)

    # P0/R from the noise-std mapping (bias branch).
    static = np.zeros(12)
    static[:3] = 0.02
    dynamic = np.full(12, 0.002)
    P0_diag, R_diag = MuJoCoUKFSystem.noise_stds_to_P0_R_stds(
        static, dynamic, DT, bias=True)
    assert P0_diag.size == 18 and R_diag.size == 18
    system.P0 = np.diag(P0_diag**2) + 1e-9 * np.eye(18)
    system.R = np.diag(R_diag**2) + 1e-9 * np.eye(18)

    estimate = system.ukf_bias_estimate(noisy)
    err_est = np.linalg.norm(estimate[4:7] - clean[-1][4:7])
    err_raw = np.linalg.norm(noisy[-1][4:7] - clean[-1][4:7])
    assert np.isfinite(err_est)
    assert err_est < err_raw


def test_ukf_bias_preprocess_routes(cube_mjcf):
    """preprocess_initial_condition routes to the bias estimator."""
    system = MuJoCoUKFSystem(cube_mjcf, DT, stiffness=2500.0,
                             damping_ratio=1.04, bias=True)
    x0 = np.zeros(13)
    x0[0] = 1.0
    x0[6] = 0.3
    history = system.simulate(None, x0, 3)
    estimate, _ = system.preprocess_initial_condition(None, history, None)
    assert estimate.shape == (13,)
    assert np.all(np.isfinite(estimate))
