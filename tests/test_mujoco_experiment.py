"""First-class MuJoCo cross-validation experiment tests (VERDICT item 4):
MuJoCo base system generates data, the UKF-smoothing MuJoCo system serves
as the experiment's oracle, and the evaluation statistics contain
``{set}_oracle_*`` rows produced through the experiment layer itself
(reference mujoco_experiment.py:24-44)."""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
from dair_pll_tpu.hyperparameter import Float, Int
from dair_pll_tpu.mujoco_system import MuJoCoSystem, MuJoCoUKFSystem
from dair_pll_tpu.training.config import OptimizerConfig
from dair_pll_tpu.training.mujoco_experiment import (
    MuJoCoDeepLearnableExperiment, MuJoCoExperimentConfig,
    MuJoCoMultibodyLearnableExperiment, build_mujoco_oracle_system)
from dair_pll_tpu.deep_learnable import DeepLearnableSystemConfig
from dair_pll_tpu.training.multibody_experiment import (
    MultibodyLearnableSystemConfig, MultibodyLosses)
from dair_pll_tpu.utils import file_utils

DT = 0.0068


@pytest.fixture(scope="module")
def mujoco_storage(tmp_path_factory):
    """A small MuJoCo-generated cube-toss dataset."""
    storage = str(tmp_path_factory.mktemp("mujoco_storage"))
    system = MuJoCoSystem(get_asset("cube_mjcf"), DT, stiffness=2500.0,
                          damping_ratio=1.04)
    rng = np.random.default_rng(0)
    for i in range(8):
        x0 = np.zeros(13)
        x0[0] = 1.0
        x0[4:6] = 0.01 * rng.standard_normal(2)
        x0[6] = 0.15 + 0.02 * rng.random()
        x0[7:13] = rng.standard_normal(6) * \
            np.array([1.0, 1.0, 1.0, 0.3, 0.3, 0.1])
        trajectory = system.simulate(None, x0, 19)
        file_utils.save_trajectory(storage, "learning", i,
                                   np.asarray(trajectory, np.float32))
    return storage


def make_mujoco_config(storage, run_name, learnable_config, t_history=1,
                       noise_std=1e-3):
    return MuJoCoExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25,
            slice_config=TrajectorySliceConfig(
                t_skip=t_history - 1, t_history=t_history)),
        learnable_config=learnable_config,
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(0.0), patience=10, epochs=1,
            batch_size=Int(16)),
        storage=storage, run_name=run_name,
        full_evaluation_samples=0,
        xml=get_asset("cube_mjcf"), stiffness=2500.0, damping_ratio=1.04,
        static_noise=tuple([noise_std] * 12),
        dynamic_noise=tuple([noise_std] * 12),
    )


def test_oracle_system_is_ukf(mujoco_storage):
    config = make_mujoco_config(
        mujoco_storage, "mjc_oracle",
        DeepLearnableSystemConfig(layers=2, hidden_size=32))
    experiment = MuJoCoDeepLearnableExperiment(config)
    oracle, oracle_params = experiment.get_oracle_system()
    assert isinstance(oracle, MuJoCoUKFSystem)
    assert oracle.host_stepped
    # P0/R derive from the configured noise stds (not the defaults).
    assert oracle.P0.shape == (12, 12)
    assert not np.allclose(oracle.P0, np.eye(12))
    base, _ = experiment.get_base_system()
    assert isinstance(base, MuJoCoSystem)
    assert not isinstance(base, MuJoCoUKFSystem)


def test_mujoco_deep_experiment_end_to_end(mujoco_storage):
    """One epoch + full evaluation through the experiment layer, with
    oracle rows from the UKF system."""
    config = make_mujoco_config(
        mujoco_storage, "mjc_e2e",
        DeepLearnableSystemConfig(layers=2, hidden_size=32))
    experiment = MuJoCoDeepLearnableExperiment(config)
    _, stats = experiment.generate_results(lambda *a: None)
    for key in ("train_oracle_loss_mean", "valid_oracle_loss_mean",
                "test_oracle_loss_mean",
                "train_oracle_trajectory_mse_mean",
                "train_oracle_rot_err_mean", "train_model_loss_mean"):
        assert key in stats, f"missing {key}"
        assert np.isfinite(stats[key])
    # The UKF oracle propagates the true simulator: on clean data its
    # one-step prediction loss should be far below the velocity scale.
    assert stats["test_oracle_loss_mean"] < \
        0.1 * stats["test_v_plus_squared_mean"]


def test_mujoco_multibody_experiment_oracle_binding(mujoco_storage):
    config = make_mujoco_config(
        mujoco_storage, "mjc_mb",
        MultibodyLearnableSystemConfig(
            urdfs={"cube": get_asset("cube")},
            loss=MultibodyLosses.CONTACTNETS_LOSS))
    experiment = MuJoCoMultibodyLearnableExperiment(config)
    oracle, _ = experiment.get_oracle_system()
    assert isinstance(oracle, MuJoCoUKFSystem)
    # learnable system is the JAX multibody engine
    system, params = experiment.get_learned_system()
    assert not system.host_stepped
    assert params is not None


def test_ukf_preprocess_smooths_history(mujoco_storage, rng):
    """With t_history > 1 the oracle's preprocess runs the UKF over the
    noisy history and lands nearer the true state than the raw last
    measurement."""
    noise_std = 5e-3
    config = make_mujoco_config(
        mujoco_storage, "mjc_ukf_pre",
        DeepLearnableSystemConfig(layers=2, hidden_size=16), t_history=8,
        noise_std=noise_std)
    oracle, _ = build_mujoco_oracle_system(config)
    x0 = np.zeros(13)
    x0[0] = 1.0
    x0[6] = 0.5   # free flight throughout the window
    x0[10] = 0.2
    clean = oracle.simulate(None, x0, 7)
    noisy = clean.copy()
    noisy[:, 4:7] += noise_std * rng.standard_normal((8, 3))
    smoothed, _ = oracle.preprocess_initial_condition(None, noisy, None)
    err_smoothed = np.linalg.norm(smoothed[4:7] - clean[-1, 4:7])
    err_raw = np.linalg.norm(noisy[-1, 4:7] - clean[-1, 4:7])
    assert err_smoothed < err_raw
