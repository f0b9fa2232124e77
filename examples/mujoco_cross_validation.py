"""MuJoCo cross-validation study with UKF smoothing (BASELINE config 5).

Rebuild of the reference's ``mujoco_experiment.py`` flow: a MuJoCo
soft-contact simulator (templated solref stiffness/damping) generates or
serves as the oracle for cube-toss data; a manifold-UKF smoothing oracle
estimates states from noisy measurements; the structured learnable model
trains on the same data and is compared against the UKF oracle.
"""
import os
import sys

import click
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DT = 0.0068


@click.command()
@click.option("--stiffness", default=2500.0)
@click.option("--damping-ratio", default=1.04)
@click.option("--n-pop", default=64)
@click.option("--trajectory-length", default=60)
@click.option("--noise-std", default=0.005)
@click.option("--storage", default="./storage_mujoco")
@click.option("--epochs", default=100)
def main(stiffness, damping_ratio, n_pop, trajectory_length, noise_std,
         storage, epochs):
    import jax
    import jax.numpy as jnp

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.mujoco_system import (MuJoCoSystem, MuJoCoUKFSystem)
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.utils import file_utils

    mjcf = get_asset("cube_mjcf")
    oracle = MuJoCoUKFSystem(mjcf, DT, stiffness, damping_ratio)
    space = oracle.space
    rng = np.random.default_rng(0)

    # Generate MuJoCo ground truth, add measurement noise, and smooth a
    # sample with the UKF oracle for comparison.
    click.echo("generating MuJoCo trajectories...")
    ukf_improvements = []
    for index in range(n_pop):
        x0 = np.zeros(13)
        rot = 0.5 * rng.standard_normal(3)
        angle = np.linalg.norm(rot)
        axis = rot / (angle + 1e-12)
        x0[0] = np.cos(angle / 2)
        x0[1:4] = axis * np.sin(angle / 2)
        x0[4:6] = 0.02 * rng.standard_normal(2)
        x0[6] = 0.15 + 0.05 * rng.random()
        x0[7:10] = 2.0 * rng.standard_normal(3)
        x0[10:12] = 0.5 * rng.standard_normal(2)
        clean = oracle.simulate(None, x0, trajectory_length - 1)
        noisy = clean + noise_std * rng.standard_normal(clean.shape)
        noisy[:, :4] /= np.linalg.norm(noisy[:, :4], axis=-1,
                                       keepdims=True)
        file_utils.save_trajectory(storage, "ground_truth", index,
                                   clean.astype(np.float32))
        file_utils.save_trajectory(storage, "learning", index,
                                   noisy.astype(np.float32))
        if index < 3:
            # UKF-smooth the first few free-flight prefixes as an oracle
            # quality check (reference mujoco_experiment.py:47-199).
            window = noisy[:10]
            estimate = oracle.ukf_estimate(window)
            err_raw = float(np.linalg.norm(
                window[-1][4:7] - clean[9][4:7]))
            err_ukf = float(np.linalg.norm(
                estimate[4:7] - clean[9][4:7]))
            ukf_improvements.append((err_raw, err_ukf))
    click.echo(f"UKF position errors (raw vs smoothed): "
               f"{ukf_improvements}")

    from dair_pll_tpu.training.mujoco_experiment import (
        MuJoCoExperimentConfig, MuJoCoMultibodyLearnableExperiment)

    urdf = get_asset("cube")
    config = MuJoCoExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": urdf},
            loss=MultibodyLosses.CONTACTNETS_LOSS),
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(0.0), patience=epochs,
            epochs=epochs, batch_size=Int(256)),
        storage=storage, run_name="mujoco_cross_validation",
        xml=mjcf, stiffness=stiffness, damping_ratio=damping_ratio,
        static_noise=tuple([noise_std] * 12),
        dynamic_noise=tuple([noise_std] * 12),
    )
    # First-class MuJoCo cross-validation: the MuJoCo simulator is the
    # base system and the UKF-smoothing system is the oracle evaluated
    # alongside the learned model (reference mujoco_experiment.py:24-44).
    experiment = MuJoCoMultibodyLearnableExperiment(config)

    def epoch_callback(epoch, params, train_loss, best_valid):
        if epoch % 10 == 0:
            click.echo(f"epoch {epoch}: train {train_loss:.6g} "
                       f"best valid {best_valid:.6g}")

    best_params, stats = experiment.generate_results(epoch_callback)
    click.echo("\nfinal statistics (learned on MuJoCo data):")
    for key in sorted(stats):
        if key.endswith("_mean"):
            click.echo(f"  {key}: {stats[key]:.6g}")


if __name__ == "__main__":
    main()
