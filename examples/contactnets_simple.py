"""Canonical cube/elbow ContactNets system-identification driver.

TPU-native rebuild of the reference's
``examples/contactnets_simple.py`` (reference :52-268): identify inertia,
friction, and geometry of a cube (or articulated elbow) from tossed
trajectories, using either the ContactNets implicit loss or the
trajectory-prediction loss, from simulated or real data, with box or
learned-mesh geometry.

Defaults mirror the reference experiment constants: dt = 0.0068 s
(reference :52), 256 simulated trajectories (:55), trajectory lengths
80/120 (:72), Adam lr 1e-3, 500 epochs, patience 500, batch 256 (:78-86).

Usage::

    python examples/contactnets_simple.py --system cube --source simulation
    python examples/contactnets_simple.py --system cube --source real \
        --real-data-dir /path/to/contactnets_cube
"""
import os
import sys

import click
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DT = 0.0068
N_POP = 256
TRAJECTORY_LENGTHS = {"cube": 80, "elbow": 120}
LEARNING_RATE = 1e-3
EPOCHS = 500
PATIENCE = 500
BATCH_SIZE = 256


@click.command()
@click.option("--system", type=click.Choice(["cube", "elbow"]),
              default="cube")
@click.option("--source", type=click.Choice(["simulation", "real"]),
              default="simulation")
@click.option("--contactnets/--prediction", default=True,
              help="ContactNets implicit loss vs prediction loss.")
@click.option("--box/--mesh", default=True,
              help="Box geometry vs learned deep-support mesh.")
@click.option("--real-data-dir", default=None,
              help="Directory of real trajectories (.pt or .npy).")
@click.option("--storage", default="./storage")
@click.option("--run-name", default=None)
@click.option("--epochs", default=EPOCHS)
@click.option("--n-pop", default=N_POP)
@click.option("--eval-period", default=1,
              help="epochs between full trajectory evaluations")
@click.option("--eval-samples", default=5,
              help="trajectories sampled per full evaluation")
@click.option("--wandb/--no-wandb", "use_wandb", default=False)
def main(system, source, contactnets, box, real_data_dir, storage,
         run_name, epochs, n_pop, eval_period, eval_samples, use_wandb):
    """Runs the ContactNets sys-id experiment end to end."""
    import jax
    import jax.numpy as jnp

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.data.generation import (DataGenerationConfig,
                                              ExperimentDatasetGenerator)
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.state_space import UniformSampler
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.urdf import build_multibody_model
    from dair_pll_tpu.utils import file_utils

    urdf = get_asset(system if box else f"{system}_mesh")
    run_name = run_name or (
        f"{system}_{source}_"
        f"{'contactnets' if contactnets else 'prediction'}_"
        f"{'box' if box else 'mesh'}")

    if source == "real":
        assert system == "cube", "real data is available for the cube"
        assert real_data_dir, "--real-data-dir is required with --source real"
        count = file_utils.import_data_to_storage(storage, real_data_dir)
        click.echo(f"imported {count} real trajectories")
    else:
        # Ground-truth generator: exact polygon hulls for mesh geometry
        # (the random-init deep support network is for learning only).
        model = build_multibody_model({system: urdf},
                                      mesh_representation="polygon")
        base = MultibodyLearnableSystem(model, DT)
        params = model.initial_params()
        space = base.space
        # Initial-condition distribution: tossed above the plane with
        # randomized pose and velocity (role of reference :57-71).
        x_0 = np.array(space.zero_state(jnp.float32))
        x_0[6] = 0.21 if system == "cube" else 0.3
        ranges = np.ones(2 * space.n_v, dtype=np.float32)
        ranges[:3] = 2 * np.pi          # orientation
        ranges[3:5] = 0.02              # x/y position
        ranges[5] = 0.05                # height
        ranges[space.n_v:space.n_v + 3] = 4.0    # angular velocity
        ranges[space.n_v + 3:space.n_v + 6] = 1.0  # linear velocity
        sampler = UniformSampler(space, jnp.asarray(ranges),
                                 x_0=jnp.asarray(x_0))
        generator = ExperimentDatasetGenerator(
            base, sampler, params,
            DataGenerationConfig(
                dt=DT, n_pop=n_pop,
                trajectory_length=TRAJECTORY_LENGTHS[system],
                static_noise=None, dynamic_noise=None))
        generated = generator.generate(storage)
        click.echo(f"generated {generated} trajectories")

    config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={system: urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={system: urdf},
            loss=(MultibodyLosses.CONTACTNETS_LOSS if contactnets else
                  MultibodyLosses.PREDICTION_LOSS)),
        optimizer_config=OptimizerConfig(
            lr=Float(LEARNING_RATE), wd=Float(0.0), patience=PATIENCE,
            epochs=epochs, batch_size=Int(BATCH_SIZE)),
        full_evaluation_period=eval_period,
        full_evaluation_samples=eval_samples,
        storage=storage, run_name=run_name, run_wandb=use_wandb,
    )

    experiment = MultibodyLearnableExperiment(config)

    def epoch_callback(epoch, params, train_loss, best_valid):
        if epoch % 10 == 0:
            click.echo(f"epoch {epoch}: train {train_loss:.6g} "
                       f"best valid {best_valid:.6g}")

    best_params, stats = experiment.generate_results(epoch_callback)
    experiment.generate_updated_urdfs(best_params)

    click.echo("\nfinal statistics:")
    for key in sorted(stats):
        if key.endswith("_mean"):
            click.echo(f"  {key}: {stats[key]:.6g}")


if __name__ == "__main__":
    main()
