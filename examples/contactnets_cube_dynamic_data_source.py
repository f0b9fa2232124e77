"""Cube ContactNets experiment with a dynamically growing dataset.

Rebuild of the reference's
``examples/contactnets_cube_dynamic_data_source.py``: trajectories are
drip-fed into the storage tree while training runs with
``DataConfig.update_dynamically = True`` — each epoch re-scans the data
directory and folds newly arrived trajectories into the (persisted)
train/valid/test split.

Here the drip-feed is simulated in-process: every ``--drip-period`` epochs
another batch of source trajectories is copied into storage.
"""
import os
import sys

import click
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DT = 0.0068


@click.command()
@click.option("--source-data-dir", required=True,
              help="Directory of trajectories to drip-feed (.pt or .npy).")
@click.option("--storage", default="./storage_dynamic")
@click.option("--run-name", default="cube_dynamic")
@click.option("--epochs", default=200)
@click.option("--drip-period", default=10,
              help="Epochs between data arrivals.")
@click.option("--drip-size", default=32,
              help="Trajectories per arrival.")
def main(source_data_dir, storage, run_name, epochs, drip_period,
         drip_size):
    from glob import glob

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.utils import file_utils

    sources = sorted(
        glob(os.path.join(source_data_dir, "*.pt")) +
        glob(os.path.join(source_data_dir, "*.npy")))
    assert sources, f"no trajectories in {source_data_dir}"

    state = {"next": 0}

    def drip():
        end = min(state["next"] + drip_size, len(sources))
        for i in range(state["next"], end):
            trajectory = file_utils.load_trajectory(sources[i])
            file_utils.save_trajectory(
                storage, file_utils.LEARNING_SUBDIR, i,
                trajectory.astype(np.float32))
        added = end - state["next"]
        state["next"] = end
        return added

    drip()  # initial batch

    urdf = get_asset("cube")
    config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig(),
            update_dynamically=True),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": urdf},
            loss=MultibodyLosses.CONTACTNETS_LOSS),
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(0.0), patience=epochs, epochs=epochs,
            batch_size=Int(256)),
        storage=storage, run_name=run_name,
    )

    experiment = MultibodyLearnableExperiment(config)

    def epoch_callback(epoch, params, train_loss, best_valid):
        if epoch % drip_period == 0 and state["next"] < len(sources):
            added = drip()
            click.echo(f"epoch {epoch}: dripped {added} trajectories "
                       f"(total {state['next']})")
        if epoch % 10 == 0:
            click.echo(f"epoch {epoch}: train {train_loss:.6g} "
                       f"best valid {best_valid:.6g}")

    best_params, stats = experiment.generate_results(epoch_callback)
    click.echo("final valid loss: "
               f"{stats.get('valid_model_loss_mean', float('nan')):.6g}")


if __name__ == "__main__":
    main()
