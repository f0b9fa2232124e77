"""Deep learnable (MLP / recurrent) dynamics baselines on cube-toss data.

Rebuild of the reference's deep-learnable baseline flow
(``deep_learnable_system.py`` + ``experiment.py`` prediction loss):
train a black-box MLP or GRU dynamics model on the same trajectory
batches as the structured ContactNets model, for apples-to-apples
comparison (BASELINE config 4).
"""
import os
import sys

import click
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DT = 0.0068


@click.command()
@click.option("--model", "model_kind",
              type=click.Choice(["mlp", "recurrent"]), default="mlp")
@click.option("--storage", default="./storage",
              help="Storage tree with data/learning trajectories "
                   "(e.g. produced by contactnets_simple.py).")
@click.option("--run-name", default=None)
@click.option("--epochs", default=200)
@click.option("--hidden-size", default=128)
@click.option("--layers", default=2)
@click.option("--t-history", default=1,
              help="History window (recurrent warm-up length).")
def main(model_kind, storage, run_name, epochs, hidden_size, layers,
         t_history):
    import jax

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.deep_learnable import (DeepLearnableSystem,
                                             DeepLearnableSystemConfig)
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.experiment import (
        SupervisedLearningExperiment)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodySystemConfig)
    from dair_pll_tpu.urdf import build_multibody_model

    run_name = run_name or f"deep_{model_kind}"
    deep_config = DeepLearnableSystemConfig(
        integrator_kind="velocity", layers=layers,
        hidden_size=hidden_size, model_kind=model_kind)

    class DeepBaselineExperiment(SupervisedLearningExperiment):
        """Prediction-loss experiment with a deep learnable system."""

        def get_base_system(self):
            model = build_multibody_model({"cube": get_asset("cube")})
            system = MultibodyLearnableSystem(model, DT)
            return system, model.initial_params()

        def get_learned_system(self):
            base_system, _ = self.get_base_system()
            system = DeepLearnableSystem(
                base_system, deep_config, jax.random.PRNGKey(0))
            return system, system.initial_params()

    config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25,
            slice_config=TrajectorySliceConfig(
                t_skip=max(0, t_history - 1), t_history=t_history)),
        base_config=MultibodySystemConfig(
            urdfs={"cube": get_asset("cube")}),
        learnable_config=deep_config,
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(0.0), patience=epochs,
            epochs=epochs, batch_size=Int(256)),
        storage=storage, run_name=run_name,
    )

    experiment = DeepBaselineExperiment(config)

    def epoch_callback(epoch, params, train_loss, best_valid):
        if epoch % 10 == 0:
            click.echo(f"epoch {epoch}: train {train_loss:.6g} "
                       f"best valid {best_valid:.6g}")

    best_params, stats = experiment.generate_results(epoch_callback)
    click.echo("\nfinal statistics:")
    for key in sorted(stats):
        if key.endswith("_mean"):
            click.echo(f"  {key}: {stats[key]:.6g}")


if __name__ == "__main__":
    main()
