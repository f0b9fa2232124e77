"""Cube hyperparameter study (rebuild of the reference ``study.py``
``__main__`` flow, ``/root/reference/dair_pll/study.py:163-203``): optimize
ContactNets training hyperparameters on simulated cube tosses with
Sobol/TPE sampling + successive halving, then run a dataset-size sweep at
the optimum.
"""
import os
import sys

import click
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DT = 1.0 / 148.0  # study time step (reference study.py:174)


@click.command()
@click.option("--storage", default="./storage_study")
@click.option("--n-trials", default=8)
@click.option("--max-epochs", default=32)
@click.option("--n-pop", default=64)
@click.option("--sweep/--no-sweep", default=False,
              help="Also run a dataset-size sweep at the optimum.")
@click.option("--sampler", default="sobol",
              type=click.Choice(["sobol", "tpe", "random"]),
              help="Trial sampler (tpe = Sobol explore then "
                   "Parzen-surrogate exploit).")
def main(storage, n_trials, max_epochs, n_pop, sweep, sampler):
    import jax.numpy as jnp

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.data.generation import (DataGenerationConfig,
                                              ExperimentDatasetGenerator)
    from dair_pll_tpu.hyperparameter import Float, Int, load_suggestion
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.state_space import UniformSampler
    from dair_pll_tpu.study import Study, StudyConfig
    from dair_pll_tpu.sweep_plot import plot_sweep_metric
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.urdf import build_multibody_model

    urdf = get_asset("cube")

    def generate_data(n_target):
        model = build_multibody_model({"cube": urdf})
        base = MultibodyLearnableSystem(model, DT)
        params = model.initial_params()
        space = base.space
        x_0 = np.array(space.zero_state(jnp.float32))
        x_0[6] = 0.21
        ranges = np.ones(2 * space.n_v, dtype=np.float32)
        ranges[:3] = 2 * np.pi
        ranges[3:6] = 0.05
        ranges[space.n_v:space.n_v + 3] = 4.0
        ranges[space.n_v + 3:] = 1.0
        sampler = UniformSampler(space, jnp.asarray(ranges),
                                 x_0=jnp.asarray(x_0))
        ExperimentDatasetGenerator(
            base, sampler, params,
            DataGenerationConfig(dt=DT, n_pop=n_target,
                                 trajectory_length=80)).generate(storage)

    generate_data(n_pop)

    base_config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": urdf}, loss=MultibodyLosses.CONTACTNETS_LOSS),
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(1e-6), patience=max_epochs,
            epochs=max_epochs, batch_size=Int(64)),
        storage=storage, run_name="study",
    )

    study = Study(StudyConfig(
        experiment_factory=MultibodyLearnableExperiment,
        base_config=base_config, study_name="cube_study",
        n_trials=n_trials, min_epochs=max(2, max_epochs // 8),
        sampler=sampler))

    best = study.optimize_hyperparameters()
    click.echo(f"best hyperparameters: {best}")

    if sweep:
        load_suggestion(base_config, best)
        results = study.run_datasweep_sample(
            [n_pop // 4, n_pop // 2, n_pop], generate_data)
        path = plot_sweep_metric(
            results, "test_model_trajectory_mse_mean",
            os.path.join(storage, "plots"))
        click.echo(f"sweep plot: {path}")


if __name__ == "__main__":
    main()
