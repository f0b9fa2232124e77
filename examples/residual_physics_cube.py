"""Residual physics demo: structured contact model + learned correction.

Generates cube-toss data from a "true" system with an unmodeled linear
velocity drag (an effect outside the Anitescu model class), then trains
the composite :class:`ResidualPhysicsSystem` — structured contact
dynamics plus an MLP velocity residual — with the prediction loss,
comparing against the structured-only fit (round-1 ROADMAP item 12).

Usage:
  python examples/residual_physics_cube.py --epochs 30 --n-pop 64
"""
import os
import sys

import click
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

DT = 0.0068
TRAJECTORY_LENGTH = 60
DRAG = 0.08


@click.command()
@click.option("--epochs", default=30)
@click.option("--n-pop", default=64)
@click.option("--storage", default="./storage_residual")
@click.option("--drag/--no-drag", "use_drag", default=True,
              help="add unmodeled drag to the data-generating system")
def main(epochs, n_pop, storage, use_drag):
    import jax
    import jax.numpy as jnp

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.data.generation import (DataGenerationConfig,
                                              ExperimentDatasetGenerator)
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.integrator import Integrator
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.residual import (ResidualPhysicsExperiment,
                                       ResidualPhysicsLearnableConfig)
    from dair_pll_tpu.state_space import UniformSampler
    from dair_pll_tpu.system import System
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.experiment import (
        SupervisedLearningExperiment)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodySystemConfig)
    from dair_pll_tpu.urdf import build_multibody_model

    urdf = get_asset("cube")
    model = build_multibody_model({"cube": urdf})
    structured_true = MultibodyLearnableSystem(model, DT)
    params_true = model.initial_params()

    class DraggedCubeSystem(System):
        """Ground truth: contact dynamics + linear velocity drag."""

        def __init__(self):
            space = structured_true.space
            super().__init__(space, Integrator(
                space, self._partial_step, DT, "velocity"))

        def _partial_step(self, params, x, carry):
            q, v = self.space.q_v(x)
            v_plus = structured_true.forward_dynamics(
                params, q, v, jnp.zeros((0,), x.dtype))
            if use_drag:
                v_plus = v_plus - DRAG * v
            return v_plus, carry

    true_system = DraggedCubeSystem()
    space = true_system.space
    x_0 = np.array(space.zero_state(jnp.float32))
    x_0[6] = 0.21
    ranges = np.ones(2 * space.n_v, dtype=np.float32)
    ranges[:3] = 2 * np.pi
    ranges[3:5] = 0.02
    ranges[5] = 0.05
    ranges[space.n_v:space.n_v + 3] = 4.0
    ranges[space.n_v + 3:space.n_v + 6] = 1.0
    sampler = UniformSampler(space, jnp.asarray(ranges),
                             x_0=jnp.asarray(x_0))
    generated = ExperimentDatasetGenerator(
        true_system, sampler, params_true,
        DataGenerationConfig(dt=DT, n_pop=n_pop,
                             trajectory_length=TRAJECTORY_LENGTH,
                             static_noise=None,
                             dynamic_noise=None)).generate(storage)
    click.echo(f"generated {generated} trajectories "
               f"(drag={'on' if use_drag else 'off'})")

    class ResidualCubeExperiment(ResidualPhysicsExperiment,
                                 SupervisedLearningExperiment):
        def get_base_system(self):
            return true_system, params_true

    config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=ResidualPhysicsLearnableConfig(
            urdfs={"cube": urdf}),
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(0.0), patience=epochs,
            epochs=epochs, batch_size=Int(256)),
        full_evaluation_period=max(1, epochs // 2),
        full_evaluation_samples=8,
        storage=storage, run_name="residual_cube", run_wandb=False,
    )

    experiment = ResidualCubeExperiment(config)

    def epoch_callback(epoch, params, train_loss, best_valid):
        if epoch % 5 == 0:
            click.echo(f"epoch {epoch}: train {train_loss:.6g} "
                       f"best valid {best_valid:.6g}")

    best_params, stats = experiment.generate_results(epoch_callback)
    click.echo("\nfinal statistics:")
    for key in sorted(stats):
        if key.endswith("_mean"):
            click.echo(f"  {key}: {stats[key]:.6g}")


if __name__ == "__main__":
    main()
