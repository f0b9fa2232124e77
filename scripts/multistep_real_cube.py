"""1-step vs multi-step implicit ContactNets on the 550 real cube tosses
(VERDICT r2 item 8 / ROADMAP item 11).

Trains two identically-budgeted runs that differ only in the loss window:

* ``onestep``  — standard ContactNets transition loss (t_prediction=1).
* ``multistep`` — the implicit loss summed over a ``--t-prediction``-step
  window, the model's own rematerialized rollout supplying each step's
  preimpact state (``contactnets_multistep=True``).

Records both runs' final statistics + learned physical parameters to
``results/multistep_real_cube.json``.

Usage: python scripts/multistep_real_cube.py [--epochs 200]
       [--t-prediction 4]
"""
import json
import os
import sys
import time

import click

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

REAL_DATA_DIR = "/root/reference/assets/contactnets_cube"
DT = 0.0068


@click.command()
@click.option("--storage", default="/tmp/multistep_real_cube")
@click.option("--epochs", default=200)
@click.option("--batch-size", default=256)
@click.option("--t-prediction", default=4)
@click.option("--eval-period", default=25)
@click.option("--eval-samples", default=16)
def main(storage, epochs, batch_size, t_prediction, eval_period,
         eval_samples):
    import jax
    if jax.devices()[0].platform == "tpu":
        # TPU-only: this jax's XLA:CPU AOT deserialization is not
        # roundtrip-safe (see CLAUDE.md).
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(REPO_ROOT, ".jax_cache"))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 10.0)

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.utils import file_utils

    count = file_utils.import_data_to_storage(storage, REAL_DATA_DIR)
    click.echo(f"imported {count} real trajectories")
    urdf = get_asset("cube")

    record = {
        "config": {
            "epochs": epochs, "batch": batch_size, "dt": DT,
            "dataset": f"{count} real cube tosses", "split": "50/25/25",
            "t_prediction_multistep": t_prediction,
            "eval_period": eval_period, "eval_samples": eval_samples,
        },
        "runs": {},
    }

    for name, multistep in (("onestep", False), ("multistep", True)):
        t_pred = t_prediction if multistep else 1
        config = SupervisedLearningExperimentConfig(
            data_config=DataConfig(
                dt=DT, train_fraction=0.5, valid_fraction=0.25,
                test_fraction=0.25,
                slice_config=TrajectorySliceConfig(
                    t_prediction=t_pred)),
            base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
            learnable_config=MultibodyLearnableSystemConfig(
                urdfs={"cube": urdf},
                loss=MultibodyLosses.CONTACTNETS_LOSS,
                contactnets_multistep=multistep),
            optimizer_config=OptimizerConfig(
                lr=Float(1e-3), wd=Float(1e-6), patience=epochs,
                epochs=epochs, batch_size=Int(batch_size)),
            storage=storage, run_name=name,
            full_evaluation_period=eval_period,
            full_evaluation_samples=eval_samples,
        )
        experiment = MultibodyLearnableExperiment(config)
        start = time.time()
        best_params, stats = experiment.generate_results()
        elapsed = time.time() - start
        means = {k: float(v) for k, v in sorted(stats.items())
                 if k.endswith("_mean")}
        scalars = experiment.learned_system.summary(best_params, {}).scalars
        record["runs"][name] = {
            "wall_seconds": round(elapsed, 1),
            "final_statistics_means": means,
            "learned_parameters": {k: float(v)
                                   for k, v in sorted(scalars.items())},
        }
        click.echo(f"{name}: test_pos_err="
                   f"{means.get('test_model_pos_err_mean')} "
                   f"({elapsed:.0f}s)")

    out = os.path.join(REPO_ROOT, "results", "multistep_real_cube.json")
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(record, handle, indent=1, default=float)
    click.echo(f"wrote {out}")


if __name__ == "__main__":
    main()
