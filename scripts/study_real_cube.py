"""Real-scale hyperparameter study on the 550 real cube tosses
(VERDICT r2 item 9): Sobol-sampled trials + successive halving over the
ContactNets lr/wd/batch space, recorded to ``results/study_real_cube.json``.

Usage: python scripts/study_real_cube.py [--n-trials 8] [--max-epochs 48]
"""
import json
import os
import sys
import time

import click
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

REAL_DATA_DIR = "/root/reference/assets/contactnets_cube"
DT = 0.0068


@click.command()
@click.option("--storage", default="/tmp/study_real_cube")
@click.option("--n-trials", default=8)
@click.option("--max-epochs", default=48)
@click.option("--sampler", default="sobol",
              type=click.Choice(("sobol", "tpe", "random")),
              help="'tpe' = Sobol exploration then Parzen-surrogate "
                   "exploitation (VERDICT r4 item 9: compare vs the "
                   "sobol baseline at equal trial budget)")
@click.option("--out-name", default=None,
              help="results/<out-name>.json (default: "
                   "study_real_cube[_<sampler>])")
def main(storage, n_trials, max_epochs, sampler, out_name):
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
    from dair_pll_tpu.study import Study, StudyConfig
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.utils import file_utils

    count = file_utils.import_data_to_storage(storage, REAL_DATA_DIR)
    click.echo(f"imported {count} real trajectories")

    urdf = get_asset("cube")
    base_config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": urdf},
            loss=MultibodyLosses.CONTACTNETS_LOSS,
            # Pinned cold so sampler comparisons stay commensurate
            # with the round-3 sobol baseline (warm solves are opt-in
            # and change the trained objective — warm_real_cube.json).
            use_warm_loss=False),
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(1e-6), patience=max_epochs,
            epochs=max_epochs, batch_size=Int(256)),
        storage=storage, run_name="study",
        full_evaluation_period=8, full_evaluation_samples=16,
        video_period=0,
    )

    study = Study(StudyConfig(
        experiment_factory=MultibodyLearnableExperiment,
        base_config=base_config, study_name=f"real_cube_study_{sampler}",
        n_trials=n_trials, min_epochs=max(2, max_epochs // 8),
        sampler=sampler))

    start = time.time()
    best = study.optimize_hyperparameters()
    elapsed = time.time() - start
    click.echo(f"best hyperparameters: {best} ({elapsed:.0f}s)")

    hp_path = os.path.join(
        file_utils.study_dir(storage, f"real_cube_study_{sampler}"),
        "optimal_hyperparameters.json")
    with open(hp_path, "r", encoding="utf-8") as handle:
        record = json.load(handle)
    record["wall_seconds"] = elapsed
    record["dataset"] = f"{count} real cube tosses"
    record["sampler"] = f"{sampler} + successive halving"
    if out_name is None:
        out_name = "study_real_cube" if sampler == "sobol" else \
            f"study_real_cube_{sampler}"
    out = os.path.join(REPO_ROOT, "results", f"{out_name}.json")
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(record, handle, indent=1, default=float)
    click.echo(f"wrote {out}")


if __name__ == "__main__":
    main()
