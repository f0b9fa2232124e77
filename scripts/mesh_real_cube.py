"""ICNN (deep-support) geometry refresh on the 550 real cube tosses
(VERDICT r2 item 6: recover <=2% diameters at <=0.040 m position error).

Identical recipe to ``results/cube_mesh_r2.json`` (120 epochs, batch 256,
50/25/25 split) plus cosine lr decay (``OptimizerConfig.lr_schedule``):
the r2 constant-lr run kept oscillating across the geometry/friction
trade-off late in training (r1 on 200 tosses landed mu=0.142 low /
diam +0.7%; r2 on 550 landed mu=0.167 high / diam +4%) — annealing the
step size settles the endpoint instead of sampling the oscillation.

Writes ``results/cube_mesh_r3.json``.

Usage: python scripts/mesh_real_cube.py [--epochs 120] [--lr 1e-3]
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
TRUE_DIAMETER = 0.1048
TRUE_MU = 0.15


@click.command()
@click.option("--storage", default="/tmp/mesh_real_cube_r3")
@click.option("--epochs", default=120)
@click.option("--lr", default=1e-3)
@click.option("--batch-size", default=256)
@click.option("--schedule", default="cosine")
@click.option("--eval-period", default=30)
@click.option("--eval-samples", default=16)
@click.option("--out", default="cube_mesh_r3.json",
              help="results/ filename for the artifact")
@click.option("--force-fused", is_flag=True, default=False,
              help="Force the fused SoA loss path at any batch size "
              "(the ICNN fast path; VERDICT r3 #3)")
def main(storage, epochs, lr, batch_size, schedule, eval_period,
         eval_samples, out, force_fused):
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
    urdf = get_asset("cube_mesh")

    config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": urdf},
            loss=MultibodyLosses.CONTACTNETS_LOSS,
            force_fused_loss=True if force_fused else None),
        optimizer_config=OptimizerConfig(
            lr=Float(lr), wd=Float(0.0), patience=epochs, epochs=epochs,
            batch_size=Int(batch_size), lr_schedule=schedule),
        storage=storage, run_name=f"mesh_{schedule}",
        full_evaluation_period=eval_period,
        full_evaluation_samples=eval_samples,
    )

    experiment = MultibodyLearnableExperiment(config)

    def cb(epoch, params, train_loss, best_valid):
        if epoch % 10 == 0:
            click.echo(f"epoch {epoch}: train {train_loss:.6g} "
                       f"best valid {best_valid:.6g}")

    start = time.time()
    best_params, stats = experiment.generate_results(cb)
    elapsed = time.time() - start

    # Wall-time split from the epoch log: the 120-epoch ICNN run is
    # dominated by overlay-video rendering at evaluation epochs (~150 s
    # each on this 1-core host) and the first-epoch compile, NOT by the
    # training loss — record the split so wall_seconds can't be
    # misattributed to the loss path.
    split = {"training": 0.0, "evaluation": 0.0, "logging": 0.0}
    steady = []
    log_path = os.path.join(storage, "runs", f"mesh_{schedule}",
                            "log.jsonl")
    if os.path.exists(log_path):
        with open(log_path, encoding="utf-8") as handle:
            for line in handle:
                row = json.loads(line)
                split["training"] += row.get("training_duration", 0.0)
                split["evaluation"] += row.get("evaluation_duration", 0.0)
                split["logging"] += row.get("logging_duration", 0.0)
                if row.get("epoch", 0) >= 2 and "training_duration" in row:
                    steady.append(row["training_duration"])
    split = {k: round(v, 1) for k, v in split.items()}
    if steady:
        split["steady_state_train_s_per_epoch"] = round(
            sum(steady) / len(steady), 4)

    means = {k: float(v) for k, v in sorted(stats.items())
             if k.endswith("_mean")}
    scalars = experiment.learned_system.summary(best_params, {}).scalars
    diameters = [float(scalars[f"cube::body_diameter_{ax}"])
                 for ax in "xyz"]
    mu = float(scalars["cube::body_mu"])

    record = {
        "config": {
            "epochs": epochs, "batch": batch_size, "dt": DT, "lr": lr,
            "lr_schedule": schedule, "force_fused_loss": force_fused,
            "geometry": "deep_support_convex (ICNN) learned from scratch",
            "dataset": f"{count} real cube tosses", "split": "50/25/25",
        },
        "learned": {
            "mu": round(mu, 4),
            "diameters": [round(d, 4) for d in diameters],
            "diameter_errors_pct": [
                round(100 * (d / TRUE_DIAMETER - 1), 2) for d in diameters],
            "ground_truth": {"mu": TRUE_MU, "diameter": TRUE_DIAMETER},
        },
        "final_statistics_means": means,
        "wall_seconds": round(elapsed, 1),
        "wall_seconds_split": split,
    }
    out = os.path.join(REPO_ROOT, "results", out)
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(record, handle, indent=1, default=float)
    click.echo(json.dumps(record["learned"]))
    click.echo(f"wrote {out}")


if __name__ == "__main__":
    main()
