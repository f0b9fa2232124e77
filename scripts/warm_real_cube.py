"""End-to-end three-arm ContactNets training battery on the 550 real
cube tosses (round-5: VERDICT-r4 items 2/3/6 in one run).

Identically-budgeted runs differing only in the loss-solve policy:
cold (10,6) production default, cold (10,10) gradient-correctness
candidate, and the epoch-warm path (impulse cache seeded by one
full-budget epoch, then ``warm_solver_budget`` warm-started epochs —
``MultibodyLearnableSystemConfig.use_warm_loss``,
``learnable_system.contactnets_loss_batch_warm``). Gradient-level
accuracy of the warm budget is validated by
``scripts/warm_loss_battery.py`` and multi-epoch stability by
``scripts/diag_warm_divergence.py``; this script checks the thing that
actually matters — final parameter recovery and test statistics parity
on real data.

Writes ``results/warm_real_cube.json``.
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
@click.option("--storage", default="/tmp/warm_real_cube")
@click.option("--epochs", default=500)
@click.option("--batch-size", default=256)
@click.option("--warm-budget", default=None,
              help="ipm,newton for warm epochs (default: "
                   "DEFAULT_LOSS_WARM_BUDGET)")
@click.option("--eval-period", default=100)
@click.option("--eval-samples", default=4)
def main(storage, epochs, batch_size, warm_budget, eval_period,
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

    budget = tuple(int(v) for v in warm_budget.split(",")) \
        if warm_budget else None

    count = file_utils.import_data_to_storage(storage, REAL_DATA_DIR)
    click.echo(f"imported {count} real trajectories")
    urdf = get_asset("cube")

    record = {
        "config": {
            "epochs": epochs, "batch": batch_size, "dt": DT,
            "dataset": f"{count} real cube tosses", "split": "50/25/25",
            "warm_budget": list(budget) if budget else "default",
            "eval_period": eval_period, "eval_samples": eval_samples,
        },
        "runs": {},
    }

    # Three arms (VERDICT r4 items 2/3/6 in one battery):
    #   cold_10_6  — the production default budget (flagship refresh);
    #   cold_10_10 — the gradient-correctness candidate default (the
    #                (10,6) budget leaves ~4.7% batch-gradient error on
    #                real data at wrong-init params,
    #                results/grad_precision_real_cube.json; (10,10)
    #                cuts it to ~6e-4 at ~1.25x solve cost);
    #   warm_<i>_<n> — epoch-warm solves at the round-5 default budget
    #                (DEFAULT_LOSS_WARM_BUDGET — (4,10): the short IPM
    #                central path is required for multi-epoch stability,
    #                scripts/diag_warm_divergence.py), seeded by one
    #                full-budget epoch.
    # All arms force the fused SoA loss (several times faster per step
    # at batch 256; the warm path requires it anyway).
    from dair_pll_tpu.multibody.learnable_system import (
        DEFAULT_LOSS_WARM_BUDGET)
    warm_eff = budget or DEFAULT_LOSS_WARM_BUDGET
    # Order: the cold flagship refresh and the warm A/B first (they
    # decide the round-5 production default — outcome: warm stays
    # OPT-IN, see the use_warm_loss config docstring); the (10,10)
    # candidate last. The artifact is (re)written after EVERY arm so a
    # truncated battery still leaves committed evidence.
    arms = (("cold_10_6", False, None),
            (f"warm_{warm_eff[0]}_{warm_eff[1]}", True, None),
            ("cold_10_10", False, (10, 10)))
    out = os.path.join(REPO_ROOT, "results", "warm_real_cube.json")
    for name, warm, solver_budget in arms:
        config = SupervisedLearningExperimentConfig(
            data_config=DataConfig(
                dt=DT, train_fraction=0.5, valid_fraction=0.25,
                test_fraction=0.25,
                slice_config=TrajectorySliceConfig()),
            base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
            learnable_config=MultibodyLearnableSystemConfig(
                urdfs={"cube": urdf},
                loss=MultibodyLosses.CONTACTNETS_LOSS,
                use_warm_loss=warm, warm_solver_budget=budget,
                loss_solver_budget=solver_budget,
                force_fused_loss=True),
            optimizer_config=OptimizerConfig(
                lr=Float(1e-3), wd=Float(1e-6), patience=epochs,
                epochs=epochs, batch_size=Int(batch_size)),
            storage=storage, run_name=f"warmcmp_{name}",
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
        log_path = os.path.join(storage, "runs", f"warmcmp_{name}",
                                "log.jsonl")
        durations = {"training_duration": 0.0,
                     "evaluation_duration": 0.0,
                     "logging_duration": 0.0}
        if os.path.exists(log_path):
            with open(log_path, encoding="utf-8") as handle:
                for line in handle:
                    row = json.loads(line)
                    for key in durations:
                        durations[key] += row.get(key, 0.0)
        train_s = durations["training_duration"]
        record["runs"][name] = {
            "wall_seconds": round(elapsed, 1),
            "wall_seconds_split": {k: round(v, 1)
                                   for k, v in durations.items()},
            "training_seconds": round(train_s, 1),
            "final_statistics_means": means,
            "learned_parameters": {k: float(v)
                                   for k, v in sorted(scalars.items())},
        }
        with open(out, "w", encoding="utf-8") as handle:
            json.dump(record, handle, indent=1, default=float)
        click.echo(f"{name}: test_pos_err="
                   f"{means.get('test_model_pos_err_mean')} "
                   f"train_s={train_s:.1f} ({elapsed:.0f}s); wrote {out}")

    click.echo("battery complete")


if __name__ == "__main__":
    main()
