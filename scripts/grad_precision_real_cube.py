"""Gradient-precision effect measurement (VERDICT r3 #5).

What the ~13% median f32 parameter-gradient noise
(``results/tpu_kernel_parity.json``) actually is, and what it costs:

1. **Diagnosis (batch-gradient sweep).** On a batch of real cube-toss
   transitions at perturbed (wrong-init) parameters, compare the batch
   parameter gradient across solver budgets and dtypes against an
   f64 (30,30) referee. Measured on CPU-f64 ahead of this script
   (reproduced here): the noise is NOT f32 arithmetic — it is the
   (10,6)-budget solve stalling on a handful of hard real-data QPs —
   specifically the Newton-POLISH count (IPM count is irrelevant:
   (20,6) == (10,6), while (10,10) == (20,10)). f32 polish error falls
   smoothly (6 -> 4.7e-2, 8 -> 3.2e-3, 10 -> 6.2e-4, 12 -> 3.4e-4);
   f64 at the default (10,6) budget is exact (~2e-13): extra precision
   substitutes for extra polish near the cone creases.

2. **Effect on final accuracy (A/B/C training).** Train the full
   real-550 recipe (``cube_real_500epochs_r2.json`` protocol, cosine lr)
   with three arms — f32 (10,6) default, f32 (10,10)
   (``loss_solver_budget``, the TPU-native escape hatch at ~1.25x solve
   cost), f64 (10,6) (``loss_dtype``, needs x64) — and compare learned
   physical parameters against ground truth (m 0.37 kg, side 0.1048 m,
   mu 0.15).

Writes ``results/grad_precision_real_cube.json``.

Usage: python scripts/grad_precision_real_cube.py [--epochs 500]
       [--arms f32,f32_budget,f64] [--platform cpu] [--skip-training]
"""
import json
import os
import sys
import time

import click

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REAL_DATA_DIR = "/root/reference/assets/contactnets_cube"
DT = 0.0068
TRUTH = {"m": 0.37, "side": 0.1048, "mu": 0.15}

ARMS = {
    # name -> (loss_dtype, loss_solver_budget)
    "f32": (None, None),
    "f32_budget": (None, (10, 10)),
    "f64": ("float64", None),
}


@click.command()
@click.option("--epochs", default=500)
@click.option("--batch-size", default=256)
@click.option("--grad-batch", default=2048)
@click.option("--storage", default="/tmp/grad_precision_storage")
@click.option("--arms", default="f32,f32_budget,f64")
@click.option("--skip-training", is_flag=True,
              help="Only run the gradient-noise sweep (question 1).")
@click.option("--skip-sweep", is_flag=True)
@click.option("--platform", default=None,
              help="Force a jax platform (e.g. cpu); the image's "
              "sitecustomize overrides env vars, so this must be a "
              "config update before first device use.")
def main(epochs, batch_size, grad_batch, storage, arms, skip_training,
         skip_sweep, platform):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_x64", True)
    if jax.devices()[0].platform == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10.0)
    import jax.numpy as jnp
    import numpy as np

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.data.management import slice_trajectories
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)
    from dair_pll_tpu.utils import file_utils

    count = file_utils.import_data_to_storage(storage, REAL_DATA_DIR)
    click.echo(f"imported {count} real trajectories")
    urdf = get_asset("cube")

    record = {"device": str(jax.devices()[0]),
              "protocol": {"epochs": epochs, "batch": batch_size,
                           "lr": 1e-3, "lr_schedule": "cosine",
                           "dataset": f"{count} real cube tosses"}}

    # ---- question 1: batch-gradient error vs budget/dtype -------------------
    if not skip_sweep:
        n_traj = max(8, grad_batch // 120 + 1)
        trajs = [np.asarray(file_utils.load_trajectory(
            file_utils.trajectory_path(storage, "learning", i)))
            for i in range(n_traj)]
        past, future = slice_trajectories(trajs, 1, 1, 1)
        n = min(grad_batch, past.shape[0])
        x = jnp.asarray(past[:n, -1, :], jnp.float32)
        xp = jnp.asarray(future[:n, 0, :], jnp.float32)
        u = jnp.zeros((n, 0), jnp.float32)

        def gradvec(ipm, newton, f64):
            system = MultibodyLearnableSystem.from_urdfs(
                {"cube": urdf}, DT, ipm_iterations=ipm,
                newton_iterations=newton)
            params = system.model.initial_params(jnp.float32)
            perturb = jax.tree_util.tree_map(
                lambda l: (l * 1.15 + 0.01
                           if jnp.issubdtype(l.dtype, jnp.floating)
                           else l), params)
            args = (x, u, xp)
            if f64:
                perturb = jax.tree_util.tree_map(
                    lambda l: l.astype(jnp.float64), perturb)
                args = tuple(a.astype(jnp.float64) for a in args)
            g = jax.jit(jax.grad(lambda p: jnp.mean(
                system.contactnets_loss_batch(p, *args))))(perturb)
            return np.concatenate([
                np.asarray(l, np.float64).ravel()
                for l in jax.tree_util.tree_leaves(g)])

        ref = gradvec(30, 30, True)
        sweep = {}
        for (ipm, newton, f64) in [(10, 6, False), (10, 8, False),
                                   (10, 10, False), (12, 12, False),
                                   (30, 30, False), (10, 6, True)]:
            g = gradvec(ipm, newton, f64)
            name = f"({ipm},{newton}) {'f64' if f64 else 'f32'}"
            sweep[name] = {
                "rel_l2_vs_f64_30_30": float(
                    np.linalg.norm(g - ref) / np.linalg.norm(ref)),
                "cosine": float(np.dot(g, ref) / (
                    np.linalg.norm(g) * np.linalg.norm(ref))),
            }
            click.echo(f"{name}: {sweep[name]}")
        record["batch_grad_sweep"] = {"batch": int(n),
                                      "point": "perturbed wrong-init",
                                      "referee": "(30,30) f64",
                                      "budgets": sweep}

    # ---- question 2: full-budget A/B/C ---------------------------------------
    def make_config(run_name, loss_dtype, budget):
        return SupervisedLearningExperimentConfig(
            data_config=DataConfig(
                dt=DT, train_fraction=0.5, valid_fraction=0.25,
                test_fraction=0.25, slice_config=TrajectorySliceConfig()),
            base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
            learnable_config=MultibodyLearnableSystemConfig(
                urdfs={"cube": urdf},
                loss=MultibodyLosses.CONTACTNETS_LOSS,
                loss_dtype=loss_dtype, loss_solver_budget=budget),
            optimizer_config=OptimizerConfig(
                lr=Float(1e-3), wd=Float(0.0), patience=epochs,
                epochs=epochs, batch_size=Int(batch_size),
                lr_schedule="cosine"),
            storage=storage, run_name=run_name,
            full_evaluation_period=max(1, epochs),
            full_evaluation_samples=4,
        )

    if not skip_training:
        for arm in arms.split(","):
            loss_dtype, budget = ARMS[arm]
            config = make_config(f"gp_{arm}", loss_dtype, budget)
            experiment = MultibodyLearnableExperiment(config)
            start = time.time()
            best_params, stats = experiment.generate_results(
                lambda e, p, tl, bv: click.echo(
                    f"[{arm}] epoch {e}: train {tl:.6g} best {bv:.6g}",
                    nl=True) if e % 100 == 0 else None)
            wall = time.time() - start
            scalars = experiment.learned_system.summary(
                best_params, {}).scalars
            sides = [float(scalars[f"cube::body_len_{ax}"])
                     for ax in "xyz"]
            learned = {
                "m": float(scalars["cube::body_m"]),
                "mu": float(scalars["cube::body_mu"]),
                "sides": sides,
            }
            errors = {
                "m_rel": abs(learned["m"] / TRUTH["m"] - 1),
                "mu_rel": abs(learned["mu"] / TRUTH["mu"] - 1),
                "side_rel_max": max(
                    abs(s / TRUTH["side"] - 1) for s in sides),
            }
            record[f"train_{arm}"] = {
                "loss_dtype": loss_dtype, "loss_solver_budget": budget,
                "learned": learned, "param_errors_rel": errors,
                "wall_seconds": round(wall, 1),
                "stats": {k: float(v) for k, v in sorted(stats.items())
                          if k.endswith("_mean")},
            }
            click.echo(json.dumps(
                {arm: {"learned": learned, "errors": errors,
                       "wall_s": round(wall, 1)}}, default=float))

    out = os.path.join(REPO, "results", "grad_precision_real_cube.json")
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(record, handle, indent=1, default=float)
    click.echo(f"wrote {out}")


if __name__ == "__main__":
    main()
