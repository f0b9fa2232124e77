"""Reference-scale proof: generate, train, and evaluate at n_pop=16384.

The reference's dataset generator defaults allow populations up to 16384
(``/root/reference/dair_pll/dataset_generation.py:30-38``); round-1
VERDICT item 5 asks for a demonstrated full-population pipeline at that
scale. This script runs the real experiment layer end to end on one TPU
chip — vmapped ground-truth generation, ContactNets training with the
fused batch-minor loss at large batch, and a FULL-population (no
sampling) batched rollout evaluation — recording wall times to
``results/scale_16384.json``.

Usage: python scripts/scale_16384.py [n_pop] [epochs]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DT = 0.0068
TRAJECTORY_LENGTH = 80


def main():
    n_pop = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    from dair_pll_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

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

    storage = "/tmp/scale16384_storage"
    shutil.rmtree(storage, ignore_errors=True)
    timings = {}

    urdf = get_asset("cube")
    model = build_multibody_model({"cube": urdf})
    base = MultibodyLearnableSystem(model, DT)
    params = model.initial_params()
    space = base.space
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
    generator = ExperimentDatasetGenerator(
        base, sampler, params,
        DataGenerationConfig(dt=DT, n_pop=n_pop,
                             trajectory_length=TRAJECTORY_LENGTH,
                             static_noise=None, dynamic_noise=None))
    t0 = time.time()
    generated = generator.generate(storage)
    timings["generation_s"] = round(time.time() - t0, 2)
    print(f"generated {generated} trajectories in "
          f"{timings['generation_s']}s", flush=True)

    config = SupervisedLearningExperimentConfig(
        data_config=DataConfig(
            dt=DT, train_fraction=0.5, valid_fraction=0.25,
            test_fraction=0.25, slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(urdfs={"cube": urdf}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": urdf}, loss=MultibodyLosses.CONTACTNETS_LOSS),
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3), wd=Float(0.0), patience=epochs,
            epochs=epochs, batch_size=Int(65536)),
        # No sampling during the in-training evaluations either: 512
        # trajectories per epoch keeps epochs fast; the FULL population
        # is evaluated below.
        full_evaluation_samples=512,
        full_evaluation_period=max(1, epochs // 2),
        storage=storage, run_name="scale16384", run_wandb=False,
    )

    experiment = MultibodyLearnableExperiment(config)
    epoch_times = []

    def epoch_callback(epoch, params, train_loss, best_valid):
        epoch_times.append(time.time())
        print(f"epoch {epoch}: train {train_loss:.6g}", flush=True)

    t0 = time.time()
    _, best_valid, best_params = experiment.train(epoch_callback)
    timings["training_s"] = round(time.time() - t0, 2)
    n_transitions = generated * (TRAJECTORY_LENGTH - 1)
    # Steady-state rate from the later epochs (the first epoch pays the
    # fused-graph compiles).
    steady = None
    if len(epoch_times) >= 3:
        steady_epochs = len(epoch_times) - 2
        steady = steady_epochs * n_transitions / (
            epoch_times[-1] - epoch_times[1])
        timings["steady_state_epoch_s"] = round(
            (epoch_times[-1] - epoch_times[1]) / steady_epochs, 2)
    print(f"trained {epochs} epochs over ~{n_transitions} transitions in "
          f"{timings['training_s']}s"
          + (f"; steady-state {steady:,.0f} transitions/s" if steady
             else ""), flush=True)

    # FULL-population evaluation: every train/valid trajectory, batched
    # rollouts + slice losses, no per-trajectory host loop.
    train_set, valid_set, test_set = \
        experiment.data_manager.get_trajectory_sets()
    t0 = time.time()
    stats = experiment.evaluate_systems_on_sets(
        {"model": (experiment.learned_system, best_params)},
        {"train": train_set, "valid": valid_set, "test": test_set},
        mesh=experiment.evaluation_mesh())
    timings["full_population_evaluation_s"] = round(time.time() - t0, 2)
    n_eval = (len(train_set.trajectories) + len(valid_set.trajectories) +
              len(test_set.trajectories))
    print(f"evaluated {n_eval} trajectories (full population) in "
          f"{timings['full_population_evaluation_s']}s", flush=True)

    summary = {
        "n_pop": n_pop,
        "trajectory_length": TRAJECTORY_LENGTH,
        "epochs": epochs,
        "batch_size": 65536,
        "timings": timings,
        "sustained_train_transitions_per_sec": round(
            epochs * n_transitions / timings["training_s"]),
        "steady_state_transitions_per_sec": round(steady) if steady
        else None,
        "best_valid_loss": float(best_valid),
        "eval_stats": {key: float(val) for key, val in stats.items()
                       if key.endswith("_mean")},
        "device": str(jax.devices()[0]),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "scale_16384.json")
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(summary, handle, indent=2)
    print(json.dumps({"scale_16384_ok": True, **timings}))


if __name__ == "__main__":
    main()
