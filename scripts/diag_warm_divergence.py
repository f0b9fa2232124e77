"""Diagnose the warm-loss training divergence seen in
tests/test_warm_loss.py::test_warm_training_loss_decreases (round 5).

Replicates the test fixture (15 contact-rich simulated cube tosses,
batch 32) and trains 5 epochs cold vs warm, reporting per-epoch
training losses AND the cold full-budget loss evaluated at each arm's
final parameters — separating "warm forces degrade (loss value bogus)"
from "warm gradients degrade (parameters diverge)".
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.urdf import build_multibody_model
from dair_pll_tpu.utils import file_utils
from dair_pll_tpu.ops import quaternion

DT = 0.0068


def _perturbed_params(model, key, dtype):
    params = model.initial_params(dtype)
    k1, k2 = jax.random.split(key)
    params.friction = params.friction * (
        1.0 + 0.3 * jax.random.uniform(k1, params.friction.shape, dtype))
    geometry = list(params.geometry)
    for i, leaf in enumerate(geometry):
        if isinstance(leaf, dict) and "half_lengths" in leaf:
            leaf = dict(leaf)
            leaf["half_lengths"] = leaf["half_lengths"] * (
                1.0 + 0.2 * jax.random.uniform(
                    k2, leaf["half_lengths"].shape, dtype))
            geometry[i] = leaf
    params.geometry = geometry
    return params


def main():
    storage = "/tmp/diag_warm_divergence"
    os.system(f"rm -rf {storage}")
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, DT)
    params_gen = _perturbed_params(model, jax.random.PRNGKey(5),
                                   jnp.float64)
    key = jax.random.PRNGKey(2)
    n_traj, T = 15, 20
    keys = jax.random.split(key, n_traj)

    def sample_x0(k):
        k1, k2, k3 = jax.random.split(k, 3)
        quat = quaternion.exp(0.5 * jax.random.normal(k1, (3,)))
        pos = jnp.array([0.0, 0.0, 0.065]) + \
            0.005 * jax.random.normal(k2, (3,))
        vel = jax.random.normal(k3, (6,)) * \
            jnp.array([2.0, 2.0, 2.0, 1.0, 1.0, 0.2]) - \
            jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.5])
        return jnp.concatenate((quat, pos, vel))

    x0 = jax.vmap(sample_x0)(keys)
    trajectories = system.simulate_batch(params_gen, x0, T - 1)
    for i in range(n_traj):
        file_utils.save_trajectory(storage, "learning", i,
                                   np.asarray(trajectories[i], np.float32))

    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)
    from dair_pll_tpu.training.multibody_experiment import (
        MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
        MultibodyLosses, MultibodySystemConfig)

    def run(name, use_warm, epochs=10, warm_budget=None, seed_period=0):
        config = SupervisedLearningExperimentConfig(
            data_config=DataConfig(dt=DT, train_fraction=0.5,
                                   valid_fraction=0.25,
                                   test_fraction=0.25,
                                   slice_config=TrajectorySliceConfig()),
            base_config=MultibodySystemConfig(
                urdfs={"cube": get_asset("cube")}),
            learnable_config=MultibodyLearnableSystemConfig(
                urdfs={"cube": get_asset("cube")},
                loss=MultibodyLosses.CONTACTNETS_LOSS,
                use_warm_loss=use_warm, warm_solver_budget=warm_budget),
            optimizer_config=OptimizerConfig(
                lr=Float(1e-3), wd=Float(0.0), patience=50, epochs=epochs,
                batch_size=Int(32)),
            storage=storage, run_name=name,
            full_evaluation_samples=0,
            warm_seed_period=seed_period,
        )
        experiment = MultibodyLearnableExperiment(config)
        losses, param_log = [], []
        experiment.train(lambda e, p, tl, bv:
                         (losses.append(tl), param_log.append(p)))
        return losses, param_log

    arms = [
        ("cold", dict(use_warm=None)),
        ("warm_0_10", dict(use_warm=True)),
        ("warm_0_10_reseed2", dict(use_warm=True, seed_period=2)),
        ("warm_4_8", dict(use_warm=True, warm_budget=(4, 8))),
        ("warm_4_10", dict(use_warm=True, warm_budget=(4, 10))),
    ]
    results = {}
    for name, kwargs in arms:
        losses, plog = run(f"diag_{name}", **kwargs)
        results[name] = (losses, plog)
        print(f"{name} losses:", np.round(losses, 6), flush=True)

    # Cold full-budget loss at each arm's per-epoch params (f32 data).
    train_set, _, _ = MultibodyLearnableExperiment(
        SupervisedLearningExperimentConfig(
            data_config=DataConfig(dt=DT, train_fraction=0.5,
                                   valid_fraction=0.25,
                                   test_fraction=0.25,
                                   slice_config=TrajectorySliceConfig()),
            base_config=MultibodySystemConfig(
                urdfs={"cube": get_asset("cube")}),
            learnable_config=MultibodyLearnableSystemConfig(
                urdfs={"cube": get_asset("cube")},
                loss=MultibodyLosses.CONTACTNETS_LOSS),
            optimizer_config=OptimizerConfig(
                lr=Float(1e-3), wd=Float(0.0), patience=1, epochs=1,
                batch_size=Int(32)),
            storage=storage, run_name="diag_eval",
            full_evaluation_samples=0,
        )).setup_training() and (None, None, None) or (None, None, None)
    # simpler: load slices directly
    from dair_pll_tpu.data.management import ExperimentDataManager
    dm = ExperimentDataManager(storage, DataConfig(
        dt=DT, train_fraction=0.5, valid_fraction=0.25,
        test_fraction=0.25, slice_config=TrajectorySliceConfig()))
    tr, _, _ = dm.get_trajectory_sets()
    past = jnp.asarray(tr.slices_past)
    future = jnp.asarray(tr.slices_future)
    x = past[:, -1, :]
    xp = future[:, 0, :]
    u = jnp.zeros((x.shape[0], model.n_u), x.dtype)

    @jax.jit
    def cold_loss(p):
        return jnp.mean(system.contactnets_loss_batch(p, x, u, xp,
                                                      use_fused=False))

    for tag, (losses, plog) in results.items():
        vals = [float(cold_loss(p)) for p in plog]
        print(f"{tag}: cold-evaluated loss per epoch:",
              np.round(vals, 6), flush=True)


if __name__ == "__main__":
    main()
