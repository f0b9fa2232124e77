"""Training stack tests: data pipeline, epoch scan, checkpoint/resume,
end-to-end sys-id convergence (SURVEY.md §4d)."""
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
from dair_pll_tpu.data.management import (ExperimentDataManager,
                                          slice_trajectories)
from dair_pll_tpu.hyperparameter import (Categorical, Float, Int,
                                         generate_suggestion,
                                         hyperparameter_values,
                                         load_suggestion, traverse_config)
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.training.config import (OptimizerConfig,
                                          SupervisedLearningExperimentConfig)
from dair_pll_tpu.training.multibody_experiment import (
    MultibodyLearnableExperiment, MultibodyLearnableSystemConfig,
    MultibodyLosses, MultibodySystemConfig)
from dair_pll_tpu.urdf import build_multibody_model
from dair_pll_tpu.utils import file_utils
from dair_pll_tpu.utils.checkpoint import load_checkpoint

DT = 0.0068


def test_slice_trajectories():
    trajectory = np.arange(10)[:, None] * np.ones((1, 3))
    past, future = slice_trajectories([trajectory], t_skip=1, t_history=2,
                                      t_prediction=2)
    # starts t=1..7 inclusive (need 2 future steps)
    assert past.shape == (7, 2, 3)
    assert future.shape == (7, 2, 3)
    np.testing.assert_allclose(past[0, :, 0], [0, 1])
    np.testing.assert_allclose(future[0, :, 0], [2, 3])


def test_data_manager_split_determinism(tmp_path):
    storage = str(tmp_path)
    for i in range(20):
        file_utils.save_trajectory(storage, "learning", i,
                                   np.random.randn(10, 13))
    config = DataConfig(dt=DT, train_fraction=0.5, valid_fraction=0.25,
                        test_fraction=0.25)
    manager = ExperimentDataManager(storage, config, seed=3)
    manager.get_trajectory_sets()
    split = manager.trajectory_set_indices()
    assert len(split[0]) == 10 and len(split[1]) == 5 and len(split[2]) == 5
    assert not (set(split[0]) & set(split[1]))

    # restoring the split from a checkpointed copy reproduces it exactly
    manager2 = ExperimentDataManager(storage, config, split_indices=split)
    manager2.get_trajectory_sets()
    assert manager2.trajectory_set_indices() == split


def test_hyperparameters_traverse_and_suggest(rng):
    config = OptimizerConfig(lr=Float(1e-3), wd=Float(1e-5),
                             batch_size=Int(32))
    found = traverse_config(config)
    assert set(found) == {"lr", "wd", "batch_size"}
    gen = np.random.default_rng(0)
    suggestion = generate_suggestion(config, gen)
    assert config.lr.value == suggestion["lr"]
    load_suggestion(config, {"lr": 0.5})
    assert config.lr.value == 0.5
    values = hyperparameter_values(config)
    assert values["lr"] == 0.5

    cat = Categorical("a", ["a", "b"])
    assert cat.sample(gen) in ("a", "b")


@pytest.fixture(scope="module")
def cube_training_storage(tmp_path_factory):
    """Simulated cube-toss data from the ground-truth system."""
    storage = str(tmp_path_factory.mktemp("storage"))
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, DT)
    params = model.initial_params(jnp.float64)

    key = jax.random.PRNGKey(0)
    n_traj, T = 24, 30
    keys = jax.random.split(key, n_traj)

    def sample_x0(k):
        k1, k2, k3 = jax.random.split(k, 3)
        rot = 0.5 * jax.random.normal(k1, (3,))
        from dair_pll_tpu.ops import quaternion
        quat = quaternion.exp(rot)
        pos = jnp.array([0.0, 0.0, 0.12]) + \
            0.02 * jax.random.normal(k2, (3,))
        vel = jax.random.normal(k3, (6,)) * \
            jnp.array([2.0, 2.0, 2.0, 0.5, 0.5, 0.2])
        return jnp.concatenate((quat, pos, vel))

    x0 = jax.vmap(sample_x0)(keys)
    trajectories = system.simulate_batch(params, x0, T - 1)
    for i in range(n_traj):
        file_utils.save_trajectory(storage, "learning", i,
                                   np.asarray(trajectories[i],
                                              dtype=np.float32))
    return storage


def make_config(storage, run_name, loss, epochs=5, lr=1e-3,
                full_evaluation_period=2, full_evaluation_samples=3):
    return SupervisedLearningExperimentConfig(
        data_config=DataConfig(dt=DT, train_fraction=0.5,
                               valid_fraction=0.25, test_fraction=0.25,
                               slice_config=TrajectorySliceConfig()),
        base_config=MultibodySystemConfig(
            urdfs={"cube": get_asset("cube")}),
        learnable_config=MultibodyLearnableSystemConfig(
            urdfs={"cube": get_asset("cube")}, loss=loss),
        optimizer_config=OptimizerConfig(
            lr=Float(lr), wd=Float(0.0), patience=50, epochs=epochs,
            batch_size=Int(32)),
        storage=storage, run_name=run_name,
        full_evaluation_period=full_evaluation_period,
        full_evaluation_samples=full_evaluation_samples,
    )


def test_contactnets_training_loss_decreases(cube_training_storage):
    config = make_config(cube_training_storage, "contactnets_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=5,
                         full_evaluation_samples=0)
    experiment = MultibodyLearnableExperiment(config)
    losses = []
    experiment.train(lambda e, p, tl, bv: losses.append(tl))
    assert losses[-1] < losses[0]


def test_cosine_lr_schedule_trains(cube_training_storage):
    """lr_schedule="cosine" decays the step size over the epoch budget
    and still reduces the training loss (beyond the reference, which only
    trains at constant lr)."""
    config = make_config(cube_training_storage, "cosine_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=5,
                         full_evaluation_samples=0)
    config.optimizer_config.lr_schedule = "cosine"
    experiment = MultibodyLearnableExperiment(config)
    losses = []
    experiment.train(lambda e, p, tl, bv: losses.append(tl))
    assert losses[-1] < losses[0]


def test_checkpoint_resume(cube_training_storage):
    config = make_config(cube_training_storage, "resume_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=3,
                         full_evaluation_samples=0)
    experiment = MultibodyLearnableExperiment(config)
    experiment.train(lambda *a: None)
    ckpt = load_checkpoint(file_utils.checkpoint_path(
        cube_training_storage, "resume_run"))
    assert ckpt is not None and ckpt.finished_training
    split_before = ckpt.split_indices

    # A resumed experiment restores the identical split and reports
    # finished without retraining.
    experiment2 = MultibodyLearnableExperiment(config)
    _, best_valid, best_params = experiment2.train(lambda *a: None)
    assert experiment2.data_manager.trajectory_set_indices() == \
        tuple(map(list, split_before)) or \
        experiment2.data_manager.trajectory_set_indices() == split_before
    assert np.isfinite(best_valid)


def test_evaluation_statistics_schema(cube_training_storage):
    config = make_config(cube_training_storage, "eval_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=2,
                         full_evaluation_period=2,
                         full_evaluation_samples=2)
    experiment = MultibodyLearnableExperiment(config)
    best_params, stats = experiment.generate_results(lambda *a: None)
    # reference key scheme {set}_{system}_{variable}(_mean)
    for key in ("train_model_loss_mean", "valid_model_loss_mean",
                "test_model_loss_mean", "train_oracle_loss_mean",
                "train_model_trajectory_mse_mean",
                "train_model_rot_err", "train_model_pos_err",
                "train_delta_v_squared", "train_v_plus_squared"):
        assert key in stats, f"missing statistic {key}"
    assert np.isfinite(stats["valid_model_loss_mean"])


def test_grad_clip_sanitizes_poisoned_gradients():
    """OptimizerConfig.grad_clip chains non-finite zero-out +
    clip_by_global_norm in front of Adam: one NaN/inf batch gradient
    must not poison the moments (the sliding-protocol elbow diverged to
    non-finite parameters within one epoch without this)."""
    import optax

    from dair_pll_tpu.training.config import OptimizerConfig
    from dair_pll_tpu.training.experiment import build_optimizer

    config = OptimizerConfig(lr=Float(1e-2), wd=Float(0.0),
                             grad_clip=1.0)
    optimizer = build_optimizer(config, config.lr.value)
    params = {"a": jnp.zeros(3), "b": jnp.zeros(2)}
    state = optimizer.init(params)

    poisoned = {"a": jnp.asarray([jnp.nan, jnp.inf, 1e30]),
                "b": jnp.asarray([-jnp.inf, 2.0])}
    updates, state = optimizer.update(poisoned, state, params)
    for leaf in jax.tree_util.tree_leaves(updates):
        assert np.isfinite(np.asarray(leaf)).all(), updates
    params = optax.apply_updates(params, updates)

    # A later well-behaved step still produces a sane Adam update.
    clean = {"a": jnp.asarray([1.0, -1.0, 0.5]),
             "b": jnp.asarray([0.1, -0.2])}
    updates, state = optimizer.update(clean, state, params)
    for leaf in jax.tree_util.tree_leaves(updates):
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all() and (np.abs(arr) <= 1.1e-2).all()

    # Unclipped Adam is poisoned by the same gradient: documents WHY
    # the sanitize chain exists.
    plain = build_optimizer(
        OptimizerConfig(lr=Float(1e-2), wd=Float(0.0), grad_clip=0.0),
        1e-2)
    pstate = plain.init(params)
    updates, pstate = plain.update(poisoned, pstate, params)
    bad = np.asarray(jax.tree_util.tree_leaves(updates)[0])
    assert not np.isfinite(bad).all()


def test_summary_statistics_nan_robust():
    """A diverged (non-finite) rollout must not poison the ``_mean``
    summary: the mean is over finite entries and the excluded count is
    reported as ``_n_diverged`` (observed live: one NaN test-split elbow
    rollout wiped all test_model_* means, results/elbow_recovery.json)."""
    from dair_pll_tpu.training.experiment import summarize_statistics

    stats = {
        "test_model_trajectory_mse": np.array([1.0, np.nan, 3.0, np.inf]),
        "test_model_pos_err": np.array([0.5, 0.25]),
        "test_model_loss": [2.0, float("nan")],
        "all_bad": np.array([np.nan, np.nan]),
        "not_a_vector": np.zeros((2, 2)),
    }
    summary = summarize_statistics(stats)
    assert summary["test_model_trajectory_mse_mean"] == pytest.approx(2.0)
    assert summary["test_model_trajectory_mse_n_diverged"] == 2
    assert summary["test_model_pos_err_mean"] == pytest.approx(0.375)
    assert "test_model_pos_err_n_diverged" not in summary
    assert summary["test_model_loss_mean"] == pytest.approx(2.0)
    assert summary["test_model_loss_n_diverged"] == 1
    assert np.isnan(summary["all_bad_mean"])
    assert summary["all_bad_n_diverged"] == 2
    assert "not_a_vector_mean" not in summary


def test_per_epoch_evaluation_cadence(cube_training_storage):
    """Per-epoch trajectory evaluation runs every full_evaluation_period
    epochs with full trajectory metrics in the epoch log, and the videos
    directory receives overlay renders (reference experiment.py:422-488)."""
    import json
    config = make_config(cube_training_storage, "cadence_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=4,
                         full_evaluation_period=2,
                         full_evaluation_samples=2)
    experiment = MultibodyLearnableExperiment(config)
    experiment.train(lambda *a: None)

    log_path = file_utils.log_path(cube_training_storage, "cadence_run")
    records = [json.loads(line) for line in open(log_path)]
    by_epoch = {r["epoch"]: r for r in records}
    # Evaluation (trajectory metrics) on cadence epochs only.
    for epoch, record in by_epoch.items():
        if epoch < 0:
            continue
        has_eval = "train_trajectory_mse" in record
        assert has_eval == (epoch % 2 == 0), (epoch, sorted(record))
    eval_epochs = [e for e in by_epoch if e >= 0 and e % 2 == 0]
    assert eval_epochs, "no evaluation epochs logged"
    record = by_epoch[eval_epochs[-1]]
    for key in ("train_loss", "valid_loss", "train_trajectory_mse",
                "valid_trajectory_mse", "train_rot_err", "valid_pos_err",
                "training_duration", "evaluation_duration"):
        assert key in record, f"missing epoch scalar {key}"
    # Overlay videos rendered on evaluation epochs.
    video_dir = os.path.join(
        file_utils.run_dir(cube_training_storage, "cadence_run"), "videos")
    assert os.path.isdir(video_dir) and os.listdir(video_dir)


def test_eval_epoch_loss_unbiased_by_wraparound(cube_training_storage):
    """The evaluation-pass epoch loss weights out wraparound-padded
    duplicates (exact per-slice mean) even when n_slices % batch != 0.

    Uses a deterministic per-slice loss override: the point under test is
    the weighting machinery, and the real ContactNets loss is not
    bit-stable across compilations (the f32 cone solve of near-degenerate
    QPs is sensitive to XLA fusion choices, which would make an
    eager-vs-jit comparison flaky).
    """
    config = make_config(cube_training_storage, "unbiased_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)

    class DeterministicLossExperiment(MultibodyLearnableExperiment):
        def loss_callback(self):
            def per_slice_loss(params, x_past, x_future):
                del params
                return (jnp.mean(x_past ** 2, axis=(-2, -1)) +
                        jnp.mean(x_future ** 3, axis=(-2, -1)))
            return per_slice_loss

    experiment = DeterministicLossExperiment(config)
    optimizer, state = experiment.setup_training()
    batch_size = 7  # guaranteed not to divide the slice count evenly
    _, eval_epoch_fn = experiment._build_train_epoch(optimizer, batch_size)
    train_set, _, _ = experiment.data_manager.get_trajectory_sets()
    past = jnp.asarray(train_set.slices_past, jnp.float64)
    future = jnp.asarray(train_set.slices_future, jnp.float64)
    assert train_set.n_slices % batch_size != 0
    rng = np.random.default_rng(0)
    perm, weights = experiment._epoch_permutation(
        rng, train_set.n_slices, batch_size)
    assert int(weights.sum()) == train_set.n_slices
    weighted = float(eval_epoch_fn(state.current_params, past, future,
                                   jnp.asarray(perm),
                                   jnp.asarray(weights, jnp.float64)))
    # exact mean over each slice exactly once
    loss_fn = experiment.loss_callback()
    exact = float(jnp.mean(loss_fn(state.current_params, past, future)))
    assert weighted == pytest.approx(exact, rel=1e-12)


def test_sharded_evaluation_matches_single_device(cube_training_storage):
    """Trajectory evaluation over the 8-device data-parallel mesh produces
    the same statistics as the single-device path (VERDICT item 5)."""
    config = make_config(cube_training_storage, "sharded_eval_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)
    config.shard_evaluation = True
    experiment = MultibodyLearnableExperiment(config)
    _, state = experiment.setup_training()
    params = state.current_params
    train_set, _, _ = experiment.data_manager.get_trajectory_sets()

    mesh = experiment.evaluation_mesh()
    assert mesh is not None and mesh.devices.size == 8
    stats_sharded = experiment.evaluate_systems_on_sets(
        {"model": (experiment.learned_system, params)},
        {"train": train_set}, mesh=mesh)
    stats_single = experiment.evaluate_systems_on_sets(
        {"model": (experiment.learned_system, params)},
        {"train": train_set}, mesh=None)
    np.testing.assert_allclose(
        stats_sharded["train_model_trajectory_mse"],
        stats_single["train_model_trajectory_mse"], rtol=1e-5)
    np.testing.assert_allclose(
        stats_sharded["train_model_rot_err"],
        stats_single["train_model_rot_err"], rtol=1e-5)
    assert stats_sharded["train_model_loss_mean"] == pytest.approx(
        stats_single["train_model_loss_mean"], rel=1e-5)


def test_urdf_reexport_roundtrip(cube_training_storage):
    config = make_config(cube_training_storage, "export_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)
    experiment = MultibodyLearnableExperiment(config)
    _, _, best_params = experiment.train(lambda *a: None)
    new_urdfs = experiment.generate_updated_urdfs(best_params)
    assert "cube" in new_urdfs and os.path.exists(new_urdfs["cube"])
    # re-exported URDF parses back into an equivalent model
    model2 = build_multibody_model({"cube": new_urdfs["cube"]})
    assert model2.n_q == 7 and model2.n_contacts == 4
    params2 = model2.initial_params()
    mu_exported = float(np.abs(np.asarray(params2.friction))[1])
    mu_learned = float(np.abs(np.asarray(best_params.friction))[1])
    assert mu_exported == pytest.approx(mu_learned, rel=1e-5)


def test_multistep_contactnets_window(cube_training_storage):
    """Multi-step implicit ContactNets (ROADMAP item 11): the loss over a
    t_prediction=3 window couples steps through the model's own rollout;
    it must differ from the one-step loss, have finite parameter
    gradients through the rollout solves, and train."""
    from dair_pll_tpu.data.config import TrajectorySliceConfig

    config = make_config(cube_training_storage, "multistep_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)
    config.data_config.slice_config = TrajectorySliceConfig(
        t_prediction=3)
    config.learnable_config.contactnets_multistep = True
    experiment = MultibodyLearnableExperiment(config)
    experiment.setup_training()

    # The window loss is a genuine multi-step objective: it differs from
    # the one-step slice loss on the same data.
    system = experiment.learned_system
    params = system.model.initial_params(jnp.float64)
    # Perturb away from the data-generating truth so the losses are
    # non-trivial (at the truth both objectives are ~0 ~= 0).
    params = jax.tree_util.tree_map(
        lambda leaf: leaf * 1.15 + 0.01, params)
    train_set, _, _ = experiment.data_manager.get_trajectory_sets()
    past = jnp.asarray(train_set.slices_past[:8])
    future = jnp.asarray(train_set.slices_future[:8])
    multi = experiment.loss_callback()(params, past, future)
    assert multi.shape == (8,)
    assert np.all(np.isfinite(np.asarray(multi)))
    config.learnable_config.contactnets_multistep = False
    one = experiment.loss_callback()(params, past, future)
    assert multi.shape == one.shape
    assert not np.allclose(np.asarray(multi), np.asarray(one))

    # Parameter gradients flow through the rollout-coupled window
    # (rematerialized contact solves with the IFT custom VJP).
    config.learnable_config.contactnets_multistep = True
    grads_multi = jax.grad(lambda p: jnp.mean(
        experiment.loss_callback()(p, past, future)))(params)
    nonzero = 0
    for leaf in jax.tree_util.tree_leaves(grads_multi):
        assert np.all(np.isfinite(np.asarray(leaf)))
        nonzero += int(np.any(np.asarray(leaf) != 0.0))
    assert nonzero > 0


def test_loss_dtype_float64_gradients(cube_training_storage):
    """``loss_dtype="float64"`` (the gradient-precision escape hatch,
    VERDICT r3 #5): with f32 parameters and f32 data the cast-at-the-
    boundary loss reproduces the all-f64 reference gradients, and the
    cotangents come back in the parameter dtype."""
    config = make_config(cube_training_storage, "f64_loss_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)
    config.learnable_config.loss_dtype = "float64"
    experiment = MultibodyLearnableExperiment(config)
    experiment.setup_training()
    system = experiment.learned_system

    params32 = jax.tree_util.tree_map(
        lambda leaf: (leaf.astype(jnp.float32) * 1.1 + 0.01
                      if jnp.issubdtype(leaf.dtype, jnp.floating)
                      else leaf),
        system.model.initial_params(jnp.float64))
    train_set, _, _ = experiment.data_manager.get_trajectory_sets()
    past32 = jnp.asarray(train_set.slices_past[:16], jnp.float32)
    future32 = jnp.asarray(train_set.slices_future[:16], jnp.float32)

    loss_fn64 = experiment.loss_callback()
    loss64 = loss_fn64(params32, past32, future32)
    assert loss64.dtype == jnp.float64
    grads = jax.grad(
        lambda p: jnp.mean(loss_fn64(p, past32, future32)))(params32)

    # Reference: cast everything to f64 by hand, grad the default-dtype
    # loss, and cast the gradients back. Identical graph modulo where
    # the casts sit, so agreement is at f64 precision.
    config.learnable_config.loss_dtype = None
    loss_fn = experiment.loss_callback()
    cast64 = lambda leaf: (leaf.astype(jnp.float64)
                           if jnp.issubdtype(jnp.asarray(leaf).dtype,
                                             jnp.floating) else leaf)
    grads_ref64 = jax.grad(lambda p: jnp.mean(loss_fn(
        p, past32.astype(jnp.float64),
        future32.astype(jnp.float64))))(
            jax.tree_util.tree_map(cast64, params32))

    for got, ref in zip(jax.tree_util.tree_leaves(grads),
                        jax.tree_util.tree_leaves(grads_ref64)):
        got = np.asarray(got)
        if not np.issubdtype(got.dtype, np.floating):
            continue
        assert got.dtype == np.float32  # cotangent cast back
        np.testing.assert_allclose(
            got, np.asarray(ref, dtype=np.float64), rtol=1e-5,
            atol=1e-7 * max(1.0, float(np.abs(np.asarray(ref)).max())))

    # End-to-end: an epoch of training runs and reduces the loss.
    config.learnable_config.loss_dtype = "float64"
    config.optimizer_config.epochs = 3
    experiment2 = MultibodyLearnableExperiment(config)
    losses = []
    experiment2.train(lambda e, p, tl, bv: losses.append(tl))
    assert losses[-1] < losses[0]


def test_force_fused_loss_matches_default(cube_training_storage):
    """``force_fused_loss=True`` routes small batches through the fused
    SoA path (the ICNN fast-path knob) and agrees with the vmapped
    default at f64."""
    config = make_config(cube_training_storage, "forced_fused_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)
    experiment = MultibodyLearnableExperiment(config)
    experiment.setup_training()
    system = experiment.learned_system
    params = jax.tree_util.tree_map(
        lambda leaf: (leaf * 1.1 + 0.01
                      if jnp.issubdtype(leaf.dtype, jnp.floating)
                      else leaf), system.model.initial_params(jnp.float64))
    train_set, _, _ = experiment.data_manager.get_trajectory_sets()
    past = jnp.asarray(train_set.slices_past[:8], jnp.float64)
    future = jnp.asarray(train_set.slices_future[:8], jnp.float64)

    default = experiment.loss_callback()(params, past, future)
    config.learnable_config.force_fused_loss = True
    forced = experiment.loss_callback()(params, past, future)
    np.testing.assert_allclose(np.asarray(forced), np.asarray(default),
                               rtol=1e-6, atol=1e-9)


def test_loss_solver_budget_plumbs_through(cube_training_storage):
    """``loss_solver_budget`` (the TPU-native gradient-precision knob,
    ``results/grad_precision_real_cube.json``) reaches the learnable
    system's loss-family solver configuration."""
    config = make_config(cube_training_storage, "budget_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=1,
                         full_evaluation_samples=0)
    config.learnable_config.loss_solver_budget = (20, 10)
    experiment = MultibodyLearnableExperiment(config)
    system, _ = experiment.get_learned_system()
    assert system.ipm_iterations == 20
    assert system.newton_iterations == 10


def test_resume_with_larger_budget_continues(cube_training_storage):
    """Successive-halving rungs re-run a trial with a LARGER epoch budget:
    a budget-exhausted checkpoint must continue training instead of
    returning its stale result (round-3 study-artifact bug: every rung
    resumed a finished run and all trials reported the identical epoch-0
    metric)."""
    config = make_config(cube_training_storage, "halving_resume_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=2,
                         full_evaluation_samples=0)
    experiment = MultibodyLearnableExperiment(config)
    epochs_seen = []
    experiment.train(lambda e, *a: epochs_seen.append(e))
    assert max(epochs_seen) == 2

    # Same run name, doubled budget: training continues from epoch 3.
    config.optimizer_config.epochs = 4
    experiment2 = MultibodyLearnableExperiment(config)
    epochs_seen2 = []
    experiment2.train(lambda e, *a: epochs_seen2.append(e))
    assert epochs_seen2 and min(epochs_seen2) == 3 and \
        max(epochs_seen2) == 4

    # Unchanged budget: the finished checkpoint short-circuits.
    experiment3 = MultibodyLearnableExperiment(config)
    epochs_seen3 = []
    experiment3.train(lambda e, *a: epochs_seen3.append(e))
    assert epochs_seen3 == []


def test_final_epoch_forces_full_evaluation(cube_training_storage):
    """When the epoch budget is shorter than full_evaluation_period the
    final epoch still runs the trajectory evaluation, so short
    successive-halving rungs rank trials by their TRAINED models rather
    than the shared epoch-0 metric."""
    import json
    config = make_config(cube_training_storage, "short_rung_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=3,
                         full_evaluation_period=10,
                         full_evaluation_samples=2)
    experiment = MultibodyLearnableExperiment(config)
    _, best_valid, _ = experiment.train(lambda *a: None)
    assert np.isfinite(best_valid)

    log_path = file_utils.log_path(cube_training_storage,
                                   "short_rung_run")
    records = [json.loads(line) for line in open(log_path)]
    by_epoch = {r["epoch"]: r for r in records}
    assert "valid_trajectory_mse" in by_epoch[3]
    assert "valid_trajectory_mse" not in by_epoch[1]
    assert "valid_trajectory_mse" not in by_epoch[2]


def test_batch_bucket_shapes():
    """Fused-path compile buckets: powers of two below the quarter-bucket
    threshold (with bounded padding past it), quarter steps above — the
    padding overhead caps at 25% for large batches (ADVICE r4)."""
    from dair_pll_tpu.multibody.learnable_system import (
        QUARTER_BUCKET_MIN, _batch_bucket)

    for n in (1, 2, 3, 100, 2048, 2049, 100000):
        b = _batch_bucket(n)
        assert b >= n
        assert b & (b - 1) == 0  # power of two below the threshold

    base = QUARTER_BUCKET_MIN
    assert _batch_bucket(base) == base
    assert _batch_bucket(base + 1) == base * 5 // 4
    assert _batch_bucket(base * 5 // 4) == base * 5 // 4
    assert _batch_bucket(base * 5 // 4 + 1) == base * 3 // 2
    assert _batch_bucket(base * 7 // 4 + 1) == 2 * base
    for n in range(QUARTER_BUCKET_MIN, 8 * QUARTER_BUCKET_MIN, 77777):
        b = _batch_bucket(n)
        assert n <= b <= n * 5 // 4 + 4  # padding bounded by ~25%
        assert b % (1 << 15) == 0       # sublane/Pallas-block friendly


def test_selection_metric_objective(cube_training_storage):
    """selection_metric="objective": model selection/early stopping track
    the training objective on validation slices — the logged valid_loss —
    not the trajectory-evaluation prediction loss (robust when wrong-init
    rollout metrics are noisy)."""
    import json
    config = make_config(cube_training_storage, "objective_select_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=3,
                         full_evaluation_period=2,
                         full_evaluation_samples=2)
    config.selection_metric = "objective"
    experiment = MultibodyLearnableExperiment(config)
    _, best_valid, _ = experiment.train(lambda *a: None)

    log_path = file_utils.log_path(cube_training_storage,
                                   "objective_select_run")
    records = [json.loads(line) for line in open(log_path)]
    objective_valid = [r["valid_loss"] for r in records if "valid_loss"
                       in r and r["epoch"] >= 0]
    assert np.isclose(best_valid, min(objective_valid), rtol=1e-6)


def test_selection_metric_validates():
    import pytest
    with pytest.raises(AssertionError):
        SupervisedLearningExperimentConfig(selection_metric="bogus")


def test_video_period_and_resolution(cube_training_storage):
    """video_period renders overlays on every N-th sampled evaluation at
    the configured (decimated) resolution; video_period=0 disables."""
    config = make_config(cube_training_storage, "video_period_run",
                         MultibodyLosses.CONTACTNETS_LOSS, epochs=4,
                         full_evaluation_period=1,
                         full_evaluation_samples=2)
    config.video_period = 2
    config.video_height, config.video_width = 120, 160
    config.video_max_frames = 6
    experiment = MultibodyLearnableExperiment(config)

    rendered = []
    original = experiment.base_and_learned_comparison_summary

    def spy(statistics, params):
        videos = original(statistics, params)
        rendered.append(bool(videos))
        for video, _fps in videos.values():
            assert video.shape[3:] == (120, 160)
            assert video.shape[1] <= 6 + 1
        return videos

    experiment.base_and_learned_comparison_summary = spy
    experiment.train(lambda *a: None)
    # Evaluations happened every epoch; only every 2nd rendered.
    assert any(rendered) and not all(rendered)

    config2 = make_config(cube_training_storage, "video_off_run",
                          MultibodyLosses.CONTACTNETS_LOSS, epochs=2,
                          full_evaluation_period=1,
                          full_evaluation_samples=2)
    config2.video_period = 0
    experiment2 = MultibodyLearnableExperiment(config2)
    experiment2.train(lambda *a: None)
    assert experiment2.base_and_learned_comparison_summary(
        {"train_model_target_sample": [np.zeros((3, 13))],
         "train_model_prediction_sample": [np.zeros((3, 13))]},
        None) == {}
