r"""Supervised learning experiment: the full training/evaluation loop.

Rebuild of the reference's ``experiment.py``
(``/root/reference/dair_pll/experiment.py:126-851``) around JAX:

* **Epoch-as-scan.** The reference iterates a ``DataLoader`` and calls
  ``loss.backward()`` per batch (``experiment.py:332-363``). Here the whole
  epoch — shuffle-gather, loss, gradient, Adam update for every batch — is
  one jitted ``lax.scan``: a single device launch per epoch, no
  host-device ping-pong.
* **Early stopping / patience / best-parameter tracking** mirror reference
  ``experiment.py:613-665``.
* **Checkpoint/resume** restores the data split, parameters, optimizer
  state, epoch counters, and run id (reference ``experiment.py:490-557``).
* **Evaluation** reproduces the reference's statistics-dictionary key
  scheme ``{set}_{system}_{variable}(_mean)``
  (``experiment.py:685-796``), including velocity-normalization baselines,
  trajectory MSE, and state-space auxiliary comparisons (rot/pos error).

Losses are callbacks ``(params, x_past, x_future) -> (batch,)`` so the
ContactNets experiment swaps in the implicit loss exactly like the
reference does (``drake_experiment.py:174-224``).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dair_pll_tpu.data.management import ExperimentDataManager, TrajectorySet
from dair_pll_tpu.system import System
from dair_pll_tpu.training.config import SupervisedLearningExperimentConfig
from dair_pll_tpu.utils import file_utils
from dair_pll_tpu.utils.checkpoint import (TrainingState, load_checkpoint,
                                           save_checkpoint)
from dair_pll_tpu.utils.logging_manager import ExperimentLogManager

# Statistics naming scheme (reference experiment.py:58-86).
TRAIN_SET = "train"
VALID_SET = "valid"
TEST_SET = "test"
ALL_SETS = (TRAIN_SET, VALID_SET, TEST_SET)
BASE_SYSTEM_NAME = "base"
ORACLE_SYSTEM_NAME = "oracle"
LEARNED_SYSTEM_NAME = "model"
LOSS_NAME = "loss"
TRAJECTORY_ERROR_NAME = "trajectory_mse"
PREDICTED_VELOCITY_SIZE = "v_plus_squared"
DELTA_VELOCITY_SIZE = "delta_v_squared"
TARGET_NAME = "target_sample"
PREDICTION_NAME = "prediction_sample"
AVERAGE_TAG = "mean"
TRAINING_DURATION = "training_duration"
EVALUATION_DURATION = "evaluation_duration"
LOGGING_DURATION = "logging_duration"
MAX_SAVED_TRAJECTORIES = 5

LossCallback = Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]
EpochCallback = Callable[[int, Any, float, float], None]


def default_epoch_callback(epoch: int, params: Any, train_loss: float,
                           best_valid_loss: float) -> None:
    """Prints progress (reference ``experiment.py:115-119``)."""
    print(epoch, train_loss, best_valid_loss, flush=True)


class SupervisedLearningExperiment:
    """Trains a learnable system on trajectory data.

    Subclasses implement :meth:`get_base_system` (ground truth / oracle)
    and :meth:`get_learned_system`, and may override :meth:`loss_callback`
    (defaults to velocity-MSE prediction loss, reference
    ``experiment.py:292-320``).
    """

    def __init__(self, config: SupervisedLearningExperimentConfig) -> None:
        self.config = config
        self.learned_system: Optional[System] = None
        self.data_manager: Optional[ExperimentDataManager] = None
        self.log_manager: Optional[ExperimentLogManager] = None
        file_utils.save_config(config.storage, config.run_name, config)

    # -- abstract system factories ------------------------------------------
    def get_base_system(self) -> Tuple[System, Any]:
        """Returns the ground-truth (oracle) system and its parameters."""
        raise NotImplementedError

    def get_learned_system(self) -> Tuple[System, Any]:
        """Returns the learnable system and its initial parameters."""
        raise NotImplementedError

    def get_oracle_system(self) -> Tuple[System, Any]:
        """System used as the evaluation oracle; defaults to the base."""
        return self.get_base_system()

    @property
    def space(self):
        assert self.learned_system is not None
        return self.learned_system.space

    # -- losses ---------------------------------------------------------------
    def prediction_loss(self, system: System, params: Any,
                        x_past: jnp.ndarray,
                        x_future: jnp.ndarray) -> jnp.ndarray:
        r"""Velocity-MSE prediction loss per slice (reference
        ``experiment.py:292-320``): roll the system forward
        ``t_prediction`` steps from the history and average the squared
        velocity error per element.

        Args:
            params: system parameters.
            x_past: ``(B, t_history, n_x)``.
            x_future: ``(B, t_prediction, n_x)``.

        Returns:
            ``(B,)`` per-slice losses.
        """
        space = system.space
        t_prediction = x_future.shape[-2]

        def predict_one(x_hist):
            x_0, carry = system.preprocess_initial_condition(
                params, x_hist, system.initial_carry(x_hist[-1]))
            trajectory = system.simulate(params, x_0, t_prediction,
                                         carry_0=carry)
            return trajectory[1:]

        x_predicted = jax.vmap(predict_one)(x_past)
        v_future = space.v(x_future)
        v_predicted = space.v(x_predicted)
        per_element = space.velocity_square_error(
            v_future.reshape(v_future.shape[0], -1, space.n_v),
            v_predicted.reshape(v_predicted.shape[0], -1, space.n_v))
        n_elements = t_prediction * space.n_v
        return jnp.sum(per_element, axis=-1) / n_elements

    def loss_callback(self) -> LossCallback:
        """Training loss: ``(params, x_past, x_future) -> (B,)``."""
        system = self.learned_system

        def loss(params, x_past, x_future):
            return self.prediction_loss(system, params, x_past, x_future)

        return loss

    def parameter_update_mask(self, params: Any) -> Optional[Any]:
        """Optional 0/1 pytree multiplying gradients before the optimizer
        update (e.g. to pin unobservable parameter directions). ``None``
        means no masking."""
        del params
        return None

    # -- setup ---------------------------------------------------------------
    def setup_training(self):
        """Builds systems, data, optimizer, and resumes from checkpoint if
        present (reference ``experiment.py:490-557``)."""
        config = self.config
        ckpt_path = file_utils.checkpoint_path(config.storage,
                                               config.run_name)
        state = load_checkpoint(ckpt_path)

        self.data_manager = ExperimentDataManager(
            config.storage, config.data_config,
            split_indices=state.split_indices if state else None)

        self.learned_system, init_params = self.get_learned_system()
        lr = config.optimizer_config.lr.value
        wd = config.optimizer_config.wd.value
        optimizer = optax.adamw(lr, weight_decay=wd) if wd > 0 else \
            optax.adam(lr)

        if state is None:
            params = init_params
            opt_state = optimizer.init(params)
            state = TrainingState(
                split_indices=self.data_manager.trajectory_set_indices(),
                best_params=params,
                current_params=params,
                optimizer_state=opt_state,
            )
        else:
            # Restore pytree structure from the stored numpy leaves.
            params = jax.tree_util.tree_map(
                lambda init, stored: jnp.asarray(stored, init.dtype),
                init_params, state.current_params)
            state.best_params = jax.tree_util.tree_map(
                lambda init, stored: jnp.asarray(stored, init.dtype),
                init_params, state.best_params)
            state.current_params = params
            opt_state = optimizer.init(params)
            opt_state = jax.tree_util.tree_map(
                lambda init, stored: jnp.asarray(stored, init.dtype)
                if hasattr(init, "dtype") else stored,
                opt_state, state.optimizer_state)
            state.optimizer_state = opt_state

        self.log_manager = ExperimentLogManager(
            config.storage, config.run_name, use_wandb=config.run_wandb,
            wandb_project=config.wandb_project, resume_id=state.run_id)
        state.run_id = self.log_manager.run_id
        return optimizer, state

    # -- jitted epoch ----------------------------------------------------------
    def _build_train_epoch(self, optimizer, batch_size: int):
        """Compiles an epoch function: scan of shuffled batches, each doing
        loss + grad + Adam update."""
        loss_fn = self.loss_callback()

        def batch_mean_loss(params, x_past, x_future):
            return jnp.mean(loss_fn(params, x_past, x_future))

        grad_fn = jax.value_and_grad(batch_mean_loss)

        @jax.jit
        def epoch_fn(params, opt_state, past, future, perm):
            batches = perm.reshape(-1, batch_size)
            update_mask = self.parameter_update_mask(params)

            def step(carry, batch_indices):
                params, opt_state = carry
                x_past = jnp.take(past, batch_indices, axis=0)
                x_future = jnp.take(future, batch_indices, axis=0)
                loss, grads = grad_fn(params, x_past, x_future)
                if update_mask is not None:
                    grads = jax.tree_util.tree_map(
                        lambda g, m: g * m, grads, update_mask)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), batches)
            return params, opt_state, jnp.mean(losses)

        @jax.jit
        def eval_epoch_fn(params, past, future, perm):
            batches = perm.reshape(-1, batch_size)

            def step(_, batch_indices):
                x_past = jnp.take(past, batch_indices, axis=0)
                x_future = jnp.take(future, batch_indices, axis=0)
                return None, batch_mean_loss(params, x_past, x_future)

            _, losses = jax.lax.scan(step, None, batches)
            return jnp.mean(losses)

        return epoch_fn, eval_epoch_fn

    @staticmethod
    def _epoch_permutation(rng: np.random.Generator, n_slices: int,
                           batch_size: int) -> np.ndarray:
        """Shuffled slice indices, padded by wraparound to a whole number
        of batches (every slice appears at least once per epoch)."""
        perm = rng.permutation(n_slices)
        n_batches = max(1, int(np.ceil(n_slices / batch_size)))
        padded = np.resize(perm, n_batches * batch_size)
        return padded

    # -- train loop --------------------------------------------------------------
    def train(self, epoch_callback: EpochCallback = default_epoch_callback
              ) -> Tuple[float, float, Any]:
        """Runs training with early stopping; returns (final train loss,
        best valid loss, best parameters)."""
        config = self.config
        optimizer, state = self.setup_training()
        assert self.data_manager is not None
        ckpt_path = file_utils.checkpoint_path(config.storage,
                                               config.run_name)
        batch_size = int(config.optimizer_config.batch_size.value)
        epoch_fn, eval_epoch_fn = self._build_train_epoch(
            optimizer, batch_size)
        rng = np.random.default_rng(713 + state.epoch)

        train_set, valid_set, _ = self.data_manager.get_trajectory_sets()
        # The manager assigns trajectories lazily on first scan; record the
        # realized split so resume restores the identical partition.
        state.split_indices = self.data_manager.trajectory_set_indices()
        train_past = jnp.asarray(train_set.slices_past)
        train_future = jnp.asarray(train_set.slices_future)
        valid_past = jnp.asarray(valid_set.slices_past)
        valid_future = jnp.asarray(valid_set.slices_future)

        params = state.current_params
        opt_state = state.optimizer_state

        if state.finished_training:
            return 0.0, state.best_valid_loss, state.best_params

        # Pre-update loss report (reference experiment.py:594-611).
        perm = self._epoch_permutation(rng, train_set.n_slices, batch_size)
        train_loss = float(eval_epoch_fn(
            params, train_past, train_future, jnp.asarray(perm)))
        if state.epoch == 1:
            valid_loss = self._epoch_valid_loss(
                eval_epoch_fn, params, valid_set, valid_past, valid_future,
                rng, batch_size)
            state.best_valid_loss = valid_loss
            self._log_epoch(0, params, train_loss, 0.0, valid_loss)
            epoch_callback(0, params, train_loss, state.best_valid_loss)

        patience = config.optimizer_config.patience
        try:
            while state.epoch <= config.optimizer_config.epochs:
                if config.data_config.update_dynamically:
                    train_set, valid_set, _ = \
                        self.data_manager.get_trajectory_sets()
                    train_past = jnp.asarray(train_set.slices_past)
                    train_future = jnp.asarray(train_set.slices_future)
                    valid_past = jnp.asarray(valid_set.slices_past)
                    valid_future = jnp.asarray(valid_set.slices_future)
                    state.split_indices = \
                        self.data_manager.trajectory_set_indices()

                start = time.time()
                perm = self._epoch_permutation(
                    rng, train_set.n_slices, batch_size)
                params, opt_state, train_loss_dev = epoch_fn(
                    params, opt_state, train_past, train_future,
                    jnp.asarray(perm))
                train_loss = float(train_loss_dev)
                training_duration = time.time() - start

                # Guard against silent divergence: solver-failure masking
                # zeroes bad samples' losses, so non-finite PARAMETERS are
                # the reliable signal that training has blown up.
                finite = all(
                    bool(jnp.all(jnp.isfinite(leaf)))
                    for leaf in jax.tree_util.tree_leaves(params)
                    if hasattr(leaf, "dtype") and
                    jnp.issubdtype(leaf.dtype, jnp.floating))
                if not finite:
                    # Roll back to the last finite state so the finally
                    # block checkpoints something usable.
                    params = state.current_params
                    opt_state = state.optimizer_state
                    raise RuntimeError(
                        f"non-finite parameters after epoch "
                        f"{state.epoch}: training diverged (last train "
                        f"loss {train_loss}); checkpoint preserves the "
                        f"last finite state")

                valid_loss = self._epoch_valid_loss(
                    eval_epoch_fn, params, valid_set, valid_past,
                    valid_future, rng, batch_size)
                self._log_epoch(state.epoch, params, train_loss,
                                training_duration, valid_loss)

                if valid_loss < state.best_valid_loss:
                    state.best_valid_loss = valid_loss
                    state.best_params = params
                    state.epochs_since_best = 0
                else:
                    state.epochs_since_best += 1

                if state.epochs_since_best >= patience:
                    break

                epoch_callback(state.epoch, params, train_loss,
                               state.best_valid_loss)
                state.current_params = params
                state.optimizer_state = opt_state
                state.epoch += 1

            state.finished_training = True
        finally:
            state.current_params = params
            state.optimizer_state = opt_state
            save_checkpoint(ckpt_path, state)

        return train_loss, state.best_valid_loss, state.best_params

    def _epoch_valid_loss(self, eval_epoch_fn, params,
                          valid_set: TrajectorySet, valid_past,
                          valid_future, rng, batch_size: int) -> float:
        if valid_set.n_slices == 0:
            return 0.0
        perm = self._epoch_permutation(rng, valid_set.n_slices, batch_size)
        return float(eval_epoch_fn(
            params, valid_past, valid_future, jnp.asarray(perm)))

    def _log_epoch(self, epoch: int, params, train_loss: float,
                   training_duration: float, valid_loss: float) -> None:
        start_log = time.time()
        scalars = {
            f"{TRAIN_SET}_{LOSS_NAME}": train_loss,
            f"{VALID_SET}_{LOSS_NAME}": valid_loss,
            TRAINING_DURATION: training_duration,
        }
        assert self.learned_system is not None
        summary = self.learned_system.summary(params, scalars)
        scalars.update(summary.scalars)
        scalars[LOGGING_DURATION] = time.time() - start_log
        assert self.log_manager is not None
        self.log_manager.update(epoch, scalars, summary.videos,
                                summary.meshes)

    # -- evaluation -----------------------------------------------------------
    def trajectory_predict(self, system: System, params: Any,
                           trajectories, t_skip: int):
        """Rollout predictions for full (variable-length) trajectories.

        Pads all trajectories to the maximum length, vmaps one fixed-horizon
        rollout, and returns per-trajectory (prediction, target, mask)
        triples — replacing the reference's per-trajectory Python loop
        (``experiment.py:250-290``) with a single batched rollout.
        """
        t_begin = t_skip + 1
        max_T = max(t.shape[0] for t in trajectories)
        horizon = max_T - t_begin
        n_x = trajectories[0].shape[-1]

        padded = np.zeros((len(trajectories), max_T, n_x), dtype=np.float32)
        lengths = np.zeros((len(trajectories),), dtype=np.int64)
        for i, trajectory in enumerate(trajectories):
            T = trajectory.shape[0]
            padded[i, :T] = trajectory
            padded[i, T:] = trajectory[-1]  # repeat last state (masked out)
            lengths[i] = T

        x_hist = jnp.asarray(padded[:, :t_begin])

        def predict_one(hist):
            x_0, carry = system.preprocess_initial_condition(
                params, hist, system.initial_carry(hist[-1]))
            trajectory = system.simulate(params, x_0, horizon, carry_0=carry)
            return trajectory[1:]

        predictions = np.asarray(jax.vmap(predict_one)(x_hist))
        targets = padded[:, t_begin:]
        masks = (np.arange(horizon)[None, :] <
                 (lengths - t_begin)[:, None])
        return predictions, targets, masks

    def evaluate_systems_on_sets(self, systems: Dict[str, Tuple[System,
                                                                Any]],
                                 sets: Dict[str, TrajectorySet]) -> Dict:
        """Builds the statistics dictionary (reference
        ``experiment.py:685-796``): per-slice losses, velocity norms,
        trajectory MSE, auxiliary comparisons, sample trajectories, and
        ``_mean`` summaries."""
        stats: Dict = {}
        space = self.space
        t_skip = self.config.data_config.slice_config.t_skip

        for set_name, trajectory_set in sets.items():
            if trajectory_set.n_slices == 0:
                continue
            past = jnp.asarray(trajectory_set.slices_past)
            future = jnp.asarray(trajectory_set.slices_future)

            v_plus = space.v(future[:, 0, :])
            v_minus = space.v(past[:, -1, :])
            stats[f"{set_name}_{DELTA_VELOCITY_SIZE}"] = np.asarray(
                space.velocity_square_error(v_plus, v_minus))
            stats[f"{set_name}_{PREDICTED_VELOCITY_SIZE}"] = np.asarray(
                space.velocity_square_error(v_plus, jnp.zeros_like(v_plus)))

            for system_name, (system, params) in systems.items():
                losses = np.asarray(self.prediction_loss(
                    system, params, past, future))
                stats[f"{set_name}_{system_name}_{LOSS_NAME}"] = losses

                predictions, targets, masks = self.trajectory_predict(
                    system, params, trajectory_set.trajectories, t_skip)
                mse = []
                rot_list, pos_list = [], []
                aux = space.auxiliary_comparisons()
                for pred, target, mask in zip(predictions, targets, masks):
                    pred_v = jnp.asarray(pred[mask])
                    target_v = jnp.asarray(target[mask])
                    mse.append(float(jnp.mean(space.state_square_error(
                        pred_v, target_v))))
                    for comp_name, comp in aux.items():
                        key = f"{set_name}_{system_name}_{comp_name}"
                        stats.setdefault(key, []).append(
                            float(comp(pred_v, target_v)))
                stats[f"{set_name}_{system_name}_"
                      f"{TRAJECTORY_ERROR_NAME}"] = np.asarray(mse)

                if system_name == LEARNED_SYSTEM_NAME:
                    n_save = min(MAX_SAVED_TRAJECTORIES, len(predictions))
                    stats[f"{set_name}_{system_name}_{TARGET_NAME}"] = [
                        targets[i][masks[i]] for i in range(n_save)]
                    stats[f"{set_name}_{system_name}_{PREDICTION_NAME}"] = [
                        predictions[i][masks[i]] for i in range(n_save)]

        summary = {}
        for key, value in stats.items():
            if isinstance(value, np.ndarray) and value.ndim == 1 and \
                    value.size:
                summary[f"{key}_{AVERAGE_TAG}"] = float(np.mean(value))
            elif isinstance(value, list) and value and \
                    isinstance(value[0], float):
                summary[f"{key}_{AVERAGE_TAG}"] = float(np.mean(value))
        stats.update(summary)
        return stats

    def base_and_learned_comparison_summary(self, statistics: Dict,
                                            best_params: Any) -> Dict:
        """Optional rich-media comparison (e.g. overlay videos) built from
        the evaluation statistics; returns a videos dict. Subclasses
        override (role of reference ``experiment.py:365-378`` /
        ``drake_experiment.py:119-161``)."""
        del statistics, best_params
        return {}

    def _evaluation(self, best_params: Any) -> Dict:
        """Final oracle-vs-model evaluation on all sets, saved to disk
        (reference ``experiment.py:798-824``)."""
        assert self.data_manager is not None
        sets = dict(zip(ALL_SETS, self.data_manager.get_trajectory_sets()))
        oracle_system, oracle_params = self.get_oracle_system()
        systems = {
            ORACLE_SYSTEM_NAME: (oracle_system, oracle_params),
            LEARNED_SYSTEM_NAME: (self.learned_system, best_params),
        }
        evaluation = self.evaluate_systems_on_sets(systems, sets)
        file_utils.save_evaluation(self.config.storage,
                                   self.config.run_name, evaluation)
        videos = self.base_and_learned_comparison_summary(
            evaluation, best_params)
        if videos and self.log_manager is not None:
            self.log_manager.update(-1, {}, videos, {})
        return evaluation

    def generate_results(self, epoch_callback: EpochCallback =
                         default_epoch_callback) -> Tuple[Any, Dict]:
        """Trains (or resumes) and evaluates; returns (best parameters,
        statistics) (reference ``experiment.py:826-851``)."""
        _, _, best_params = self.train(epoch_callback)
        try:
            statistics = file_utils.load_evaluation(
                self.config.storage, self.config.run_name)
        except FileNotFoundError:
            statistics = self._evaluation(best_params)
        return best_params, statistics
