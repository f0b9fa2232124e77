r"""Supervised learning experiment: the full training/evaluation loop.

Rebuild of the reference's ``experiment.py``
(``/root/reference/dair_pll/experiment.py:126-851``) around JAX:

* **Epoch-as-scan.** The reference iterates a ``DataLoader`` and calls
  ``loss.backward()`` per batch (``experiment.py:332-363``). Here the whole
  epoch — shuffle-gather, loss, gradient, Adam update for every batch — is
  one jitted ``lax.scan``: a single device launch per epoch, no
  host-device ping-pong.
* **Per-epoch evaluation.** Every ``full_evaluation_period`` epochs a
  sample of ``full_evaluation_samples`` train/valid trajectories is
  evaluated — per-slice prediction loss, full-trajectory rollout MSE and
  rot/pos errors — and every epoch scalars plus comparison videos/meshes
  are logged (reference ``experiment.py:422-488`` / ``write_to_wandb``
  :380-420). Early stopping uses the evaluation's validation
  prediction-loss metric, exactly like the reference
  (``experiment.py:480-488,647-657``).
* **Batched masked evaluation.** The reference evaluates trajectories in a
  per-trajectory Python loop (``experiment.py:763-786``); here rollouts
  are padded to a common horizon, vmapped as one device batch (optionally
  sharded over a data-parallel mesh), and every per-trajectory metric is a
  masked reduction computed in a single jitted call — one host transfer
  for the whole statistics table.
* **Checkpoint/resume** restores the data split, parameters, optimizer
  state, epoch counters, and run id (reference ``experiment.py:490-557``).
* **Evaluation statistics** reproduce the reference's key scheme
  ``{set}_{system}_{variable}(_mean)`` (``experiment.py:685-796``),
  including velocity-normalization baselines, trajectory MSE, and
  state-space auxiliary comparisons (rot/pos error).

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
TRAIN_TIME_SETS = (TRAIN_SET, VALID_SET)
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
#: Count of non-finite per-trajectory entries excluded from the
#: ``_mean`` summary (diverged rollouts under bad parameters).
DIVERGED_TAG = "n_diverged"
TRAINING_DURATION = "training_duration"
EVALUATION_DURATION = "evaluation_duration"
LOGGING_DURATION = "logging_duration"
MAX_SAVED_TRAJECTORIES = 5
EVALUATION_VARIABLES = (LOSS_NAME, TRAJECTORY_ERROR_NAME)

# Chunk size bounding peak memory of per-slice evaluation losses.
EVALUATION_SLICE_CHUNK = 1024

LossCallback = Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]
EpochCallback = Callable[[int, Any, float, float], None]


def default_epoch_callback(epoch: int, params: Any, train_loss: float,
                           best_valid_loss: float) -> None:
    """Prints progress (reference ``experiment.py:115-119``)."""
    print(epoch, train_loss, best_valid_loss, flush=True)


def _zero_nonfinite() -> "optax.GradientTransformation":
    """Replaces NaN/inf gradient entries with 0 before they can poison
    Adam's moment estimates (one inf gradient makes ``v`` inf and every
    later update NaN — the parameters never recover)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0,
                                     neginf=0.0), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config, lr) -> "optax.GradientTransformation":
    """Adam(W) with optional gradient sanitization + clipping.

    ``config.grad_clip > 0`` chains (1) zero-out of non-finite gradient
    entries and (2) ``optax.clip_by_global_norm`` in front of the
    optimizer. Note Adam is invariant to uniform gradient scaling, so
    the clip does not shrink well-behaved steps — the chain is a safety
    net for high-energy data protocols whose early wrong-parameter
    batches produce inf/NaN gradients (observed: sliding-rich elbow
    tosses diverged to non-finite parameters within one epoch).
    ``lr`` may be a float or an optax schedule.
    """
    wd = config.wd.value
    optimizer = optax.adamw(lr, weight_decay=wd) if wd > 0 else \
        optax.adam(lr)
    if config.grad_clip > 0.0:
        optimizer = optax.chain(
            _zero_nonfinite(),
            optax.clip_by_global_norm(config.grad_clip),
            optimizer)
    return optimizer


def summarize_statistics(stats: Dict) -> Dict:
    """``{key}_mean`` summaries over per-trajectory statistic vectors.

    NaN-robust: a single diverged rollout (non-finite trajectory under
    bad parameters) must not poison the whole summary mean, so the mean
    is taken over the finite entries and the number of excluded
    non-finite entries is reported as ``{key}_n_diverged`` (only when
    nonzero). Reference summary scheme: ``experiment.py:685-796``.
    """
    summary: Dict = {}
    for key, value in stats.items():
        if isinstance(value, np.ndarray) and value.ndim == 1 and \
                value.size:
            arr = value
        elif isinstance(value, list) and value and \
                isinstance(value[0], float):
            arr = np.asarray(value)
        else:
            continue
        finite = np.isfinite(arr)
        if bool(finite.all()):
            summary[f"{key}_{AVERAGE_TAG}"] = float(np.mean(arr))
        else:
            summary[f"{key}_{AVERAGE_TAG}"] = (
                float(np.mean(arr[finite])) if bool(finite.any())
                else float("nan"))
            summary[f"{key}_{DIVERGED_TAG}"] = int((~finite).sum())
    return summary


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
        self._jit_cache: Dict = {}
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

    def evaluation_mesh(self):
        """Data-parallel mesh for evaluation rollouts, or ``None``.

        With ``config.shard_evaluation`` the trajectory batch shards over
        all available devices (role of the reference's n_pop=16384-scale
        evaluation, ``dataset_generation.py:30``; the reference itself runs
        a serial loop)."""
        if not self.config.shard_evaluation:
            return None
        if len(jax.devices()) <= 1:
            return None
        from dair_pll_tpu.parallel.sharding import make_mesh
        return make_mesh()

    def training_mesh(self, batch_size: int):
        """Data-parallel mesh for the training epoch scan, or ``None``.

        With ``config.shard_training`` the epoch runs SPMD: every
        minibatch splits across the mesh's ``dp`` axis, parameters
        replicate, gradients ``pmean`` over ICI. Uses the largest device
        count that divides ``batch_size`` so per-device batch shapes stay
        equal and static."""
        if not self.config.shard_training:
            return None
        n_devices = len(jax.devices())
        while n_devices > 1 and batch_size % n_devices != 0:
            n_devices -= 1
        if n_devices <= 1:
            return None
        from dair_pll_tpu.parallel.sharding import make_mesh
        return make_mesh(jax.devices()[:n_devices])

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

    def warm_loss_callback(self):
        """Optional epoch-warm training-loss support (``None`` = not
        supported, the default).

        Training revisits every sample each epoch with parameters moved
        by only one optimizer step per minibatch, so expensive per-sample
        solver state (e.g. contact impulses) from the previous visit is a
        near-solution the next visit can start from. Subclasses that can
        exploit this return a pair ``(make_warm_fn, init_cache)``:

        * ``init_cache(n_slices, dtype) -> Array`` — the per-slice solver
          cache, **sample axis last** (gathered/scattered with the epoch
          permutation);
        * ``make_warm_fn(seed: bool)`` — returns
          ``fn(params, x_past, x_future, cache_slice) ->
          (losses (B,), new_cache_slice)``. With ``seed=True`` the
          function must solve from scratch at the full production budget
          (numerically equivalent to :meth:`loss_callback`; used for the
          first epoch of a process run, filling the cache); with
          ``seed=False`` it may run a reduced budget warm-started from
          the cache. ``new_cache_slice`` must be detached (the gradient
          flows only through the losses).
        """
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
        if config.optimizer_config.lr_schedule == "cosine":
            # Cosine decay over the full epoch budget, measured in
            # optimizer steps (wraparound-padded batches per epoch, as
            # scheduled by _epoch_permutation). Counted from the CURRENT
            # dataset size; drip-fed datasets decay slightly faster than
            # nominal, which is benign.
            train_set, _, _ = self.data_manager.get_trajectory_sets()
            n_slices = max(1, len(train_set.slices_past))
            batch = min(config.optimizer_config.batch_size.value, n_slices)
            steps = -(-n_slices // batch) * max(
                1, config.optimizer_config.epochs)
            lr = optax.cosine_decay_schedule(
                lr, decay_steps=steps,
                alpha=config.optimizer_config.cosine_alpha)
        optimizer = build_optimizer(config.optimizer_config, lr)

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
        loss + grad + Adam update.

        With ``config.shard_training`` (and >1 device) the same epoch body
        runs SPMD under ``shard_map``: the batch-index table shards on its
        batch axis so every device gathers and differentiates only its
        slice of each minibatch, and gradients/losses ``pmean`` over the
        ``dp`` axis before the (replicated) Adam update. One jitted call
        per epoch either way — the multi-chip analog of the reference's
        serial batch loop (``system.py:113-124``)."""
        loss_fn = self.loss_callback()
        mesh = self.training_mesh(batch_size)

        def batch_mean_loss(params, x_past, x_future):
            return jnp.mean(loss_fn(params, x_past, x_future))

        grad_fn = jax.value_and_grad(batch_mean_loss)

        def epoch_body(params, opt_state, past, future, batches):
            update_mask = self.parameter_update_mask(params)

            def step(carry, batch_indices):
                params, opt_state = carry
                x_past = jnp.take(past, batch_indices, axis=0)
                x_future = jnp.take(future, batch_indices, axis=0)
                loss, grads = grad_fn(params, x_past, x_future)
                if mesh is not None:
                    from dair_pll_tpu.parallel.sharding import DATA_AXIS
                    grads = jax.lax.pmean(grads, DATA_AXIS)
                    loss = jax.lax.pmean(loss, DATA_AXIS)
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

        def eval_epoch_body(params, past, future, batches, batch_weights):
            """Exact per-slice average: wraparound-padded duplicates carry
            zero weight so the metric is unbiased (the gradient pass keeps
            the duplicates — only model selection needs exactness)."""

            def step(_, scan_in):
                batch_indices, w = scan_in
                x_past = jnp.take(past, batch_indices, axis=0)
                x_future = jnp.take(future, batch_indices, axis=0)
                losses = loss_fn(params, x_past, x_future)
                return None, (jnp.sum(losses * w), jnp.sum(w))

            _, (loss_sums, weight_sums) = jax.lax.scan(
                step, None, (batches, batch_weights))
            loss_sum = jnp.sum(loss_sums)
            weight_sum = jnp.sum(weight_sums)
            if mesh is not None:
                from dair_pll_tpu.parallel.sharding import DATA_AXIS
                loss_sum = jax.lax.psum(loss_sum, DATA_AXIS)
                weight_sum = jax.lax.psum(weight_sum, DATA_AXIS)
            return loss_sum / jnp.maximum(weight_sum, 1.0)

        if mesh is None:
            return jax.jit(epoch_body), jax.jit(eval_epoch_body)

        from dair_pll_tpu.parallel.sharding import (DATA_AXIS, P,
                                                    shard_map)
        epoch_fn = jax.jit(shard_map(
            epoch_body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(None, DATA_AXIS)),
            out_specs=(P(), P(), P())))
        eval_epoch_fn = jax.jit(shard_map(
            eval_epoch_body, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, DATA_AXIS),
                      P(None, DATA_AXIS)),
            out_specs=P()))
        return epoch_fn, eval_epoch_fn

    def _build_warm_train_epoch(self, optimizer, batch_size: int,
                                seed: bool):
        """Compiles an epoch-warm variant of the training epoch: the scan
        carries a per-slice solver cache alongside ``(params, opt_state)``;
        each step gathers its minibatch's cache entries, feeds them to the
        warm loss (:meth:`warm_loss_callback`), and scatters the refreshed
        entries back.

        Under ``shard_training`` the cache stays replicated: devices
        update disjoint index sets (the minibatch index table partitions
        across the ``dp`` axis), so merging is an ``all_gather`` of each
        device's ``(values, indices)`` pair — collective payload
        ``O(batch_size)``, not ``O(n_slices)`` — followed by one scatter
        into the replicated cache. Wraparound-duplicate indices scatter
        identical values (duplicates solve the identical sample at
        identical parameters), so the scatter is value-deterministic."""
        warm = self.warm_loss_callback()
        assert warm is not None
        make_warm_fn, _ = warm
        warm_fn = make_warm_fn(seed)
        mesh = self.training_mesh(batch_size)

        def batch_mean_loss(params, x_past, x_future, cache_b):
            losses, new_cache_b = warm_fn(params, x_past, x_future,
                                          cache_b)
            return jnp.mean(losses), new_cache_b

        grad_fn = jax.value_and_grad(batch_mean_loss, has_aux=True)

        def epoch_body(params, opt_state, cache, past, future, batches):
            update_mask = self.parameter_update_mask(params)

            def step(carry, batch_indices):
                params, opt_state, cache = carry
                x_past = jnp.take(past, batch_indices, axis=0)
                x_future = jnp.take(future, batch_indices, axis=0)
                cache_b = jnp.take(cache, batch_indices, axis=-1)
                (loss, new_cache_b), grads = grad_fn(
                    params, x_past, x_future, cache_b)
                if mesh is not None:
                    from dair_pll_tpu.parallel.sharding import DATA_AXIS
                    grads = jax.lax.pmean(grads, DATA_AXIS)
                    loss = jax.lax.pmean(loss, DATA_AXIS)
                    # O(batch_size) collective payload (ADVICE r4): gather
                    # only the minibatch's refreshed values + indices from
                    # every device and apply ONE scatter into the
                    # replicated cache — NOT a full-cache-sized psum per
                    # step. Wraparound-duplicate indices scatter identical
                    # values (the duplicates solve the identical sample at
                    # identical parameters), so scatter-set is
                    # value-deterministic.
                    all_vals = jax.lax.all_gather(
                        new_cache_b, DATA_AXIS, axis=-1, tiled=True)
                    all_idx = jax.lax.all_gather(
                        batch_indices, DATA_AXIS, axis=0, tiled=True)
                    cache = cache.at[..., all_idx].set(all_vals)
                else:
                    cache = cache.at[..., batch_indices].set(new_cache_b)
                if update_mask is not None:
                    grads = jax.tree_util.tree_map(
                        lambda g, m: g * m, grads, update_mask)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, cache), loss

            (params, opt_state, cache), losses = jax.lax.scan(
                step, (params, opt_state, cache), batches)
            return params, opt_state, cache, jnp.mean(losses)

        if mesh is None:
            return jax.jit(epoch_body)
        from dair_pll_tpu.parallel.sharding import (DATA_AXIS, P,
                                                    shard_map)
        return jax.jit(shard_map(
            epoch_body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(None, DATA_AXIS)),
            out_specs=(P(), P(), P(), P())))

    @staticmethod
    def _epoch_permutation(rng: np.random.Generator, n_slices: int,
                           batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        """Shuffled slice indices padded by wraparound to a whole number of
        batches, plus 0/1 weights marking the wrapped duplicates (weight 0)
        so evaluation passes can average exactly."""
        perm = rng.permutation(n_slices)
        n_batches = max(1, int(np.ceil(n_slices / batch_size)))
        padded = np.resize(perm, n_batches * batch_size)
        weights = np.zeros(n_batches * batch_size, dtype=np.float32)
        weights[:min(n_slices, weights.size)] = 1.0
        return padded, weights

    # -- train loop --------------------------------------------------------------
    def train(self, epoch_callback: EpochCallback = default_epoch_callback
              ) -> Tuple[float, float, Any]:
        """Runs training with early stopping; returns (final train loss,
        best valid loss, best parameters).

        Early stopping follows the reference (``experiment.py:647-657``):
        the monitored metric is the validation *prediction loss* from the
        per-epoch trajectory evaluation, carried forward between
        evaluation epochs when ``full_evaluation_period > 1``.
        """
        config = self.config
        optimizer, state = self.setup_training()
        assert self.data_manager is not None
        ckpt_path = file_utils.checkpoint_path(config.storage,
                                               config.run_name)
        batch_size = int(config.optimizer_config.batch_size.value)
        epoch_fn, eval_epoch_fn = self._build_train_epoch(
            optimizer, batch_size)
        # Epoch-warm solver caching: disabled under dynamic data updates
        # (the slice set — and with it the cache's sample indexing —
        # changes between epochs).
        warm = None if config.data_config.update_dynamically else \
            self.warm_loss_callback()
        if warm is not None:
            seed_epoch_fn = self._build_warm_train_epoch(
                optimizer, batch_size, seed=True)
            warm_epoch_fn = self._build_warm_train_epoch(
                optimizer, batch_size, seed=False)
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
        if warm is not None:
            # The cache is transient (never checkpointed): every process
            # run seeds it with one full-budget epoch, warm thereafter —
            # re-seeding every ``warm_seed_period`` epochs to bound the
            # compounding drift of crease-stalled warm solves (see the
            # config docstring / scripts/diag_warm_divergence.py).
            _, init_cache = warm
            force_cache = init_cache(train_set.n_slices,
                                     train_past.dtype)
            epochs_since_seed: Optional[int] = None

        if state.finished_training:
            # A finished checkpoint only short-circuits when its budget is
            # truly exhausted: successive-halving studies resume the same
            # run with a LARGER epoch budget, which must continue training
            # (early-stopped runs stay finished — patience persists).
            exhausted = (state.epoch > config.optimizer_config.epochs or
                         state.epochs_since_best >=
                         config.optimizer_config.patience)
            if exhausted:
                return 0.0, state.best_valid_loss, state.best_params
            state.finished_training = False

        # Pre-update loss report (reference experiment.py:594-611).
        perm, weights = self._epoch_permutation(
            rng, train_set.n_slices, batch_size)
        train_loss = float(eval_epoch_fn(
            params, train_past, train_future,
            jnp.asarray(perm).reshape(-1, batch_size),
            jnp.asarray(weights).reshape(-1, batch_size)))
        select_objective = config.selection_metric == "objective"
        if state.epoch == 1:
            valid_loss = self._epoch_training_objective_on_valid(
                eval_epoch_fn, params, valid_set, valid_past, valid_future,
                rng, batch_size)
            eval_valid_loss = self.per_epoch_evaluation(
                0, params, train_loss, 0.0, valid_loss)
            state.best_valid_loss = valid_loss if (
                select_objective or eval_valid_loss is None) else \
                eval_valid_loss
            epoch_callback(0, params, train_loss, state.best_valid_loss)

        patience = config.optimizer_config.patience
        carried_valid_loss = state.best_valid_loss
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
                perm, _ = self._epoch_permutation(
                    rng, train_set.n_slices, batch_size)
                batches = jnp.asarray(perm).reshape(-1, batch_size)
                if warm is not None:
                    seed_period = config.warm_seed_period
                    reseed = (epochs_since_seed is None or
                              (seed_period > 0 and
                               epochs_since_seed >= seed_period))
                    fn = seed_epoch_fn if reseed else warm_epoch_fn
                    params, opt_state, force_cache, train_loss_dev = fn(
                        params, opt_state, force_cache, train_past,
                        train_future, batches)
                    epochs_since_seed = 0 if reseed else \
                        epochs_since_seed + 1
                else:
                    params, opt_state, train_loss_dev = epoch_fn(
                        params, opt_state, train_past, train_future,
                        batches)
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

                objective_valid_loss = \
                    self._epoch_training_objective_on_valid(
                        eval_epoch_fn, params, valid_set, valid_past,
                        valid_future, rng, batch_size)
                # Force a full evaluation on the final budgeted epoch so
                # the returned best_valid reflects the trained model even
                # when the budget is shorter than the evaluation period
                # (successive-halving rungs would otherwise compare every
                # trial at the identical epoch-0 metric).
                final_epoch = state.epoch == config.optimizer_config.epochs
                eval_valid_loss = self.per_epoch_evaluation(
                    state.epoch, params, train_loss, training_duration,
                    objective_valid_loss, force=final_epoch)
                if select_objective or \
                        self.config.full_evaluation_samples <= 0:
                    # selection_metric="objective" (or trajectory
                    # evaluation disabled): select models on the training
                    # objective evaluated on the validation set.
                    carried_valid_loss = objective_valid_loss
                elif eval_valid_loss is not None:
                    carried_valid_loss = eval_valid_loss
                valid_loss = carried_valid_loss

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

    def _epoch_training_objective_on_valid(self, eval_epoch_fn, params,
                                           valid_set: TrajectorySet,
                                           valid_past, valid_future, rng,
                                           batch_size: int) -> float:
        """Training objective evaluated on the validation slices (logged
        as ``valid_loss``; e.g. the ContactNets loss for ContactNets
        runs)."""
        if valid_set.n_slices == 0:
            return 0.0
        perm, weights = self._epoch_permutation(
            rng, valid_set.n_slices, batch_size)
        return float(eval_epoch_fn(
            params, valid_past, valid_future,
            jnp.asarray(perm).reshape(-1, batch_size),
            jnp.asarray(weights).reshape(-1, batch_size)))

    # -- per-epoch evaluation ---------------------------------------------------
    def per_epoch_evaluation(self, epoch: int, params: Any,
                             train_loss: float, training_duration: float,
                             objective_valid_loss: float,
                             force: bool = False) -> Optional[float]:
        """Evaluates and logs training progress at the end of an epoch
        (reference ``experiment.py:422-488`` + ``write_to_wandb``
        :380-420).

        Every ``full_evaluation_period`` epochs, evaluates the learned
        system on the first ``full_evaluation_samples`` train/valid
        trajectories (slice prediction losses + full rollouts), logging
        ``{set}_{variable}`` scalars and comparison videos/meshes.

        Returns:
            The validation prediction-loss mean when the evaluation ran
            this epoch, else ``None`` (caller carries the last value
            forward).
        """
        assert self.data_manager is not None
        start_eval = time.time()
        statistics: Dict = {}
        period = max(1, self.config.full_evaluation_period)
        if self.config.full_evaluation_samples > 0 and \
                (force or (epoch % period) == 0):
            train_set, valid_set, _ = self.data_manager.get_trajectory_sets()
            n_samples = self.config.full_evaluation_samples
            eval_sets = {}
            for set_name, full_set in ((TRAIN_SET, train_set),
                                       (VALID_SET, valid_set)):
                sampled = self.data_manager.make_sampled_set(
                    full_set, n_samples)
                if sampled.n_slices:
                    eval_sets[set_name] = sampled
            if eval_sets:
                statistics = self.evaluate_systems_on_sets(
                    {LEARNED_SYSTEM_NAME: (self.learned_system, params)},
                    eval_sets, mesh=self.evaluation_mesh())

        valid_loss_key = \
            f"{VALID_SET}_{LEARNED_SYSTEM_NAME}_{LOSS_NAME}_{AVERAGE_TAG}"
        eval_valid_loss = statistics.get(valid_loss_key)

        statistics[f"{TRAIN_SET}_{LEARNED_SYSTEM_NAME}_{LOSS_NAME}_"
                   f"{AVERAGE_TAG}"] = train_loss
        statistics[TRAINING_DURATION] = training_duration
        statistics[EVALUATION_DURATION] = time.time() - start_eval
        self._write_epoch_log(epoch, params, statistics,
                              objective_valid_loss)
        return float(eval_valid_loss) if eval_valid_loss is not None \
            else None

    def _write_epoch_log(self, epoch: int, params, statistics: Dict,
                         objective_valid_loss: float) -> None:
        """Logs per-epoch scalars plus the learned system's summary and
        the base-vs-learned comparison media (reference ``write_to_wandb``,
        ``experiment.py:380-420``)."""
        start_log = time.time()
        scalars: Dict[str, float] = {}
        aux_names = tuple(self.space.auxiliary_comparisons())
        for stats_set in TRAIN_TIME_SETS:
            for variable in EVALUATION_VARIABLES + aux_names:
                key = f"{stats_set}_{LEARNED_SYSTEM_NAME}_{variable}_" \
                      f"{AVERAGE_TAG}"
                if key in statistics:
                    scalars[f"{stats_set}_{variable}"] = float(
                        statistics[key])
        scalars[f"{TRAIN_SET}_{LOSS_NAME}"] = float(statistics[
            f"{TRAIN_SET}_{LEARNED_SYSTEM_NAME}_{LOSS_NAME}_{AVERAGE_TAG}"])
        scalars[f"{VALID_SET}_{LOSS_NAME}"] = objective_valid_loss
        for duration in (TRAINING_DURATION, EVALUATION_DURATION):
            scalars[duration] = float(statistics[duration])

        assert self.learned_system is not None
        summary = self.learned_system.summary(params, scalars)
        scalars.update(summary.scalars)
        videos = dict(summary.videos)
        videos.update(
            self.base_and_learned_comparison_summary(statistics, params))
        scalars[LOGGING_DURATION] = time.time() - start_log
        assert self.log_manager is not None
        self.log_manager.update(epoch, scalars, videos, summary.meshes)

    # -- evaluation -----------------------------------------------------------
    def trajectory_predict(self, system: System, params: Any,
                           trajectories, t_skip: int, mesh=None):
        """Rollout predictions for full (variable-length) trajectories.

        Pads all trajectories to the maximum length, vmaps one fixed-horizon
        rollout, and returns per-trajectory (prediction, target, mask)
        triples — replacing the reference's per-trajectory Python loop
        (``experiment.py:250-290``) with a single batched rollout. With a
        ``mesh`` the trajectory batch shards over its data axis.
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

        x_hist = padded[:, :t_begin]
        if system.host_stepped:
            # Stateful host simulators (MuJoCo oracle) roll out
            # sequentially, like the reference's max_batch_dim=0 systems.
            rows = []
            for hist in x_hist:
                x_0, carry = system.preprocess_initial_condition(
                    params, hist, system.initial_carry(jnp.asarray(
                        hist[-1])))
                rows.append(np.asarray(system.simulate(
                    params, x_0, horizon, carry_0=carry))[1:])
            predictions = np.stack(rows)
            targets = padded[:, t_begin:]
            masks = (np.arange(horizon)[None, :] <
                     (lengths - t_begin)[:, None])
            return predictions, targets, masks

        rollout = self._rollout_fn(system, horizon, mesh)

        if mesh is not None:
            n_devices = mesh.devices.size
            batch_pad = (-len(trajectories)) % n_devices
            if batch_pad:
                x_hist = np.concatenate(
                    [x_hist, np.repeat(x_hist[-1:], batch_pad, axis=0)])
            predictions = np.asarray(rollout(params, jnp.asarray(x_hist)))
            predictions = predictions[:len(trajectories)]
        else:
            predictions = np.asarray(rollout(params, jnp.asarray(x_hist)))

        targets = padded[:, t_begin:]
        masks = (np.arange(horizon)[None, :] <
                 (lengths - t_begin)[:, None])
        return predictions, targets, masks

    def _rollout_fn(self, system: System, horizon: int, mesh):
        """Cached jitted batched rollout ``(params, x_hist) -> (B, H, n_x)``
        (sharded over ``mesh`` when given)."""
        mesh_key = None if mesh is None else \
            tuple(d.id for d in mesh.devices.flat)
        key = ("rollout", id(system), horizon, mesh_key)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def predict_one(params, hist):
            x_0, carry = system.preprocess_initial_condition(
                params, hist, system.initial_carry(hist[-1]))
            trajectory = system.simulate(params, x_0, horizon, carry_0=carry)
            return trajectory[1:]

        def batched(params, x_hist):
            return jax.vmap(lambda h: predict_one(params, h))(x_hist)

        if mesh is None:
            fn = jax.jit(batched)
        else:
            from dair_pll_tpu.parallel.sharding import (
                make_data_parallel_rollout)
            fn = make_data_parallel_rollout(batched, mesh)
        self._jit_cache[key] = fn
        return fn

    def _trajectory_metrics_fn(self, system: System):
        """Cached jitted masked per-trajectory metrics: trajectory MSE plus
        every pointwise auxiliary comparison, as masked means over valid
        steps — one device call, one host transfer."""
        key = ("traj_metrics", id(system))
        if key in self._jit_cache:
            return self._jit_cache[key]
        space = system.space
        pointwise = space.auxiliary_pointwise_comparisons()

        @jax.jit
        def metrics(predictions, targets, masks):
            m = masks.astype(predictions.dtype)
            counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)

            def masked_mean(per_step):
                return jnp.sum(per_step * m, axis=1) / counts

            out = {TRAJECTORY_ERROR_NAME: masked_mean(
                space.state_square_error(predictions, targets))}
            for name, fn in pointwise.items():
                out[name] = masked_mean(fn(predictions, targets))
            return out

        self._jit_cache[key] = metrics
        return metrics

    def _host_slice_losses(self, system: System, params, past,
                           future) -> np.ndarray:
        """Per-slice prediction losses for host-stepped systems: rollouts
        run sequentially on host, the velocity-MSE reduction is the same
        math as :meth:`prediction_loss`."""
        space = system.space
        past = np.asarray(past)
        future = np.asarray(future)
        t_prediction = future.shape[-2]
        predicted = []
        for hist in past:
            x_0, carry = system.preprocess_initial_condition(
                params, hist, system.initial_carry(jnp.asarray(hist[-1])))
            predicted.append(np.asarray(system.simulate(
                params, x_0, t_prediction, carry_0=carry))[1:])
        x_predicted = jnp.asarray(np.stack(predicted))
        v_future = space.v(jnp.asarray(future))
        v_predicted = space.v(x_predicted)
        per_element = space.velocity_square_error(
            v_future.reshape(v_future.shape[0], -1, space.n_v),
            v_predicted.reshape(v_predicted.shape[0], -1, space.n_v))
        n_elements = t_prediction * space.n_v
        return np.asarray(jnp.sum(per_element, axis=-1) / n_elements)

    def _slice_loss_fn(self, system: System):
        """Cached jitted chunked per-slice prediction loss (bounds peak
        memory at ``EVALUATION_SLICE_CHUNK`` concurrent rollouts)."""
        if system.host_stepped:
            return lambda params, past, future: self._host_slice_losses(
                system, params, past, future)
        key = ("slice_loss", id(system))
        if key in self._jit_cache:
            return self._jit_cache[key]

        @jax.jit
        def chunked(params, past, future):
            def one_chunk(scan_in):
                chunk_past, chunk_future = scan_in
                return self.prediction_loss(system, params, chunk_past,
                                            chunk_future)

            losses = jax.lax.map(one_chunk, (past, future))
            return losses.reshape(-1)

        def slice_losses(params, past, future):
            n = past.shape[0]
            # Round the chunk up to a power of two so evaluation sets of
            # similar size reuse one compiled scan shape.
            chunk = min(EVALUATION_SLICE_CHUNK,
                        1 << max(0, (n - 1)).bit_length())
            pad = (-n) % chunk
            if pad:
                past = jnp.concatenate(
                    [past, jnp.repeat(past[-1:], pad, axis=0)])
                future = jnp.concatenate(
                    [future, jnp.repeat(future[-1:], pad, axis=0)])
            past = past.reshape(-1, chunk, *past.shape[1:])
            future = future.reshape(-1, chunk, *future.shape[1:])
            return chunked(params, past, future)[:n]

        self._jit_cache[key] = slice_losses
        return slice_losses

    def evaluate_systems_on_sets(self, systems: Dict[str, Tuple[System,
                                                                Any]],
                                 sets: Dict[str, TrajectorySet],
                                 mesh=None) -> Dict:
        """Builds the statistics dictionary (reference
        ``experiment.py:685-796``): per-slice losses, velocity norms,
        trajectory MSE, auxiliary comparisons, sample trajectories, and
        ``_mean`` summaries. All per-trajectory metrics are computed as one
        masked batched device call per (set, system) pair."""
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
                losses = np.asarray(
                    self._slice_loss_fn(system)(params, past, future))
                stats[f"{set_name}_{system_name}_{LOSS_NAME}"] = losses

                predictions, targets, masks = self.trajectory_predict(
                    system, params, trajectory_set.trajectories, t_skip,
                    mesh=mesh)
                metrics = self._trajectory_metrics_fn(system)(
                    jnp.asarray(predictions), jnp.asarray(targets),
                    jnp.asarray(masks))
                metrics = jax.device_get(metrics)
                for name, values in metrics.items():
                    stats[f"{set_name}_{system_name}_{name}"] = \
                        np.asarray(values)

                if system_name == LEARNED_SYSTEM_NAME:
                    n_save = min(MAX_SAVED_TRAJECTORIES, len(predictions))
                    stats[f"{set_name}_{system_name}_{TARGET_NAME}"] = [
                        targets[i][masks[i]] for i in range(n_save)]
                    stats[f"{set_name}_{system_name}_{PREDICTION_NAME}"] = [
                        predictions[i][masks[i]] for i in range(n_save)]

        stats.update(summarize_statistics(stats))
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
        evaluation = self.evaluate_systems_on_sets(
            systems, sets, mesh=self.evaluation_mesh())
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
