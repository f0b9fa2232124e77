r"""Trajectory dataset generation: simulate, noise, save.

Rebuild of the reference's ``dataset_generation.py``
(``/root/reference/dair_pll/dataset_generation.py:22-151``): roll out a
base system from sampled initial conditions, save ground-truth copies, add
static (whole-trajectory) and dynamic (per-step) white noise on the Lie
algebra, re-project velocities to configuration finite differences
(``dataset_generation.py:127-151`` / ``state_space.py:379-399``), and save
the noised learning copies.

TPU-first: all trajectories in a batch are generated with a single vmapped
``lax.scan`` rollout instead of the reference's batches-of-30 Python loop.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.state_space import (StateSpace, StateSpaceSampler,
                                      WhiteNoiser)
from dair_pll_tpu.system import System
from dair_pll_tpu.utils import file_utils


@dataclasses.dataclass
class DataGenerationConfig:
    """Dataset generation configuration (reference
    ``dataset_generation.py:22-55``).

    Attributes:
        dt: time step.
        n_pop: total number of trajectories on disk.
        trajectory_length: states per trajectory.
        static_noise: ``(2 n_v,)`` per-coordinate scale of noise applied
          once per trajectory.
        dynamic_noise: ``(2 n_v,)`` per-coordinate scale of noise applied
          each step.
        noiser_kind: "gaussian" or "uniform".
        seed: PRNG seed.
        max_velocity: if set, trajectories whose velocity coordinates
          ever exceed this bound in absolute value (or go non-finite)
          are REJECTED and resampled. Extension beyond the reference
          (whose Drake rollouts are robust): batched f32 contact
          rollouts can blow up on rare high-energy initial conditions
          (per-sample solver-failure masking zeroes impulses for one
          step, letting bodies interpenetrate), and one diverged
          trajectory poisons every training batch it lands in — the
          round-4 sliding-elbow protocol saw ``v^2 ~ 1e26`` samples
          drive training to select the initial parameters.
    """
    dt: float = 1e-3
    n_pop: int = 16384
    trajectory_length: int = 80
    static_noise: Optional[np.ndarray] = None
    dynamic_noise: Optional[np.ndarray] = None
    noiser_kind: str = "gaussian"
    seed: int = 0
    max_velocity: Optional[float] = None

    def __post_init__(self):
        assert self.dt > 0
        assert self.n_pop > 0
        assert self.trajectory_length > 0
        assert self.max_velocity is None or self.max_velocity > 0


class ExperimentDatasetGenerator:
    """Generates and stores simulated trajectories for an experiment.

    Mirrors reference ``ExperimentDatasetGenerator``
    (``dataset_generation.py:58-151``).
    """

    def __init__(self, system: System, sampler: StateSpaceSampler,
                 params, config: DataGenerationConfig) -> None:
        self.system = system
        self.sampler = sampler
        self.params = params
        self.config = config
        #: Trajectories rejected by the ``max_velocity`` divergence
        #: filter during the last :meth:`generate` call.
        self.last_rejected = 0

    def generate(self, storage: str, batch_size: int = 256) -> int:
        """Fills the storage tree up to ``n_pop`` trajectories.

        With ``config.max_velocity`` set, diverged rollouts are dropped
        and their slots resampled (rejection count in
        :attr:`last_rejected`); generation aborts if the acceptance
        rate collapses below 5% (the sampler is then drawing from a
        regime the simulator cannot integrate — widen ``dt`` or narrow
        the sampler instead of filtering harder).

        Returns:
            Number of newly generated trajectories.
        """
        config = self.config
        space = self.system.space
        existing = len(file_utils.list_trajectories(
            file_utils.trajectory_dir(storage,
                                      file_utils.GROUND_TRUTH_SUBDIR)))
        key = jax.random.PRNGKey(config.seed + existing)
        generated = 0
        self.last_rejected = 0
        index = existing
        while index < config.n_pop:
            # Always simulate full batch_size batches — a remainder (or
            # post-rejection refill) shape would recompile the batched
            # rollout (minutes per shape on TPU); surplus rows are
            # simply not saved.
            key, init_key, noise_key = jax.random.split(key, 3)
            x_0 = self.sampler.get_samples(init_key, batch_size)
            ground_truth = self.system.simulate_batch(
                self.params, x_0, config.trajectory_length - 1)
            noised = self.make_noised_trajectories(
                noise_key, ground_truth)
            ground_truth = np.asarray(ground_truth)
            noised = np.asarray(noised)
            if config.max_velocity is not None:
                velocity = ground_truth[..., space.n_q:]
                keep = (np.isfinite(ground_truth).all(axis=(1, 2)) &
                        (np.abs(velocity) <=
                         config.max_velocity).all(axis=(1, 2)))
                self.last_rejected += int(batch_size - keep.sum())
                ground_truth = ground_truth[keep]
                noised = noised[keep]
                if self.last_rejected > 19 * max(
                        generated + ground_truth.shape[0], batch_size):
                    raise RuntimeError(
                        f"dataset generation rejected "
                        f"{self.last_rejected} trajectories against "
                        f"{generated + ground_truth.shape[0]} accepted "
                        f"(max_velocity={config.max_velocity}); the "
                        f"sampled regime is not integrable at this dt")
            n_new = min(ground_truth.shape[0], config.n_pop - index)
            for row in range(n_new):
                file_utils.save_trajectory(
                    storage, file_utils.GROUND_TRUTH_SUBDIR, index,
                    ground_truth[row])
                file_utils.save_trajectory(
                    storage, file_utils.LEARNING_SUBDIR, index,
                    noised[row])
                index += 1
                generated += 1
        return generated

    def make_noised_trajectories(self, key, trajectories: jnp.ndarray
                                 ) -> jnp.ndarray:
        """Applies static + dynamic noise, then re-projects velocities to
        finite differences (reference ``dataset_generation.py:127-151``).

        Note the output is one state shorter than the input (finite
        differencing drops step 0).
        """
        config = self.config
        space = self.system.space
        noiser = WhiteNoiser(space, config.noiser_kind)
        x = trajectories
        k_static, k_dynamic = jax.random.split(key)
        if config.static_noise is not None:
            static_ranges = jnp.asarray(config.static_noise, x.dtype)
            # One draw per trajectory, shared across time.
            def noise_one(k, traj):
                return noiser.noise(k, traj, static_ranges,
                                    independent=False)
            keys = jax.random.split(k_static, x.shape[0])
            x = jax.vmap(noise_one)(keys, x)
        if config.dynamic_noise is not None:
            dynamic_ranges = jnp.asarray(config.dynamic_noise, x.dtype)
            x = noiser.noise(k_dynamic, x, dynamic_ranges,
                             independent=True)
        return space.project_derivative(
            space.project_state(x), config.dt)
