r"""MuJoCo cross-validation experiments.

Rebuild of the reference's ``mujoco_experiment.py``
(``/root/reference/dair_pll/mujoco_experiment.py:16-44``): the base
(data-generating) system is a soft-contact MuJoCo simulator and the
evaluation *oracle* is the UKF-smoothing MuJoCo system, whose P0/R
covariances are derived from the dataset's noise configuration exactly as
the reference does (``mujoco_experiment.py:35-44``).

The MuJoCo systems are stateful host code, so their evaluation rollouts
run through the experiment layer's sequential host path
(``System.host_stepped``); the learnable system under training stays on
the TPU compute path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import numpy as np

from dair_pll_tpu.deep_learnable import DeepLearnableExperiment
from dair_pll_tpu.mujoco_system import MuJoCoSystem, MuJoCoUKFSystem
from dair_pll_tpu.state_space import WhiteNoiser
from dair_pll_tpu.training.config import SupervisedLearningExperimentConfig
from dair_pll_tpu.training.experiment import SupervisedLearningExperiment
from dair_pll_tpu.training.multibody_experiment import (
    MultibodyLearnableExperiment)


@dataclasses.dataclass
class MuJoCoExperimentConfig(SupervisedLearningExperimentConfig):
    """MuJoCo experiment configuration (reference
    ``mujoco_experiment.py:16-21``).

    Attributes:
        xml: MuJoCo MJCF template path (``$solrefarg1/$solrefarg2/$dt``
          placeholders, reference ``mujoco_system.py:58-68``).
        stiffness / damping_ratio / v200: contact-model parameters
          templated into ``solref``.
        static_noise / dynamic_noise: per-Lie-algebra-coordinate noise
          standard deviations of the dataset (``(2 n_v,)``), mapped to the
          UKF oracle's P0/R (reference ``mujoco_experiment.py:38-41``).
        noise_kind: ``"gaussian"`` or ``"uniform"`` noiser for the
          covariance mapping.
        ukf_bias: use the bias-augmented UKF oracle (estimates a static
          configuration bias alongside the state; reference
          ``mujoco_system.py:252-372`` BIAS mode) — the second oracle
          axis of the reference's cross-validation studies.
    """
    xml: str = ""
    stiffness: float = 100.0
    damping_ratio: float = 1.0
    v200: bool = False
    static_noise: Tuple[float, ...] = ()
    dynamic_noise: Tuple[float, ...] = ()
    noise_kind: str = "gaussian"
    ukf_bias: bool = False


def build_mujoco_base_system(config: MuJoCoExperimentConfig
                             ) -> Tuple[MuJoCoSystem, Any]:
    """MuJoCo simulator bound as the experiment's base system (reference
    ``mujoco_experiment.py:29-33``); parameters are ``None`` (host C
    code owns its state)."""
    system = MuJoCoSystem(config.xml, config.data_config.dt,
                          config.stiffness, config.damping_ratio,
                          config.v200)
    return system, None


def build_mujoco_oracle_system(config: MuJoCoExperimentConfig
                               ) -> Tuple[MuJoCoUKFSystem, Any]:
    """UKF-smoothing oracle with P0/R derived from the configured data
    noise (reference ``mujoco_experiment.py:35-44``)."""
    base_system, _ = build_mujoco_base_system(config)
    space = base_system.space
    n_tan = (3 if config.ukf_bias else 2) * space.n_v
    P0 = R = None
    if len(config.static_noise):
        static = np.asarray(config.static_noise, np.float64)
        dynamic = np.asarray(config.dynamic_noise, np.float64)
        P0_diag, R_diag = MuJoCoUKFSystem.noise_stds_to_P0_R_stds(
            static, dynamic, config.data_config.dt, bias=config.ukf_bias)
        # Per-coordinate variances under the configured noise kind
        # (WhiteNoiser.covariance semantics, extended to the bias block).
        factor = WhiteNoiser(space, config.noise_kind).variance_factor
        full = np.zeros(n_tan)
        full[:P0_diag.size] = P0_diag
        P0 = np.diag(factor * full * full)
        full[:] = 0.0
        full[:R_diag.size] = R_diag
        R = np.diag(factor * full * full)
        # Keep the filter well-posed where the data is noiseless.
        eps = 1e-9 * np.eye(n_tan)
        P0 = P0 + eps
        R = R + eps
    system = MuJoCoUKFSystem(config.xml, config.data_config.dt,
                             config.stiffness, config.damping_ratio,
                             config.v200, P0=P0, R=R,
                             bias=config.ukf_bias)
    return system, None


class MuJoCoExperiment(SupervisedLearningExperiment):
    """Experiment with a MuJoCo base system and a UKF-smoothing oracle
    (reference ``MuJoCoExperiment``, ``mujoco_experiment.py:24-44``).

    Subclasses (or mixins) supply :meth:`get_learned_system`.
    """

    def __init__(self, config: MuJoCoExperimentConfig) -> None:
        super().__init__(config)
        self._mujoco_base_cache: Optional[Tuple[MuJoCoSystem, Any]] = None
        self._mujoco_oracle_cache: Optional[Tuple[MuJoCoUKFSystem,
                                                  Any]] = None

    def get_base_system(self) -> Tuple[MuJoCoSystem, Any]:
        assert isinstance(self.config, MuJoCoExperimentConfig)
        if self._mujoco_base_cache is None:
            self._mujoco_base_cache = build_mujoco_base_system(self.config)
        return self._mujoco_base_cache

    def get_oracle_system(self) -> Tuple[MuJoCoUKFSystem, Any]:
        assert isinstance(self.config, MuJoCoExperimentConfig)
        if self._mujoco_oracle_cache is None:
            self._mujoco_oracle_cache = \
                build_mujoco_oracle_system(self.config)
        return self._mujoco_oracle_cache


class MuJoCoDeepLearnableExperiment(DeepLearnableExperiment,
                                    MuJoCoExperiment):
    """MuJoCo base/oracle with a deep learnable model under training — the
    composition the reference ships (``mujoco_experiment.py:24``:
    ``MuJoCoExperiment(DeepLearnableExperiment)``)."""


class MuJoCoMultibodyLearnableExperiment(MultibodyLearnableExperiment):
    """MuJoCo cross-validation of the structured ContactNets model:
    MuJoCo generates/serves data, the UKF system is the oracle, and the
    learnable system is the JAX multibody engine (BASELINE config 5's
    comparison on identical sets)."""

    def __init__(self, config: MuJoCoExperimentConfig) -> None:
        super().__init__(config)
        self._mujoco_base_cache: Optional[Tuple[MuJoCoSystem, Any]] = None
        self._mujoco_oracle_cache: Optional[Tuple[MuJoCoUKFSystem,
                                                  Any]] = None

    def get_base_system(self) -> Tuple[MuJoCoSystem, Any]:
        assert isinstance(self.config, MuJoCoExperimentConfig)
        if self._mujoco_base_cache is None:
            self._mujoco_base_cache = build_mujoco_base_system(self.config)
        return self._mujoco_base_cache

    def get_oracle_system(self) -> Tuple[MuJoCoUKFSystem, Any]:
        assert isinstance(self.config, MuJoCoExperimentConfig)
        if self._mujoco_oracle_cache is None:
            self._mujoco_oracle_cache = \
                build_mujoco_oracle_system(self.config)
        return self._mujoco_oracle_cache
