"""Study-layer tests: hyperparameter search with successive halving."""
import dataclasses
import os

import numpy as np
import pytest

from dair_pll_tpu.hyperparameter import Float
from dair_pll_tpu.study import Study, StudyConfig
from dair_pll_tpu.training.config import (OptimizerConfig,
                                          SupervisedLearningExperimentConfig)
from dair_pll_tpu.utils import file_utils


class FakeExperiment:
    """Deterministic stand-in: valid loss = |lr - 1e-3| scaled, improving
    with epochs."""

    def __init__(self, config):
        self.config = config

    def train(self, epoch_callback):
        lr = self.config.optimizer_config.lr.value
        epochs = self.config.optimizer_config.epochs
        loss = abs(np.log10(lr) - np.log10(1e-3)) + 1.0 / epochs
        return loss, loss, None

    def generate_results(self, epoch_callback):
        loss, _, _ = self.train(epoch_callback)
        return None, {"test_model_trajectory_mse_mean": loss}


def make_study(tmp_path, n_trials=8):
    base = SupervisedLearningExperimentConfig(
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3, log=True, low=1e-5, high=1e-1)),
        storage=str(tmp_path), run_name="unused")
    base.optimizer_config.epochs = 16
    return Study(StudyConfig(
        experiment_factory=FakeExperiment, base_config=base,
        study_name="test_study", n_trials=n_trials, min_epochs=2,
        reduction_factor=2, seed=0))


def test_optimize_hyperparameters(tmp_path):
    study = make_study(tmp_path)
    best = study.optimize_hyperparameters()
    assert "optimizer_config.lr" in best
    # the winner should be reasonably close to the optimum 1e-3
    assert 1e-5 < best["optimizer_config.lr"] < 1e-1
    saved = file_utils.load_hyperparameters(str(tmp_path), "test_study")
    assert saved["values"] == best
    assert len(saved["trials"]) == 8
    # successive halving pruned most trials
    pruned = [t for t in saved["trials"] if t["pruned"]]
    assert len(pruned) >= 4


def test_datasweep(tmp_path):
    study = make_study(tmp_path, n_trials=2)
    generated = []
    results = study.run_datasweep_sample(
        [4, 16], generate_data=generated.append, repetitions=2)
    assert generated == [4, 16]
    assert set(results) == {4, 16}
    assert len(results[4]) == 2
    assert "test_model_trajectory_mse_mean" in results[4][0]


def test_quasirandom_suggestions_deterministic_and_spread():
    """Sobol suggestions: deterministic in seed, within distribution
    bounds, and better-spread than the worst i.i.d. case (every dim's
    n-point projection is stratified)."""
    from dair_pll_tpu.hyperparameter import (
        Categorical, Float, Int, generate_quasirandom_suggestions)
    from dair_pll_tpu.training.config import OptimizerConfig

    config = OptimizerConfig(lr=Float(1e-3), wd=Float(1e-5),
                             batch_size=Int(32))
    a = generate_quasirandom_suggestions(config, 16, seed=5)
    b = generate_quasirandom_suggestions(config, 16, seed=5)
    assert a == b
    c = generate_quasirandom_suggestions(config, 16, seed=6)
    assert a != c
    for suggestion in a:
        assert 1e-5 <= suggestion["lr"] <= 1e-1
        assert suggestion["batch_size"] >= 1
    # log-space spread: 16 Sobol points cover at least half the range's
    # octaves (i.i.d. can collapse; Sobol cannot)
    lrs = np.log10([s["lr"] for s in a])
    assert lrs.max() - lrs.min() > 2.0

    cat = Categorical("a", ["a", "b", "c"])
    assert cat.from_unit(0.0) == "a"
    assert cat.from_unit(0.999) == "c"
