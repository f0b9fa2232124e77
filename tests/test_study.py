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


def test_to_unit_roundtrips_from_unit():
    from dair_pll_tpu.hyperparameter import Categorical, Float, Int

    log_f = Float(1e-3, log=True, low=1e-6, high=1e-1)
    lin_f = Float(0.5, log=False, low=0.0, high=2.0)
    for u in (0.0, 0.1, 0.5, 0.9):
        assert abs(log_f.to_unit(log_f.from_unit(u)) - u) < 1e-12
        assert abs(lin_f.to_unit(lin_f.from_unit(u)) - u) < 1e-12
    log_i = Int(64, log=True, low=8, high=512)
    for u in (0.05, 0.4, 0.95):
        v = log_i.from_unit(u)
        assert log_i.from_unit(log_i.to_unit(v)) == v
    cat = Categorical("b", ["a", "b", "c"])
    for choice in ("a", "b", "c"):
        assert cat.from_unit(cat.to_unit(choice)) == choice


def test_tpe_suggestions_concentrate_near_good_observations():
    """The Parzen surrogate must exploit: conditioned on losses minimized
    at lr=1e-3, its proposals sit measurably closer to 1e-3 (in log
    space) than the Sobol exploration draws. Also deterministic, and
    falls back to Sobol below the startup threshold."""
    from dair_pll_tpu.hyperparameter import (
        Float, generate_quasirandom_suggestions, generate_tpe_suggestions)
    from dair_pll_tpu.training.config import OptimizerConfig

    config = OptimizerConfig(lr=Float(1e-3, log=True, low=1e-6,
                                      high=1e-1))
    explore = generate_quasirandom_suggestions(config, 16, seed=3)
    losses = [abs(np.log10(s["lr"]) + 3.0) for s in explore]

    exploit = generate_tpe_suggestions(config, explore, losses, 8, seed=3)
    assert exploit == generate_tpe_suggestions(config, explore, losses, 8,
                                               seed=3)
    explore_err = np.median([abs(np.log10(s["lr"]) + 3.0)
                             for s in explore])
    exploit_err = np.median([abs(np.log10(s["lr"]) + 3.0)
                             for s in exploit])
    assert exploit_err < 0.5 * explore_err
    for suggestion in exploit:
        assert 1e-6 <= suggestion["lr"] <= 1e-1

    fallback = generate_tpe_suggestions(config, explore[:2], losses[:2],
                                        4, seed=9)
    assert fallback == generate_quasirandom_suggestions(config, 4, seed=9)


def test_study_tpe_sampler_end_to_end(tmp_path):
    """sampler="tpe": both phases run, all trials recorded, and the
    exploitation phase lands at least one trial tighter to the optimum
    than the exploration median."""
    base = SupervisedLearningExperimentConfig(
        optimizer_config=OptimizerConfig(
            lr=Float(1e-2, log=True, low=1e-5, high=1e-1)),
        storage=str(tmp_path), run_name="unused")
    base.optimizer_config.epochs = 8
    study = Study(StudyConfig(
        experiment_factory=FakeExperiment, base_config=base,
        study_name="tpe_study", n_trials=12, min_epochs=2,
        reduction_factor=2, seed=1, sampler="tpe"))
    best = study.optimize_hyperparameters()
    saved = file_utils.load_hyperparameters(str(tmp_path), "tpe_study")
    assert len(saved["trials"]) == 12
    errs = [abs(np.log10(t["suggestion"]["optimizer_config.lr"]) + 3.0)
            for t in saved["trials"]]
    explore_median = np.median(errs[:6])
    assert min(errs[6:]) <= explore_median
    assert abs(np.log10(best["optimizer_config.lr"]) + 3.0) <= \
        explore_median
