r"""First-class hyperparameters embedded in config dataclasses.

Rebuild of the reference's ``hyperparameter.py``
(``/root/reference/dair_pll/hyperparameter.py:36-309``): configs hold
``Float``/``Int``/``Categorical`` hyperparameter objects carrying both a
concrete value and a search distribution; :func:`traverse_config`
recursively discovers them, and suggestion/loading utilities let the study
layer (``dair_pll_tpu.study``) optimize them. The reference delegates
distributions to optuna; here sampling is self-contained (optuna is not a
dependency).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence

import numpy as np

# Default search ranges around a value (reference hyperparameter.py:90-185).
DEFAULT_LOG_RANGE = 100.0
DEFAULT_INT_RANGE = 4


class Hyperparameter:
    """A value plus a search distribution."""

    def __init__(self, value: Any) -> None:
        self._value = value

    @property
    def value(self) -> Any:
        """Concrete value used by the experiment."""
        return self._value

    @value.setter
    def value(self, new_value: Any) -> None:
        self._value = new_value

    def sample(self, rng: np.random.Generator) -> Any:
        """Draws one value from the search distribution."""
        raise NotImplementedError

    def distribution(self) -> Dict[str, Any]:
        """JSON-serializable description of the distribution."""
        raise NotImplementedError


class Float(Hyperparameter):
    """Continuous hyperparameter, by default log-uniform around the value
    (reference ``hyperparameter.py:126-185``)."""

    def __init__(self, value: float, log: bool = True,
                 low: Optional[float] = None,
                 high: Optional[float] = None) -> None:
        super().__init__(float(value))
        self.log = log
        if low is None or high is None:
            if log:
                low = value / DEFAULT_LOG_RANGE
                high = value * DEFAULT_LOG_RANGE
            else:
                low = value / 2
                high = value * 2
        self.low = float(low)
        self.high = float(high)

    def sample(self, rng: np.random.Generator) -> float:
        if self.log:
            return float(np.exp(rng.uniform(
                math.log(self.low), math.log(self.high))))
        return float(rng.uniform(self.low, self.high))

    def distribution(self) -> Dict[str, Any]:
        return {"type": "float", "low": self.low, "high": self.high,
                "log": self.log}


class Int(Hyperparameter):
    """Integer hyperparameter, by default log-uniform around the value."""

    def __init__(self, value: int, log: bool = True,
                 low: Optional[int] = None,
                 high: Optional[int] = None) -> None:
        super().__init__(int(value))
        self.log = log
        if low is None or high is None:
            if log:
                low = max(1, value // DEFAULT_INT_RANGE)
                high = value * DEFAULT_INT_RANGE
            else:
                low = max(1, value - DEFAULT_INT_RANGE)
                high = value + DEFAULT_INT_RANGE
        self.low = int(low)
        self.high = int(high)

    def sample(self, rng: np.random.Generator) -> int:
        if self.log:
            return int(round(np.exp(rng.uniform(
                math.log(self.low), math.log(self.high)))))
        return int(rng.integers(self.low, self.high + 1))

    def distribution(self) -> Dict[str, Any]:
        return {"type": "int", "low": self.low, "high": self.high,
                "log": self.log}


class Categorical(Hyperparameter):
    """Categorical hyperparameter over explicit choices (reference
    ``hyperparameter.py:189-204``)."""

    def __init__(self, value: Any, choices: Sequence[Any]) -> None:
        super().__init__(value)
        assert value in choices
        self.choices = list(choices)

    def sample(self, rng: np.random.Generator) -> Any:
        return self.choices[int(rng.integers(len(self.choices)))]

    def distribution(self) -> Dict[str, Any]:
        return {"type": "categorical", "choices": self.choices}


def traverse_config(config: Any, prefix: str = "") -> Dict[
        str, Hyperparameter]:
    """Recursively finds all hyperparameters in a (nested dataclass) config.

    Mirrors reference ``hyperparameter.py:207-236``; keys are dotted
    attribute paths.
    """
    found: Dict[str, Hyperparameter] = {}
    if isinstance(config, Hyperparameter):
        found[prefix.rstrip(".")] = config
        return found
    if dataclasses.is_dataclass(config) and not isinstance(config, type):
        for field in dataclasses.fields(config):
            value = getattr(config, field.name)
            found.update(traverse_config(value, f"{prefix}{field.name}."))
    elif isinstance(config, dict):
        for key, value in config.items():
            found.update(traverse_config(value, f"{prefix}{key}."))
    elif isinstance(config, (list, tuple)):
        for index, value in enumerate(config):
            found.update(traverse_config(value, f"{prefix}{index}."))
    return found


def generate_suggestion(config: Any,
                        rng: np.random.Generator) -> Dict[str, Any]:
    """Samples a value for every hyperparameter in the config and applies
    it in place (reference ``hyperparameter.py:238-265``).

    Returns:
        Dotted-path to sampled value mapping.
    """
    suggestion = {}
    for name, hyperparameter in traverse_config(config).items():
        value = hyperparameter.sample(rng)
        hyperparameter.value = value
        suggestion[name] = value
    return suggestion


def load_suggestion(config: Any, suggestion: Dict[str, Any]) -> None:
    """Applies a saved suggestion to the config's hyperparameters
    (reference ``hyperparameter.py:267-288``)."""
    hyperparameters = traverse_config(config)
    for name, value in suggestion.items():
        if name in hyperparameters:
            hyperparameters[name].value = value


def hyperparameter_values(config: Any) -> Dict[str, Any]:
    """Current values of all hyperparameters in the config (reference
    ``hyperparameter.py:290-309``)."""
    return {name: h.value
            for name, h in traverse_config(config).items()}
