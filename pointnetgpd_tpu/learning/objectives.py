"""Objective functions for adaptive sampling (reference:
dex-net/src/dexnet/learning/objectives.py:33-380)."""

from __future__ import annotations

import numpy as np


class Objective:
    """Callable objective; subclasses implement ``evaluate``."""

    def __call__(self, x):
        return self.evaluate(x)

    def evaluate(self, x):
        raise NotImplementedError

    def check_valid_input(self, x):
        pass


class MinimizationObjective(Objective):
    """Negates a wrapped objective so maximizers minimize it."""

    def __init__(self, objective: Objective):
        self.objective_ = objective

    def evaluate(self, x):
        return -self.objective_(x)


class NonDeterministicObjective(Objective):
    """Evaluates a deterministic objective on a sample from candidate.sample()."""

    def __init__(self, det_objective: Objective):
        self.det_objective_ = det_objective

    def evaluate(self, x):
        x_val = x.sample() if hasattr(x, "sample") else x
        return self.det_objective_.evaluate(x_val)


class RandomBinaryObjective(Objective):
    """Bernoulli draw with the candidate's value as success probability
    (objectives.py — used by the bandit convergence tests)."""

    def __init__(self, rng=None):
        self.rng = rng or np.random.RandomState()

    def evaluate(self, x):
        self.check_valid_input(x)
        return int(self.rng.rand() < float(x))

    def check_valid_input(self, x):
        v = float(x)
        if not 0.0 <= v <= 1.0:
            raise ValueError("Binary objective value must be in [0, 1]")


class RandomContinuousObjective(Objective):
    """Gaussian noise around the candidate's value."""

    def __init__(self, noise: float = 0.1, rng=None):
        self.noise = noise
        self.rng = rng or np.random.RandomState()

    def evaluate(self, x):
        return float(x) + self.noise * self.rng.randn()
