"""Bayesian reward models for discrete bandits (reference:
dex-net/src/dexnet/learning/models.py:36-487): Bernoulli (MLE), Beta-Bernoulli
(conjugate), and independent Gaussian models with snapshots."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Snapshot:
    best_pred_ind: int
    num_obs: np.ndarray


@dataclass
class BernoulliSnapshot(Snapshot):
    means: np.ndarray


@dataclass
class BetaBernoulliSnapshot(Snapshot):
    alphas: np.ndarray
    betas: np.ndarray


@dataclass
class GaussianSnapshot(Snapshot):
    means: np.ndarray
    variances: np.ndarray
    sample_vars: np.ndarray


class DiscreteModel:
    """Interface: predict(i) -> (mean, var); update(i, value); sample()."""

    def num_vars(self):
        return self.num_vars_

    def max_prediction(self):
        """(best indices, best means, best vars) over all candidates."""
        means, variances = self.predict_all()
        best = np.max(means)
        idx = np.where(means == best)[0]
        return idx, means[idx], variances[idx]

    def predict(self, index):
        means, variances = self.predict_all()
        return means[index], variances[index]

    def predict_all(self):
        raise NotImplementedError

    def update(self, index, value):
        raise NotImplementedError

    def sample(self, rng=None):
        raise NotImplementedError

    def snapshot(self):
        raise NotImplementedError


class BernoulliModel(DiscreteModel):
    """MLE Bernoulli means (models.py:121-199)."""

    def __init__(self, num_vars: int, mean_prior: float = 0.5):
        self.num_vars_ = num_vars
        self.means_ = mean_prior * np.ones(num_vars)
        self.num_obs_ = np.zeros(num_vars)

    def predict_all(self):
        n = np.maximum(self.num_obs_, 1)
        return self.means_, self.means_ * (1 - self.means_) / n

    def update(self, index, value):
        n = self.num_obs_[index]
        self.means_[index] = (self.means_[index] * n + value) / (n + 1)
        self.num_obs_[index] += 1

    def sample(self, rng=None):
        return self.means_

    def snapshot(self):
        best = self.max_prediction()[0][0]
        return BernoulliSnapshot(int(best), self.num_obs_.copy(),
                                 self.means_.copy())


class BetaBernoulliModel(DiscreteModel):
    """Conjugate Beta-Bernoulli posterior per candidate (models.py:202-315)."""

    def __init__(self, num_vars: int, alpha_prior: float = 1.0,
                 beta_prior: float = 1.0):
        self.num_vars_ = num_vars
        self.alphas_ = alpha_prior * np.ones(num_vars)
        self.betas_ = beta_prior * np.ones(num_vars)
        self.num_obs_ = np.zeros(num_vars)

    @property
    def posterior_alphas(self):
        return self.alphas_

    @property
    def posterior_betas(self):
        return self.betas_

    def predict_all(self):
        a, b = self.alphas_, self.betas_
        means = a / (a + b)
        variances = a * b / ((a + b) ** 2 * (a + b + 1))
        return means, variances

    def update(self, index, value):
        self.alphas_[index] += value
        self.betas_[index] += 1.0 - value
        self.num_obs_[index] += 1

    def sample(self, rng=None):
        rng = rng or np.random
        return rng.beta(self.alphas_, self.betas_)

    def snapshot(self):
        best = self.max_prediction()[0][0]
        return BetaBernoulliSnapshot(int(best), self.num_obs_.copy(),
                                     self.alphas_.copy(), self.betas_.copy())


class GaussianModel(DiscreteModel):
    """Independent Gaussian mean estimation (models.py:317-420): running mean
    + sample variance per candidate; predictive variance = s^2 / n."""

    def __init__(self, num_vars: int):
        self.num_vars_ = num_vars
        self.means_ = np.zeros(num_vars)
        self.squared_means_ = np.zeros(num_vars)
        self.num_obs_ = np.zeros(num_vars)

    @property
    def means(self):
        return self.means_

    @property
    def sample_vars(self):
        return np.maximum(self.squared_means_ - self.means_ ** 2, 0.0)

    @property
    def variances(self):
        return self.sample_vars / np.maximum(self.num_obs_, 1)

    def predict_all(self):
        return self.means_, self.variances

    def update(self, index, value):
        n = self.num_obs_[index]
        self.means_[index] = (self.means_[index] * n + value) / (n + 1)
        self.squared_means_[index] = (
            self.squared_means_[index] * n + value ** 2) / (n + 1)
        self.num_obs_[index] += 1

    def sample(self, rng=None, stop=False):
        rng = rng or np.random
        std = np.sqrt(self.variances)
        return self.means_ + std * rng.randn(self.num_vars_)

    def snapshot(self):
        best = self.max_prediction()[0][0]
        return GaussianSnapshot(int(best), self.num_obs_.copy(),
                                self.means_.copy(), self.variances.copy(),
                                self.sample_vars.copy())
