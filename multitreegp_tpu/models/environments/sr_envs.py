"""Symbolic-regression time-series environments.

Behavioural ports of the reference's three SR tasks
(``MultiTreeGP/environments/SR_environments/``): fixed-parameter drifts,
Gaussian/uniform init-state samplers, diagonal diffusion constants.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.random as jr
from jax import Array

from .base import SREnvironmentBase


class LotkaVolterra(SREnvironmentBase):
    """Predator-prey dynamics (reference ``lotka_volterra.py:6-35``)."""

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 2):
        super().__init__(process_noise, obs_noise, n_var=2, n_obs=n_obs)
        self.alpha, self.beta, self.delta, self.gamma = 1.1, 0.4, 0.1, 0.4
        self.init_mu = jnp.array([10.0, 10.0])
        self.init_sd = 2.0

    def sample_init_states(self, batch_size: int, key: Array) -> Array:
        return jr.uniform(key, (batch_size, 2), minval=5.0, maxval=15.0)

    def drift(self, t: Array, x: Array) -> Array:
        prey, pred = x[0], x[1]
        return jnp.array(
            [
                self.alpha * prey - self.beta * prey * pred,
                self.delta * prey * pred - self.gamma * pred,
            ]
        )


class LorenzAttractor(SREnvironmentBase):
    """Chaotic Lorenz system (reference ``lorenz_attractor.py:6-32``)."""

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 3):
        super().__init__(process_noise, obs_noise, n_var=3, n_obs=n_obs)
        self.sigma, self.rho, self.beta = 10.0, 28.0, 8.0 / 3.0
        self.init_mu = jnp.array([1.0, 1.0, 1.0])
        self.init_sd = 1.0

    def sample_init_states(self, batch_size: int, key: Array) -> Array:
        return self.init_mu + self.init_sd * jr.normal(key, (batch_size, 3))

    def drift(self, t: Array, x: Array) -> Array:
        return jnp.array(
            [
                self.sigma * (x[1] - x[0]),
                x[0] * (self.rho - x[2]) - x[1],
                x[0] * x[1] - self.beta * x[2],
            ]
        )


class VanDerPolOscillator(SREnvironmentBase):
    """Van der Pol oscillator, mu=1 (reference ``vd_pol_oscillator.py:6-29``);
    the SymbolicRegression notebook's benchmark system."""

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 2):
        super().__init__(process_noise, obs_noise, n_var=2, n_obs=n_obs)
        self.mu = 1.0
        self.init_mu = jnp.array([0.0, 0.0])
        self.init_sd = jnp.array([1.0, 1.0])

    def sample_init_states(self, batch_size: int, key: Array) -> Array:
        return self.init_mu + self.init_sd * jr.normal(key, (batch_size, 2))

    def drift(self, t: Array, x: Array) -> Array:
        return jnp.array([x[1], self.mu * (1.0 - x[0] ** 2) * x[1] - x[0]])
