"""Environment bases: ODE task definitions with deterministic-in-t obs noise.

Functional redesign of the reference's environment layer
(``MultiTreeGP/environments/*/..._base.py``): environments hold only static
configuration; per-trajectory physics parameters are explicit pytrees threaded
through ``drift``/``f_obs``/``fitness`` instead of being written onto ``self``
by ``initialize_parameters`` (which is incompatible with vmap/jit without the
reference's per-call ``copy.copy`` trick, ``feedforward_evaluate.py:79``).

Observation noise must be a *deterministic function of t* so that solvers that
re-evaluate the same time point see identical noise: the key is folded with
the bitcast of t (reference ``control_environment_base.py:6-20,43-48``) —
kept exactly.
"""
from __future__ import annotations

import abc
from typing import Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import Array


def bitcast_time(t: Array) -> Array:
    """float time -> int32 bits for PRNG folding
    (reference ``force_bitcast_convert_type``)."""
    return jax.lax.bitcast_convert_type(jnp.asarray(t, jnp.float32), jnp.int32)


def obs_noise_at(key: Array, t: Array, n_obs: int) -> Array:
    """Standard-normal obs noise, deterministic in (key, t)."""
    return jr.normal(jr.fold_in(key, bitcast_time(t)), (n_obs,))


class SREnvironmentBase(abc.ABC):
    """Time-series environment for symbolic regression
    (reference ``SR_environments/time_series_environment_base.py:22-48``)."""

    def __init__(self, process_noise: float, obs_noise: float, n_var: int, n_obs: int):
        self.process_noise = process_noise
        self.obs_noise = obs_noise
        self.n_var = n_var
        self.n_obs = n_obs

    @abc.abstractmethod
    def sample_init_states(self, batch_size: int, key: Array) -> Array:
        ...

    @abc.abstractmethod
    def drift(self, t: Array, x: Array) -> Array:
        """Single-lane drift: x (n_var,) -> dx (n_var,)."""

    def diffusion(self, t: Array, x: Array) -> Array:
        return self.process_noise * jnp.eye(self.n_var)

    def f_obs(self, key: Array, t: Array, x: Array) -> Array:
        c = jnp.eye(self.n_var)[: self.n_obs]
        w = self.obs_noise * jnp.eye(self.n_obs)
        return c @ x + obs_noise_at(key, t, self.n_obs) @ w


class ControlEnvironmentBase(abc.ABC):
    """Controlled ODE environment
    (reference ``control_environments/control_environment_base.py:22-63``)."""

    n_targets: int = 0

    def __init__(
        self,
        process_noise: float,
        obs_noise: float,
        n_var: int,
        n_control: int,
        n_dim: int,
        n_obs: int,
    ):
        self.process_noise = process_noise
        self.obs_noise = obs_noise
        self.n_var = n_var
        self.n_control = n_control
        self.n_dim = n_dim
        self.n_obs = n_obs

    @property
    def latent_size(self) -> int:
        return self.n_var * self.n_dim

    @abc.abstractmethod
    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        """Returns (x0 (B, latent), targets (B, n_targets))."""

    @abc.abstractmethod
    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        """Per-trajectory physics params pytree; modes
        Constant / Different / Switch / Decay."""

    def prepare_params(self, params, ts: Array):
        """Hook for precomputing interpolation tables etc. Default: identity."""
        return params

    def params_at(self, params, ts: Array, t: Array):
        """Resolve time-varying params at time t (evaluators call this right
        before ``drift``). Default: identity — constant physics."""
        return params

    @abc.abstractmethod
    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        """Single-lane controlled drift: x (latent,), u (n_control,)."""

    def diffusion(self, t: Array, x: Array, u: Array, params) -> Array:
        return self.process_noise * jnp.eye(self.latent_size)

    def _obs_matrices(self, params) -> Tuple[Array, Array]:
        c = jnp.eye(self.latent_size)[: self.n_obs]
        w = self.obs_noise * jnp.eye(self.n_obs)
        return c, w

    def f_obs(self, key: Array, t: Array, x: Array, params) -> Array:
        c, w = self._obs_matrices(params)
        return c @ x + obs_noise_at(key, t, self.n_obs) @ w

    @abc.abstractmethod
    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        """Single-trajectory cost from saved states (T, latent) and controls
        (T, n_control)."""

    def cond_alive(self, t: Array, x: Array) -> Array:
        """Extra liveness predicate (True = keep integrating); the integrator
        already checks finiteness."""
        return jnp.asarray(True)

    # ---- tile protocol (fused Pallas policy rollout) -----------------------
    # ``drift``/``cond_alive`` written as elementwise ops over an indexed
    # state vector trace unchanged on stacked ``(latent, sublane, lane)``
    # register tiles; envs whose drift needs state-axis matmuls or explicit
    # time dependence must leave ``tile_safe_drift = False``.
    tile_safe_drift: bool = False

    def obs_tiles(self, x: Array) -> Array:
        """Noise-free observation on stacked tiles ``x (latent, S, L)`` —
        the zero-noise specialisation of ``f_obs`` (C = eye truncation).
        Override alongside ``f_obs`` (e.g. angle wrapping)."""
        return x[: self.n_obs]

    def obs_tiles_noisy(self, x: Array, noise: Array) -> Array:
        """``f_obs`` on stacked tiles with the noise term precomputed:
        ``noise (n_obs, S, L)`` is the already-scaled additive draw
        (``obs_noise_at(key, t) @ W``, streamed into the fused kernel).
        Override alongside ``f_obs`` when noise is not last (e.g. Acrobot
        wraps angles AFTER adding noise)."""
        return self.obs_tiles(x) + noise


def time_varying(param: Array, ts: Array, t: Array) -> Array:
    """Resolve a possibly time-varying scalar parameter.

    Scalars pass through; per-save-point arrays (T,) are linearly
    interpolated at t (replacement for ``diffrax.LinearInterpolation``
    wrapping in Switch/Decay modes).
    """
    from ..integrators import linear_interp

    param = jnp.asarray(param)
    if param.ndim == 0:
        return param
    return linear_interp(ts, param, t)
