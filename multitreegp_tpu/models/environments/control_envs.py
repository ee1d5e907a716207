"""Control environments: ODE plants for symbolic policy evolution.

Behavioural ports of the reference's seven control tasks
(``MultiTreeGP/environments/control_environments/``), re-expressed as pure
single-lane functions with explicit parameter pytrees. Parameter randomisation
modes Constant / Different / Switch / Decay are kept; Switch/Decay return
per-save-point arrays that ``params_at`` linearly interpolates at solver time
(the reference wraps these in ``diffrax.LinearInterpolation``).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax.random as jr
from jax import Array

from .base import ControlEnvironmentBase, time_varying


def _switch_series(key: Array, batch: int, ts: Array, minval: float, maxval: float) -> Array:
    """(B, T) series that jumps once at a random switch time — vectorised
    version of the reference's per-sample Python loop
    (``harmonic_oscillator.py:37-49``)."""
    t_key, a_key, b_key = jr.split(key, 3)
    T = ts.shape[0]
    switch = jr.randint(t_key, (batch,), minval=T // 4, maxval=3 * T // 4)
    before = jr.uniform(a_key, (batch,), minval=minval, maxval=maxval)
    after = jr.uniform(b_key, (batch,), minval=minval, maxval=maxval)
    idx = jnp.arange(T)[None, :]
    return jnp.where(idx < switch[:, None], before[:, None], after[:, None])


def _decay_series(key: Array, batch: int, ts: Array, minval: float, maxval: float,
                  d_min: float = 0.98, d_max: float = 1.02) -> Array:
    k_init, k_decay = jr.split(key)
    init = jr.uniform(k_init, (batch,), minval=minval, maxval=maxval)
    decay = jr.uniform(k_decay, (batch,), minval=d_min, maxval=d_max)
    return init[:, None] * decay[:, None] ** ts[None, :]


class HarmonicOscillator(ControlEnvironmentBase):
    """Damped harmonic oscillator with LQR-style quadratic cost
    (reference ``harmonic_oscillator.py:8-84``)."""

    n_targets = 1
    tile_safe_drift = True

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 2):
        super().__init__(process_noise, obs_noise, n_var=2, n_control=1, n_dim=1, n_obs=n_obs)
        self.mu0 = jnp.zeros(2)
        self.p0 = jnp.diag(jnp.array([3.0, 1.0]))
        self.q = self.r = 0.5

    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        k_init, k_target = jr.split(key)
        x0 = self.mu0 + jr.normal(k_init, (batch_size, 2)) @ self.p0
        targets = jr.uniform(k_target, (batch_size, self.n_targets), minval=-3.0, maxval=3.0)
        return x0, targets

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        k_omega, k_zeta = jr.split(key)
        if mode == "Constant":
            return jnp.ones(batch_size), jnp.zeros(batch_size)
        if mode == "Different":
            return (
                jr.uniform(k_omega, (batch_size,), minval=0.0, maxval=2.0),
                jr.uniform(k_zeta, (batch_size,), minval=0.0, maxval=1.5),
            )
        if mode == "Switch":
            return (
                _switch_series(k_omega, batch_size, ts, 0.5, 1.5),
                _switch_series(k_zeta, batch_size, ts, 0.0, 1.0),
            )
        if mode == "Decay":
            return (
                _decay_series(k_omega, batch_size, ts, 0.5, 1.5),
                _decay_series(k_zeta, batch_size, ts, 0.0, 1.0),
            )
        raise ValueError(f"unknown param mode {mode!r}")

    def params_at(self, params, ts: Array, t: Array):
        omega, zeta = params
        return time_varying(omega, ts, t), time_varying(zeta, ts, t)

    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        omega, zeta = params
        return jnp.array([x[1], -omega * x[0] - zeta * x[1] + u[0]])

    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        omega, zeta = params
        omega0 = jnp.asarray(omega).reshape(-1)[0]  # cost uses initial physics
        tgt = jnp.squeeze(target)
        u_d = omega0 * tgt  # -pinv(b) @ A @ [target, 0]
        pos_err = xs[:, 0] - tgt
        return jnp.sum(self.q * pos_err**2 + self.r * (us[:, 0] - u_d) ** 2)


class ChangingHarmonicOscillator(HarmonicOscillator):
    """Time-varying A(t) variant (reference ``harmonic_oscillator.py:86-169``):
    params are always per-save-point series, interpolated at solver time.
    The fused kernel streams the series and interpolates in-register
    (``pallas_policy`` time-varying path), so the drift stays tile-safe."""

    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        k_init, k_target = jr.split(key)
        p0 = jnp.diag(jnp.array([2.0, 1.0]))
        x0 = self.mu0 + jr.normal(k_init, (batch_size, 2)) @ p0
        targets = jnp.full((batch_size, self.n_targets), -2.0)
        return x0, targets

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        k_omega, k_zeta = jr.split(key)
        if mode == "Decay":
            # reference uses growing omega / decaying zeta (:131-137)
            omegas = _decay_series(k_omega, batch_size, ts, 0.6, 0.6, 1.05, 1.05)
            zetas = _decay_series(k_zeta, batch_size, ts, 0.3, 0.5, 0.97, 0.98)
            return omegas, zetas
        return super().sample_params(batch_size, mode, ts, key)

    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        omega, zeta = params
        tgt = jnp.squeeze(target)
        omega_t = jnp.asarray(omega) * jnp.ones_like(ts)
        u_d = omega_t * tgt
        pos_err = xs[:, 0] - tgt
        return jnp.sum(self.q * pos_err**2 + self.r * (us[:, 0] - u_d) ** 2)


class HarmonicOscillator2(ControlEnvironmentBase):
    """Two coupled oscillators, 2-D control (reference
    ``harmonic_oscillator.py:172-236``): block-diagonal A with weak coupling.

    ``drift`` spells the (fixed) A/B matmuls index-wise so it traces on
    stacked register tiles (``tile_safe_drift``) — a 4x4 matmul over the
    state axis would not."""

    tile_safe_drift = True

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int | None = None):
        super().__init__(
            process_noise, obs_noise, n_var=2, n_control=2, n_dim=2, n_obs=n_obs or 4
        )
        self.n_targets = 2
        self.mu0 = jnp.zeros(4)
        self.p0 = jnp.diag(jnp.array([3.0, 1.0, 3.0, 1.0]))
        self.q = self.r = 0.5
        a = jnp.zeros((4, 4))
        a = a.at[0, 1].set(1.0).at[1, 0].set(-1.0)
        a = a.at[2, 3].set(1.0).at[3, 2].set(-1.0)
        a = a.at[3, 0].set(-0.5).at[1, 2].set(-0.5)
        self.a_mat = a
        self.b_mat = jnp.zeros((4, 2)).at[1, 0].set(1.0).at[3, 1].set(1.0)

    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        k_init, k_target = jr.split(key)
        x0 = self.mu0 + jr.normal(k_init, (batch_size, 4)) @ self.p0
        targets = jr.uniform(k_target, (batch_size, self.n_targets), minval=-3.0, maxval=3.0)
        return x0, targets

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        return jnp.zeros(batch_size)

    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        # == a_mat @ x + b_mat @ u with the constructor's sparsity
        return jnp.stack([
            x[1],
            -x[0] - 0.5 * x[2] + u[0],
            x[3],
            -x[2] - 0.5 * x[0] + u[1],
        ])

    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        x_d = jnp.zeros(4).at[0].set(target[0]).at[2].set(target[1])
        u_d = -jnp.linalg.pinv(self.b_mat) @ self.a_mat @ x_d
        q_mat = jnp.diag(jnp.array([self.q, 0.0, self.q, 0.0]))
        err = xs - x_d
        cost_x = jnp.einsum("ti,ij,tj->t", err, q_mat, err)
        du = us - u_d
        cost_u = self.r * jnp.sum(du * du, axis=-1)
        return jnp.sum(cost_x + cost_u)


class CartPole(ControlEnvironmentBase):
    tile_safe_drift = True

    """Classic cart-pole (reference ``cart_pole.py:7-80``); cost counts
    invalid (diverged) trajectory points."""

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 4):
        super().__init__(process_noise, obs_noise, n_var=4, n_control=1, n_dim=1, n_obs=n_obs)
        self.init_bounds = jnp.array([0.05, 0.05, 0.05, 0.05])
        self.g = 9.81
        self.pole_mass = 0.1
        self.pole_length = 0.5
        self.cart_mass = 1.0

    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        k_init, _ = jr.split(key)
        x0 = jr.uniform(
            k_init, (batch_size, 4), minval=-self.init_bounds, maxval=self.init_bounds
        )
        return x0, jnp.zeros((batch_size, 0))

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        return jnp.zeros(batch_size)

    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        control = jnp.clip(jnp.squeeze(u), -1.0, 1.0)
        _, theta, x_dot, theta_dot = x[0], x[1], x[2], x[3]
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        total_mass = self.cart_mass + self.pole_mass
        theta_acc = (
            self.g * sin_t
            - cos_t * (control + self.pole_mass * self.pole_length * theta_dot**2 * sin_t) / total_mass
        ) / (self.pole_length * (4.0 / 3.0 - self.pole_mass * cos_t**2 / total_mass))
        x_acc = (
            control
            + self.pole_mass * self.pole_length * (theta_dot**2 * sin_t - theta_acc * cos_t)
        ) / total_mass
        return jnp.array([x_dot, theta_dot, x_acc, theta_acc])

    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        invalid = jnp.any(jnp.isinf(xs), axis=-1) | jnp.isnan(us[:, 0])
        return jnp.sum(invalid.astype(jnp.float32))


class Acrobot(ControlEnvironmentBase):
    """Underactuated two-link swing-up, one torque (reference
    ``acrobot.py:7-87``); the StaticPolicy/DynamicPolicy notebooks' benchmark.

    ``tile_safe_drift``: the dynamics are elementwise over indexed state, so
    the same ``drift`` code traces on stacked register tiles inside the fused
    Pallas policy rollout.

    Fitness = index of first success (link tips above 1.5) + full horizon if
    never successful + control cost before success. Observations wrap both
    angles into [-pi, pi). A velocity-bound event kills runaway trajectories.
    """

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 4):
        super().__init__(process_noise, obs_noise, n_var=4, n_control=1, n_dim=1, n_obs=n_obs)
        self.init_bounds = jnp.array([0.1, 0.1, 0.1, 0.1])
        self.r_cost = 0.01
        self.g = 9.81
        self.moi = 1.0

    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        k_init, _ = jr.split(key)
        x0 = jr.uniform(
            k_init, (batch_size, 4), minval=-self.init_bounds, maxval=self.init_bounds
        )
        return x0, jnp.zeros((batch_size, 0))

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        ones = jnp.ones(batch_size)
        return ones, ones, ones, ones  # l1, l2, m1, m2 (Constant mode, :24-27)

    tile_safe_drift = True

    def f_obs(self, key: Array, t: Array, x: Array, params) -> Array:
        y = super().f_obs(key, t, x, params)
        wrap = lambda a: (a + jnp.pi) % (2 * jnp.pi) - jnp.pi
        return jnp.concatenate([wrap(y[:2]), y[2:]])[: self.n_obs]

    def obs_tiles(self, x: Array) -> Array:
        wrap = lambda a: (a + jnp.pi) % (2 * jnp.pi) - jnp.pi
        return jnp.concatenate([wrap(x[:2]), x[2:]])[: self.n_obs]

    def obs_tiles_noisy(self, x: Array, noise: Array) -> Array:
        # f_obs wraps AFTER adding noise
        wrap = lambda a: (a + jnp.pi) % (2 * jnp.pi) - jnp.pi
        y = x[: self.n_obs] + noise
        return jnp.concatenate([wrap(y[:2]), y[2:]])

    def _accelerations(self, x: Array, torque1: Array, torque2: Array, params) -> Array:
        l1, l2, m1, m2 = params
        lc1, lc2 = 0.5 * l1, 0.5 * l2
        th1, th2, dth1, dth2 = x[0], x[1], x[2], x[3]
        d1 = m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(th2)) + 2 * self.moi
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(th2)) + self.moi
        phi2 = m2 * lc2 * self.g * jnp.cos(th1 + th2 - jnp.pi / 2)
        phi1 = (
            -m2 * l1 * lc2 * dth2**2 * jnp.sin(th2)
            - 2 * m2 * l1 * lc2 * dth1 * dth2 * jnp.sin(th1)
            + (m1 * lc1 + m2 * l1) * self.g * jnp.cos(th1 - jnp.pi / 2)
            + phi2
        )
        th2_acc = (
            torque2 + d2 / d1 * phi1 - m2 * l1 * lc2 * dth1**2 * jnp.sin(th2) - phi2
        ) / (m2 * lc2**2 + self.moi - d2**2 / d1)
        th1_acc = -(torque1 + d2 * th2_acc + phi1) / d1
        return jnp.array([dth1, dth2, th1_acc, th2_acc])

    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        control = jnp.clip(jnp.squeeze(u), -1.0, 1.0)
        # single torque on the second joint; the first joint is unactuated
        # (reference acrobot.py:53-66: theta2_acc gets `control`, theta1_acc
        # has no direct torque term)
        return self._accelerations(x, jnp.asarray(0.0), control, params)

    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        reached = -jnp.cos(xs[:, 0]) - jnp.cos(xs[:, 0] + xs[:, 1]) > 1.5
        first_success = jnp.argmax(reached)
        control_cost = self.r_cost * jnp.sum(us * us, axis=-1)
        step_idx = ts / (ts[1] - ts[0])
        costs = jnp.where(step_idx > first_success, 0.0, control_cost)
        never = (first_success == 0) & ~reached[0]
        # reference treats argmax==0 as "never reached" (acrobot.py:84);
        # identical when x0 never satisfies the threshold
        return first_success + jnp.where(first_success == 0, ts.shape[0], 0) + jnp.sum(costs)

    def cond_alive(self, t: Array, x: Array) -> Array:
        return (jnp.abs(x[2]) <= 8 * jnp.pi) & (jnp.abs(x[3]) <= 18 * jnp.pi)


class Acrobot2(Acrobot):
    """Two-torque acrobot with randomisable physics (reference
    ``acrobot.py:89-212``)."""

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int | None = None):
        super().__init__(process_noise, obs_noise, n_obs=n_obs or 4)
        self.n_control = 2

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        keys = jr.split(key, 4)
        if mode == "Constant":
            ones = jnp.ones(batch_size)
            return ones, ones, ones, ones
        if mode == "Different":
            return tuple(
                jr.uniform(k, (batch_size,), minval=0.75, maxval=1.25) for k in keys
            )
        if mode == "Switch":
            return tuple(_switch_series(k, batch_size, ts, 0.75, 1.25) for k in keys)
        if mode == "Decay":
            return tuple(_decay_series(k, batch_size, ts, 0.75, 1.25) for k in keys)
        raise ValueError(f"unknown param mode {mode!r}")

    def params_at(self, params, ts: Array, t: Array):
        return tuple(time_varying(p, ts, t) for p in params)

    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        control = jnp.clip(u, -1.0, 1.0)
        # reference acrobot.py:195-197: c1 acts on joint 2, c2 on joint 1 with
        # sign flipped relative to the single-torque variant
        l1, l2, m1, m2 = params
        out = self._accelerations(x, -control[1], control[0], params)
        return out


class StirredTankReactor(ControlEnvironmentBase):
    tile_safe_drift = True

    """Exothermic CSTR with Arrhenius kinetics and coolant control
    (reference ``reactor.py:7-99``). State: (Tc, T, c)."""

    def __init__(self, process_noise: float = 0.0, obs_noise: float = 0.0, n_obs: int = 3,
                 n_targets: int = 1):
        super().__init__(process_noise, obs_noise, n_var=3, n_control=1, n_dim=1, n_obs=n_obs)
        self.n_targets = n_targets
        self.init_lower = jnp.array([275.0, 350.0, 0.5])
        self.init_upper = jnp.array([300.0, 375.0, 1.0])
        self.ea_over_r = 72750.0 / 8.314
        self.k0 = 7.2e10
        self.cf = 1.0
        self.q_t = 0.01
        self.r_u = 0.0001

    def sample_init_states(self, batch_size: int, key: Array) -> Tuple[Array, Array]:
        k_init, k_target = jr.split(key)
        x0 = jr.uniform(
            k_init, (batch_size, 3), minval=self.init_lower, maxval=self.init_upper
        )
        targets = jr.uniform(k_target, (batch_size, self.n_targets), minval=400.0, maxval=500.0)
        return x0, targets

    def sample_params(self, batch_size: int, mode: str, ts: Array, key: Array):
        ones = jnp.ones(batch_size)
        if mode == "Constant":
            return (100 * ones, 239 * ones, -5.0e4 * ones, 5.0e4 * ones,
                    100 * ones, 300 * ones, 300 * ones, 20.0 * ones)
        if mode == "Different":
            keys = jr.split(key, 8)
            ranges = [(75, 150), (200, 350), (-55000, -45000), (25000, 75000),
                      (75, 125), (300, 350), (250, 300), (10, 30)]
            return tuple(
                jr.uniform(k, (batch_size,), minval=lo, maxval=hi)
                for k, (lo, hi) in zip(keys, ranges)
            )
        raise ValueError(f"unknown param mode {mode!r}")

    def _obs_matrices(self, params):
        c = jnp.eye(3)[: self.n_obs]
        w = self.obs_noise * jnp.eye(self.n_obs) * jnp.array([15.0, 15.0, 0.1])[: self.n_obs]
        return c, w

    def drift(self, t: Array, x: Array, u: Array, params) -> Array:
        vol, cp, dhr, ua, q, tf, tcf, volc = params
        tc, temp, c = x[0], x[1], jnp.clip(x[2], 0.0, 1.0)
        control = jnp.clip(jnp.squeeze(u), 0.0, 300.0)
        k_rate = self.k0 * jnp.exp(-self.ea_over_r / temp)
        dc = (q / vol) * (self.cf - c) - k_rate * c
        dtemp = (q / vol) * (tf - temp) + (-dhr / cp) * k_rate * c + (ua / vol / cp) * (tc - temp)
        dtc = (control / volc) * (tcf - tc) + (ua / volc / cp) * (temp - tc)
        return jnp.array([dtc, dtemp, dc])

    def fitness(self, xs: Array, us: Array, target: Array, ts: Array, params) -> Array:
        temp_err = xs[:, 1] - jnp.squeeze(target)
        return jnp.sum(self.q_t * temp_err**2 + self.r_u * us[:, 0] ** 2)
