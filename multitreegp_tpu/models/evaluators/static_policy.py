"""Static (feedforward) symbolic-policy evaluator.

Behavioural spec (reference ``MultiTreeGP/evaluators/feedforward_evaluate.py``):
the candidate's trees map noisy observations (+ targets) to a control signal
``u = trees([y, target])`` recomputed inside the ODE drift every step
(:104-110); after integration, observations and controls are re-derived on the
save grid (:96-97) and the fitness is the environment's cost over
(states, controls) (:99), with diverged trajectories mapped to
``max_fitness = 1e4`` (:27,48-51).

TPU-first redesign: one ``lax.scan`` advances the full
``(population x rollouts)`` closed-loop state; observation noise stays a
deterministic function of t (``fold_in(key, bitcast(t))``), so the fixed-step
scheme sees exactly the reference's noise semantics. Divergence (NaN or the
env's bound event, e.g. acrobot velocity limits) freezes the lane via the
integrator's alive mask.

Data contract (reference ``evaluate_control_loop`` arg order):
``data = (x0, ts, targets, process_noise_keys, obs_noise_keys, params)``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ...core.interpreter import evaluate_trees
from ...core.registry import FunctionSet
from ...core.trees import TreeTensors
from ..integrators import (
    adaptive_step_budget,
    integrate,
    integrate_adaptive,
    integrate_sde,
)


class StaticPolicyEvaluator:
    """Fitness = env cost of the closed loop driven by the candidate policy."""

    def __init__(
        self,
        env,
        fset: FunctionSet | None = None,
        max_fitness: float = 1e4,
        method: str = "rk4",
        substeps: int = 4,
        remat: bool = False,
        interpreter: str = "auto",
        stochastic: bool = False,
        rtol: float = 1e-4,
        atol: float = 1e-4,
        adaptive_method: str = "bosh3",
    ) -> None:
        self.env = env
        self.fset = fset
        self.max_fitness = max_fitness
        self.method = method
        self.substeps = substeps
        self.remat = remat
        self.interpreter = interpreter
        self.stochastic = stochastic
        self.rtol = rtol
        self.atol = atol
        self.adaptive_method = adaptive_method

    def _controls(self, policy: TreeTensors, obs: Array, targets: Array) -> Array:
        """u = trees([y, target]) for obs (..., B, n_obs), targets (B, n_t)."""
        data = jnp.concatenate(
            [obs, jnp.broadcast_to(targets, obs.shape[:-1] + targets.shape[-1:])], axis=-1
        )
        return evaluate_trees(policy, data[..., None, :], self.fset, impl=self.interpreter)

    def _rollout(self, population: TreeTensors, data: Tuple):
        """Dispatch: fused whole-rollout Pallas kernel when the env/config
        qualifies (see pallas_policy), else the general scan path.

        Returns ``(xs, alive, us_or_None)`` — the fused kernel streams the
        replay's save-grid controls alongside the states (``us``), so
        callers skip the separate replay interpreter pass; the general path
        returns ``us=None`` and the caller replays."""
        env = self.env
        if (
            self.interpreter in ("auto", "pallas")
            and self.method in ("euler", "heun", "rk4")
            and self.fset.num_variables == env.n_obs + env.n_targets
        ):
            from ...core.pallas_policy import policy_rollout_available

            if policy_rollout_available(env, self.fset, population, data[5]):
                try:
                    return self._rollout_fused(population, data)
                except ValueError:
                    pass  # traced time grid etc. -> general path
        if (
            self.interpreter in ("auto", "pallas")
            and self.method == "adaptive"
            and not (self.stochastic and getattr(env, "process_noise", 0.0) > 0.0)
            and self.fset.num_variables == env.n_obs + env.n_targets
        ):
            # the notebooks' Dopri5+PID configuration, fused (noise-free,
            # constant params — policy_adaptive_rollout_available gates)
            from ...core.pallas_policy import policy_adaptive_rollout_available

            if policy_adaptive_rollout_available(
                env, self.fset, population, data[5]
            ):
                try:
                    return self._rollout_fused(population, data, adaptive=True)
                except ValueError:
                    pass  # traced time grid -> general path
        xs, alive = self._rollout_general(population, data)
        return xs, alive, None

    def _rollout_fused(self, population: TreeTensors, data: Tuple,
                       adaptive: bool = False):
        import numpy as np

        from ...core.pallas_policy import (
            rollout_policy_adaptive_pallas,
            rollout_policy_pallas,
        )
        from .noise import make_obs_noise_rows, make_process_noise_rows

        x0, ts, targets, pkeys, obs_keys, params = data
        env, fset = self.env, self.fset
        # the stochastic general path (integrate_sde) is Euler regardless of
        # self.method — the fused rollout must match
        sde = self.stochastic and getattr(env, "process_noise", 0.0) > 0.0
        method = "euler" if sde else self.method
        noise_rows = (
            make_obs_noise_rows(env, ts, params, obs_keys, self.substeps, method)
            if env.obs_noise != 0.0 and not adaptive
            else None
        )
        kick_rows = (
            make_process_noise_rows(env, ts, params, pkeys, self.substeps, env.latent_size)
            if sde
            else None
        )

        @jax.custom_vjp
        def run(ops, c1, c2, const):
            t = TreeTensors(ops, c1, c2, const)
            if adaptive:
                return rollout_policy_adaptive_pallas(
                    t, x0, ts, targets, params, env, fset,
                    rtol=self.rtol, atol=self.atol,
                    max_steps=adaptive_step_budget(self.substeps),
                    method=self.adaptive_method, state_size=0,
                    stream_controls=True,
                )
            return rollout_policy_pallas(
                t, x0, ts, targets, params, env, fset,
                substeps=self.substeps, method=method, state_size=0,
                obs_noise_rows=noise_rows, process_noise_rows=kick_rows,
                stream_controls=True,
            )

        def fwd(ops, c1, c2, const):
            return run(ops, c1, c2, const), (ops, c1, c2, const)

        def bwd(res, g):
            ops, c1, c2, const = res
            g_xs, g_us, _g_alive = g

            def f(c):
                pop_c = TreeTensors(ops, c1, c2, c)
                xs, _ = self._rollout_general(pop_c, data)
                _ys, us = self._replay(pop_c, xs, data)
                return xs, us

            _, vjp = jax.vjp(f, const)
            (dconst,) = vjp((g_xs, g_us))
            zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
            return zero(ops), zero(c1), zero(c2), dconst

        run.defvjp(fwd, bwd)
        xs, us, alive = run(
            population.ops, population.c1, population.c2, population.const
        )
        return xs, alive, us

    def _rollout_general(self, population: TreeTensors, data: Tuple):
        x0, ts, targets, _pkeys, obs_keys, params = data
        p = population.batch_shape[0]
        b = x0.shape[0]
        trees = population[:, None]  # (P, 1, m)
        env = self.env

        def drift(t, x):  # x: (P, B, latent); t scalar, or (P, B) (adaptive)
            if jnp.ndim(t):
                # per-lane solver times (integrate_adaptive): params, obs
                # noise (fold_in deterministic in t) and drift all resolve
                # per lane
                per_b = lambda tr: jax.vmap(
                    lambda pp, t_s: env.params_at(pp, ts, t_s)
                )(params, tr)
                p_t = jax.vmap(per_b)(t)  # leaves (P, B, ...)
                y = jax.vmap(
                    jax.vmap(env.f_obs, in_axes=(0, 0, 0, 0)),
                    in_axes=(None, 0, 0, 0),
                )(obs_keys, t, x, p_t)
                u = self._controls(trees, y, targets)
                return jax.vmap(
                    jax.vmap(env.drift, in_axes=(0, 0, 0, 0)),
                    in_axes=(0, 0, 0, 0),
                )(t, x, u, p_t)
            p_t = jax.vmap(lambda pp: env.params_at(pp, ts, t))(params)
            y = jax.vmap(  # over P
                jax.vmap(env.f_obs, in_axes=(0, None, 0, 0)), in_axes=(None, None, 0, None)
            )(obs_keys, t, x, p_t)  # (P, B, n_obs)
            u = self._controls(trees, y, targets)  # (P, B, n_control)
            dx = jax.vmap(
                jax.vmap(env.drift, in_axes=(None, 0, 0, 0)), in_axes=(None, 0, 0, None)
            )(t, x, u, p_t)
            return dx

        def cond_alive(t, x):  # (P, B, latent) -> (P, B)
            if jnp.ndim(t):
                tb = jnp.broadcast_to(t, x.shape[:-1])
                return jax.vmap(jax.vmap(env.cond_alive))(tb, x)
            return jax.vmap(jax.vmap(lambda xi: env.cond_alive(t, xi)))(x)

        x0b = jnp.broadcast_to(x0[None], (p, b, x0.shape[-1]))
        if self.stochastic and getattr(env, "process_noise", 0.0) > 0.0:
            u0 = jnp.zeros((env.n_control,))

            def diffusion(t, x):  # (P, B, latent, latent)
                p_t = jax.vmap(lambda pp: env.params_at(pp, ts, t))(params)
                return jax.vmap(
                    jax.vmap(env.diffusion, in_axes=(None, 0, None, 0)),
                    in_axes=(None, 0, None, None),
                )(t, x, u0, p_t)

            xs, alive = integrate_sde(
                drift, diffusion, x0b, ts, data[3], method="euler",
                substeps=self.substeps, cond_alive=cond_alive, remat=self.remat,
            )
        elif self.method == "adaptive":
            # the notebooks' Dopri5+PIDController configuration
            # (StaticPolicy.ipynb cell 4), batched per-lane step control
            xs, alive = integrate_adaptive(
                drift, x0b, ts, rtol=self.rtol, atol=self.atol,
                max_steps_per_interval=adaptive_step_budget(self.substeps),
                cond_alive=cond_alive, remat=self.remat,
                method=self.adaptive_method,
            )
        else:
            xs, alive = integrate(
                drift, x0b, ts, method=self.method, substeps=self.substeps,
                cond_alive=cond_alive, remat=self.remat,
            )
        return xs, alive

    def _replay(self, population: TreeTensors, xs: Array, data: Tuple):
        """Re-derive observations and controls on the save grid
        (reference :96-97)."""
        _x0, ts, targets, _pk, obs_keys, params = data
        env = self.env

        def obs_at(t, x_t):  # x_t: (P, B, latent)
            p_t = jax.vmap(lambda pp: env.params_at(pp, ts, t))(params)
            return jax.vmap(
                jax.vmap(env.f_obs, in_axes=(0, None, 0, 0)), in_axes=(None, None, 0, None)
            )(obs_keys, t, x_t, p_t)

        ys = jax.vmap(obs_at)(ts, xs)  # (T, P, B, n_obs)
        us = self._controls(population[:, None], ys, data[2])  # (T, P, B, n_control)
        return ys, us

    def evaluate_population(self, population: TreeTensors, data: Tuple) -> Array:
        """population batch (P, m) with m == env.n_control; returns (P,)."""
        _x0, ts, targets, _pk, _ok, params = data
        xs, alive, us = self._rollout(population, data)
        if us is None:  # general path: post-hoc replay (reference :96-97)
            _ys, us = self._replay(population, xs, data)
        env = self.env

        # env cost per (P, B) trajectory — xs to (P, B, T, ...)
        xs_pb = jnp.transpose(xs, (1, 2, 0, 3))
        us_pb = jnp.transpose(us, (1, 2, 0, 3))
        # reference semantics (feedforward_evaluate.py:90-99 + diffrax Event
        # with throw=False): save rows after the halt are ``inf`` and the ENV
        # COST decides what divergence is worth — e.g. acrobot zeroes costs
        # after first success, so a policy that swings up and THEN spins out
        # keeps its success fitness. Only a cost that comes back non-finite
        # maps to max_fitness.
        alive_pb = jnp.transpose(alive, (1, 2, 0))  # (P, B, T)
        xs_pb = jnp.where(alive_pb[..., None], xs_pb, jnp.inf)
        # the reference recomputes controls from the inf-filled states, so us
        # is non-finite at dead saves too — match that (a cost integrating us
        # without touching xs must still see the divergence)
        us_pb = jnp.where(alive_pb[..., None], us_pb, jnp.inf)
        cost = jax.vmap(  # over P
            jax.vmap(env.fitness, in_axes=(0, 0, 0, None, 0)),
            in_axes=(0, 0, None, None, None),
        )(xs_pb, us_pb, targets, ts, params)  # (P, B)

        per_traj = jnp.where(jnp.isfinite(cost), cost, self.max_fitness)
        fitness = jnp.mean(per_traj, axis=-1)
        return jnp.clip(jnp.nan_to_num(fitness, nan=self.max_fitness), 0.0, self.max_fitness)

    def evaluate_candidate(self, candidate: TreeTensors, data: Tuple):
        """Returns (xs, ys, us, per-trajectory fitness) for one candidate —
        the reference's inspection API (:53-101)."""
        pop = jax.tree_util.tree_map(lambda x: x[None], candidate)
        _x0, ts, targets, _pk, _ok, params = data
        xs, alive, _us = self._rollout(pop, data)
        ys, us = self._replay(pop, xs, data)  # inspection wants ys too
        env = self.env
        xs_b = jnp.transpose(xs[:, 0], (1, 0, 2))
        us_b = jnp.transpose(us[:, 0], (1, 0, 2))
        alive_b = jnp.transpose(alive[:, 0], (1, 0))  # (B, T)
        xs_dead = jnp.where(alive_b[..., None], xs_b, jnp.inf)
        us_dead = jnp.where(alive_b[..., None], us_b, jnp.inf)
        cost = jax.vmap(env.fitness, in_axes=(0, 0, 0, None, 0))(xs_dead, us_dead, targets, ts, params)
        cost = jnp.where(jnp.isfinite(cost), cost, self.max_fitness)
        return xs_b, jnp.transpose(ys[:, 0], (1, 0, 2)), us_b, cost
