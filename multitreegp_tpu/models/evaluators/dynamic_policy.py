"""Dynamic (stateful) symbolic-policy evaluator.

Behavioural spec (reference ``MultiTreeGP/evaluators/dynamic_evaluate.py``):
the candidate is split into ``state_size`` hidden-state trees (layer 0) and
``n_control`` readout trees (layer 1) (:83-84). The ODE state is augmented to
``[env_state, hidden_a]`` with

    u  = readout([0s(n_obs), a, 0s(n_control), target])      (:113)
    dx = env.drift(t, x, u)
    da = state_eq([y, a, u, target])                          (:116)

Note the deliberate information bottleneck: inside the loop the readout sees
only the hidden state (+ target) — observations and control slots are zeroed —
while the post-hoc control replay feeds REAL observations (:101). This
asymmetry is reference behaviour and is replicated exactly (SURVEY.md §8).

Data contract: ``data = (x0, ts, targets, process_noise_keys, obs_noise_keys,
params)``; data-vector layout for the trees is ``[y, a, u, target]`` — declare
variables in that order (the reference prints the same requirement at
construction, ``genetic_programming.py:201``).
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


class DynamicPolicyEvaluator:
    """Fitness = env cost of the closed loop driven by a stateful policy."""

    def __init__(
        self,
        env,
        fset: FunctionSet | None = None,
        state_size: int = 1,
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
        self.state_size = state_size
        self.max_fitness = max_fitness
        self.method = method
        self.substeps = substeps
        self.remat = remat
        self.interpreter = interpreter
        self.stochastic = stochastic
        self.rtol = rtol
        self.atol = atol
        self.adaptive_method = adaptive_method

    def _split(self, population: TreeTensors):
        s = self.state_size
        state_eq = jax.tree_util.tree_map(lambda x: x[..., :s, :], population)
        readout = jax.tree_util.tree_map(lambda x: x[..., s:, :], population)
        return state_eq, readout

    def _data_vec(self, y: Array, a: Array, u: Array, targets: Array) -> Array:
        """[y, a, u, target] with targets broadcast over leading dims."""
        tgt = jnp.broadcast_to(targets, y.shape[:-1] + targets.shape[-1:])
        return jnp.concatenate([y, a, u, tgt], axis=-1)

    def _rollout(self, population: TreeTensors, data: Tuple):
        """Dispatch: fused whole-rollout Pallas kernel when the env/config
        qualifies (see pallas_policy), else the general scan path. Returns
        ``(xas, alive, us_or_None)`` — the fused kernel streams the replay's
        save-grid readout controls (real observations, zero-fed u) so
        callers skip the separate replay pass; ``us=None`` means replay."""
        env = self.env
        n_vars = env.n_obs + self.state_size + env.n_control + env.n_targets
        if (
            self.interpreter in ("auto", "pallas")
            and self.method in ("euler", "heun", "rk4")
            and self.fset.num_variables == n_vars
        ):
            from ...core.pallas_policy import policy_rollout_available

            if policy_rollout_available(env, self.fset, population, data[5]):
                try:
                    return self._rollout_fused(population, data)
                except ValueError:
                    pass
        if (
            self.interpreter in ("auto", "pallas")
            and self.method == "adaptive"
            and not (self.stochastic and getattr(env, "process_noise", 0.0) > 0.0)
            and self.fset.num_variables == n_vars
        ):
            # fused Dopri5/Bosh3+PID (noise-free, constant params)
            from ...core.pallas_policy import policy_adaptive_rollout_available

            if policy_adaptive_rollout_available(
                env, self.fset, population, data[5]
            ):
                try:
                    return self._rollout_fused(population, data, adaptive=True)
                except ValueError:
                    pass
        xas, alive = self._rollout_general(population, data)
        return xas, alive, None

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
        sde = self.stochastic and getattr(env, "process_noise", 0.0) > 0.0
        method = "euler" if sde else self.method
        noise_rows = (
            make_obs_noise_rows(env, ts, params, obs_keys, self.substeps, method)
            if env.obs_noise != 0.0 and not adaptive
            else None
        )
        kick_rows = (
            make_process_noise_rows(
                env, ts, params, pkeys, self.substeps,
                env.latent_size + self.state_size,
            )
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
                    method=self.adaptive_method,
                    state_size=self.state_size, stream_controls=True,
                )
            return rollout_policy_pallas(
                t, x0, ts, targets, params, env, fset,
                substeps=self.substeps, method=method,
                state_size=self.state_size,
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
                xas, _ = self._rollout_general(pop_c, data)
                _xs, _ys, us, _acts = self._replay(pop_c, xas, data)
                return xas, us

            _, vjp = jax.vjp(f, const)
            (dconst,) = vjp((g_xs, g_us))
            zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
            return zero(ops), zero(c1), zero(c2), dconst

        run.defvjp(fwd, bwd)
        xas, us, alive = run(
            population.ops, population.c1, population.c2, population.const
        )
        return xas, alive, us

    def _rollout_general(self, population: TreeTensors, data: Tuple):
        x0, ts, targets, _pk, obs_keys, params = data
        env = self.env
        p = population.batch_shape[0]
        b = x0.shape[0]
        latent = env.latent_size
        n_obs, n_ctrl = env.n_obs, env.n_control
        state_eq, readout = self._split(population[:, None])  # (P,1,m_i)

        def drift(t, xa):  # xa: (P, B, latent + state_size); t scalar or (P, B)
            x, a = xa[..., :latent], xa[..., latent:]
            if jnp.ndim(t):
                # per-lane solver times (integrate_adaptive)
                per_b = lambda tr: jax.vmap(
                    lambda pp, t_s: env.params_at(pp, ts, t_s)
                )(params, tr)
                p_t = jax.vmap(per_b)(t)
                y = jax.vmap(
                    jax.vmap(env.f_obs, in_axes=(0, 0, 0, 0)),
                    in_axes=(None, 0, 0, 0),
                )(obs_keys, t, x, p_t)
            else:
                p_t = jax.vmap(lambda pp: env.params_at(pp, ts, t))(params)
                y = jax.vmap(
                    jax.vmap(env.f_obs, in_axes=(0, None, 0, 0)), in_axes=(None, None, 0, None)
                )(obs_keys, t, x, p_t)  # (P, B, n_obs)
            zeros_y = jnp.zeros_like(y)
            zeros_u = jnp.zeros(y.shape[:-1] + (n_ctrl,))
            u = evaluate_trees(
                readout,
                self._data_vec(zeros_y, a, zeros_u, targets)[..., None, :],
                self.fset,
                impl=self.interpreter,
            )  # (P, B, n_control)
            if jnp.ndim(t):
                dx = jax.vmap(
                    jax.vmap(env.drift, in_axes=(0, 0, 0, 0)),
                    in_axes=(0, 0, 0, 0),
                )(t, x, u, p_t)
            else:
                dx = jax.vmap(
                    jax.vmap(env.drift, in_axes=(None, 0, 0, 0)), in_axes=(None, 0, 0, None)
                )(t, x, u, p_t)
            da = evaluate_trees(
                state_eq,
                self._data_vec(y, a, u, targets)[..., None, :],
                self.fset,
                impl=self.interpreter,
            )
            return jnp.concatenate([dx, da], axis=-1)

        def cond_alive(t, xa):
            if jnp.ndim(t):
                tb = jnp.broadcast_to(t, xa.shape[:-1])
                return jax.vmap(jax.vmap(
                    lambda t_s, xi: env.cond_alive(t_s, xi[:latent])
                ))(tb, xa)
            return jax.vmap(jax.vmap(lambda xi: env.cond_alive(t, xi[:latent])))(xa)

        xa0 = jnp.concatenate([x0, jnp.zeros((b, self.state_size))], axis=-1)
        xa0 = jnp.broadcast_to(xa0[None], (p, b, latent + self.state_size))
        if self.stochastic and getattr(env, "process_noise", 0.0) > 0.0:
            u0 = jnp.zeros((n_ctrl,))

            def diffusion(t, xa):  # process noise only on the env latent part
                x = xa[..., :latent]
                p_t = jax.vmap(lambda pp: env.params_at(pp, ts, t))(params)
                g = jax.vmap(
                    jax.vmap(env.diffusion, in_axes=(None, 0, None, 0)),
                    in_axes=(None, 0, None, None),
                )(t, x, u0, p_t)  # (P, B, latent, latent)
                full = jnp.zeros(xa.shape + (xa.shape[-1],))
                return full.at[..., :latent, :latent].set(g)

            xas, alive = integrate_sde(
                drift, diffusion, xa0, ts, data[3], method="euler",
                substeps=self.substeps, cond_alive=cond_alive, remat=self.remat,
            )
        elif self.method == "adaptive":
            # the notebooks' Dopri5+PIDController configuration
            # (DynamicPolicy.ipynb cell 4), batched per-lane step control
            xas, alive = integrate_adaptive(
                drift, xa0, ts, rtol=self.rtol, atol=self.atol,
                max_steps_per_interval=adaptive_step_budget(self.substeps),
                cond_alive=cond_alive, remat=self.remat,
                method=self.adaptive_method,
            )
        else:
            xas, alive = integrate(
                drift, xa0, ts, method=self.method, substeps=self.substeps,
                cond_alive=cond_alive, remat=self.remat,
            )
        return xas, alive

    def _replay(self, population: TreeTensors, xas: Array, data: Tuple):
        """Observations + post-hoc controls with REAL observations (:99-101)."""
        _x0, ts, targets, _pk, obs_keys, params = data
        env = self.env
        latent = env.latent_size
        _state_eq, readout = self._split(population[:, None])
        xs = xas[..., :latent]
        activities = xas[..., latent:]

        def obs_at(t, x_t):
            p_t = jax.vmap(lambda pp: env.params_at(pp, ts, t))(params)
            return jax.vmap(
                jax.vmap(env.f_obs, in_axes=(0, None, 0, 0)), in_axes=(None, None, 0, None)
            )(obs_keys, t, x_t, p_t)

        ys = jax.vmap(obs_at)(ts, xs)  # (T, P, B, n_obs)
        zeros_u = jnp.zeros(ys.shape[:-1] + (env.n_control,))
        us = evaluate_trees(
            readout,
            self._data_vec(ys, activities, zeros_u, targets)[..., None, :],
            self.fset,
            impl=self.interpreter,
        )
        return xs, ys, us, activities

    def evaluate_population(self, population: TreeTensors, data: Tuple) -> Array:
        """population batch (P, state_size + n_control); returns (P,)."""
        _x0, ts, targets, _pk, _ok, params = data
        env = self.env
        xas, alive, us = self._rollout(population, data)
        if us is None:  # general path: post-hoc replay (reference :99-101)
            xs, _ys, us, _acts = self._replay(population, xas, data)
        else:
            xs = xas[..., : env.latent_size]

        xs_pb = jnp.transpose(xs, (1, 2, 0, 3))
        us_pb = jnp.transpose(us, (1, 2, 0, 3))
        # reference semantics (dynamic_evaluate + diffrax Event, throw=False):
        # post-halt saves are inf; the env cost decides what divergence costs
        # (see static_policy.evaluate_population)
        alive_pb = jnp.transpose(alive, (1, 2, 0))  # (P, B, T)
        xs_pb = jnp.where(alive_pb[..., None], xs_pb, jnp.inf)
        # the reference recomputes controls from inf-filled states: us is
        # non-finite at dead saves too (see static_policy.evaluate_population)
        us_pb = jnp.where(alive_pb[..., None], us_pb, jnp.inf)
        cost = jax.vmap(
            jax.vmap(env.fitness, in_axes=(0, 0, 0, None, 0)),
            in_axes=(0, 0, None, None, None),
        )(xs_pb, us_pb, targets, ts, params)  # (P, B)

        per_traj = jnp.where(jnp.isfinite(cost), cost, self.max_fitness)
        fitness = jnp.mean(per_traj, axis=-1)
        return jnp.clip(jnp.nan_to_num(fitness, nan=self.max_fitness), 0.0, self.max_fitness)

    def evaluate_candidate(self, candidate: TreeTensors, data: Tuple):
        """Returns (xs, ys, us, activities, per-trajectory fitness)."""
        pop = jax.tree_util.tree_map(lambda x: x[None], candidate)
        _x0, ts, targets, _pk, _ok, params = data
        env = self.env
        xas, alive, _us = self._rollout(pop, data)
        xs, ys, us, acts = self._replay(pop, xas, data)  # inspection wants ys
        xs_b = jnp.transpose(xs[:, 0], (1, 0, 2))
        us_b = jnp.transpose(us[:, 0], (1, 0, 2))
        alive_b = jnp.transpose(alive[:, 0], (1, 0))  # (B, T)
        xs_dead = jnp.where(alive_b[..., None], xs_b, jnp.inf)
        us_dead = jnp.where(alive_b[..., None], us_b, jnp.inf)
        cost = jax.vmap(env.fitness, in_axes=(0, 0, 0, None, 0))(xs_dead, us_dead, targets, ts, params)
        cost = jnp.where(jnp.isfinite(cost), cost, self.max_fitness)
        return (
            xs_b,
            jnp.transpose(ys[:, 0], (1, 0, 2)),
            us_b,
            jnp.transpose(acts[:, 0], (1, 0, 2)),
            cost,
        )
