"""Precomputed observation-noise streams for the fused policy kernels.

The general scan path draws observation noise as a DETERMINISTIC function of
(key, solver time) — ``obs_noise_at(key, t) = normal(fold_in(key,
bitcast(t)))`` (reference ``control_environment_base.py:43-48``). That
determinism is what makes the fused path possible with noise: every draw the
rollout will ever make is known up front, so the evaluator materialises them
on the exact stage-time grid (``pallas_policy.stage_times`` reproduces the
stepper's f32 time arithmetic bit-for-bit) and the kernel streams them from
HBM alongside the physics parameters. In-kernel PRNG would give a different
stream than the general path AND the post-hoc replay; this gives the same.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def make_obs_noise_rows(
    env, ts: Array, params, obs_keys: Array, substeps: int, method: str
) -> Array:
    """(T, B, substeps * n_stages * n_obs) pre-scaled noise draws.

    Row ``t`` holds every stage draw of save interval ``[ts[t], ts[t+1])``,
    flattened ``(substep, stage, obs)``-major; row ``T-1`` pads (unused).
    Each draw is ``obs_noise_at(key_b, tau) @ W(params_b at tau)`` — the full
    additive term of ``ControlEnvironmentBase.f_obs``.
    """
    from ...core.pallas_policy import stage_times
    from ..environments.base import obs_noise_at

    b = obs_keys.shape[0]
    taus = stage_times(ts, substeps, method)  # (T-1, substeps, n_stages)
    params_b = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(
            jnp.asarray(v, jnp.float32),
            (b,) + jnp.asarray(v).shape[1:]
            if getattr(jnp.asarray(v), "ndim", 0) >= 1
            else (b,),
        ),
        params,
    )

    def one_tau(tau):
        def per_traj(key, p):
            p_t = env.params_at(p, ts, tau)
            _c, w = env._obs_matrices(p_t)
            return obs_noise_at(key, tau, env.n_obs) @ w

        return jax.vmap(per_traj)(obs_keys, params_b)

    nz = jax.vmap(one_tau)(taus.reshape(-1))  # (K, B, n_obs)
    nz = nz.reshape(taus.shape + (b, env.n_obs))
    nz = jnp.moveaxis(nz, 3, 1).reshape(ts.shape[0] - 1, b, -1)
    # row T-1 carries ONLY the save-time draw at ts[-1] in its (substep 0,
    # stage 0) slot — the in-kernel control replay observes the final save
    # point with it; no solver stage ever reads the rest of the row
    tail = jnp.zeros_like(nz[:1])
    tail = tail.at[0, :, : env.n_obs].set(one_tau(ts[-1]))
    return jnp.concatenate([nz, tail], axis=0)


def make_process_noise_rows(
    env, ts: Array, params, process_keys: Array, substeps: int, d_aug: int
) -> Array:
    """(T, B, substeps * latent) Euler-Maruyama kicks ``V(t) @ dW[:latent]``.

    Replicates ``integrators.integrate_sde``'s draw exactly: per substep time
    ``t`` (the "euler" stage grid), ``dW = normal(fold_in(key, bitcast(t)),
    (d_aug,)) * sqrt(|dt|)`` — note the draw is over the FULL integrated state
    dimension (latent + policy hidden state) even though only the latent rows
    are kicked, so the stream bit-matches the general path.
    """
    import jax.random as jr

    from ...core.pallas_policy import stage_times
    from ..environments.base import bitcast_time

    b = process_keys.shape[0]
    latent = env.latent_size
    taus = stage_times(ts, substeps, "euler")[..., 0]  # (T-1, substeps)
    t0, t1 = ts[:-1], ts[1:]
    dtv = jnp.broadcast_to(((t1 - t0) / substeps)[:, None], taus.shape)
    params_b = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(
            jnp.asarray(v, jnp.float32),
            (b,) + jnp.asarray(v).shape[1:]
            if getattr(jnp.asarray(v), "ndim", 0) >= 1
            else (b,),
        ),
        params,
    )
    u0 = jnp.zeros((env.n_control,))
    x0 = jnp.zeros((latent,))

    def one(tau, dt):
        bits = bitcast_time(tau)

        def per_traj(key, p):
            p_t = env.params_at(p, ts, tau)
            w = jr.normal(jr.fold_in(key, bits), (d_aug,)) * jnp.sqrt(jnp.abs(dt))
            g = env.diffusion(tau, x0, u0, p_t)  # (latent, latent), state-indep
            return g @ w[:latent]

        return jax.vmap(per_traj)(process_keys, params_b)

    kick = jax.vmap(one)(taus.reshape(-1), dtv.reshape(-1))  # (K, B, latent)
    kick = kick.reshape(taus.shape + (b, latent))
    kick = jnp.moveaxis(kick, 2, 1).reshape(ts.shape[0] - 1, b, -1)
    return jnp.concatenate([kick, jnp.zeros_like(kick[:1])], axis=0)


def make_sr_kick_rows(
    process_noise: float, ts: Array, process_keys: Array, substeps: int, d: int
) -> Array:
    """(T, B, substeps * d) SR Euler-Maruyama kicks, diagonal diffusion.

    The SR evaluator's SDE diffusion is ``full_like(x, process_noise)``
    (elementwise), so the exact ``integrate_sde`` kick is
    ``process_noise * normal(fold_in(key, bitcast(t)), (d,)) * sqrt(|dt|)``
    per substep time — precomputed here for the fitness-fused kernel."""
    import jax.random as jr

    from ...core.pallas_policy import stage_times
    from ..environments.base import bitcast_time

    b = process_keys.shape[0]
    taus = stage_times(ts, substeps, "euler")[..., 0]  # (T-1, substeps)
    t0, t1 = ts[:-1], ts[1:]
    dtv = jnp.broadcast_to(((t1 - t0) / substeps)[:, None], taus.shape)

    def one(tau, dt):
        bits = bitcast_time(tau)

        def per_traj(key):
            w = jr.normal(jr.fold_in(key, bits), (d,)) * jnp.sqrt(jnp.abs(dt))
            return process_noise * w

        return jax.vmap(per_traj)(process_keys)

    kick = jax.vmap(one)(taus.reshape(-1), dtv.reshape(-1))  # (K, B, d)
    kick = kick.reshape(taus.shape + (b, d))
    kick = jnp.moveaxis(kick, 2, 1).reshape(ts.shape[0] - 1, b, -1)
    return jnp.concatenate([kick, jnp.zeros_like(kick[:1])], axis=0)
