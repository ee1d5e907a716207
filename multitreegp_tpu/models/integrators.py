"""Fixed-grid Runge-Kutta integrators with per-lane divergence containment.

The reference integrates each candidate/trajectory with a separate
``diffrax.diffeqsolve`` call under nested vmaps (``SR_evaluator.py:76-79``),
using adaptive Dopri5+PID in the notebooks and a NaN event to halt diverging
trajectories. TPU-first redesign: one ``lax.scan`` over the save grid with the
*entire population x trajectory batch* inside each step — the time axis is the
only sequential axis, and each step is a large fused VPU program.

Divergence containment (must-keep semantics, SURVEY.md §5.3): GP populations
constantly produce expressions that blow up (``/`` by ~0); the reference stops
those trajectories via ``diffrax.Event`` + ``throw=False`` and substitutes
``max_fitness``. Here every lane carries an ``alive`` flag: a lane whose state
leaves the finite range (or fails the env's bound check) freezes — its state
stops updating so no NaN can propagate into the fused batch — and the
evaluator maps dead lanes to ``max_fitness``.

``substeps`` inner RK steps are taken between consecutive save points
(dt = save_dt / substeps), replacing adaptive stepping with a statically
shaped schedule that XLA can pipeline.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

# A state bound beyond which a lane is declared divergent even while finite —
# keeps float32 overflow (-> inf in later ops) from sneaking through one step.
DIVERGENCE_BOUND = 1e8


def _finite(x: Array) -> Array:
    return jnp.all(jnp.isfinite(x) & (jnp.abs(x) < DIVERGENCE_BOUND), axis=-1)


def _euler_step(drift, t, x, dt):
    return x + dt * drift(t, x)


def _heun_step(drift, t, x, dt):
    k1 = drift(t, x)
    k2 = drift(t + dt, x + dt * k1)
    return x + 0.5 * dt * (k1 + k2)


def _rk4_step(drift, t, x, dt):
    k1 = drift(t, x)
    k2 = drift(t + 0.5 * dt, x + 0.5 * dt * k1)
    k3 = drift(t + 0.5 * dt, x + 0.5 * dt * k2)
    k4 = drift(t + dt, x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


_STEPPERS = {"euler": _euler_step, "heun": _heun_step, "rk4": _rk4_step}


def integrate(
    drift: Callable[[Array, Array], Array],
    x0: Array,
    ts: Array,
    method: str = "rk4",
    substeps: int = 1,
    cond_alive: Optional[Callable[[Array, Array], Array]] = None,
    remat: bool = False,
) -> Tuple[Array, Array]:
    """Integrate ``dx/dt = drift(t, x)`` over the save grid ``ts``.

    Args:
        drift: batched drift; ``x`` has shape ``(..., d)``, returns same.
        x0: initial state ``(..., d)`` (any batch dims).
        ts: save points ``(T,)`` — output includes ``x0`` at ``ts[0]``.
        method: "euler" | "heun" | "rk4".
        substeps: RK steps between consecutive save points.
        cond_alive: optional extra liveness predicate ``(t, x) -> bool (...)``
            (the env-specific divergence events, e.g. acrobot velocity bounds,
            reference ``acrobot.py:86-87``).
        remat: rematerialise each save step under reverse-mode AD (checkpointed
            scan — trades FLOPs for memory when differentiating the rollout
            for constant optimisation).

    Returns:
        xs: ``(T, ..., d)`` states at the save points (frozen after death).
        alive: ``(T, ...)`` liveness at each save point.
    """
    stepper = _STEPPERS[method]

    def masked_step(t, x, alive, dt):
        x_new = stepper(drift, t, x, dt)
        ok = _finite(x_new)
        if cond_alive is not None:
            ok = ok & cond_alive(t + dt, x_new)
        alive = alive & ok
        x = jnp.where(alive[..., None], x_new, x)
        return x, alive

    def save_step(carry, t_pair):
        x, alive = carry
        t0, t1 = t_pair
        dt = (t1 - t0) / substeps

        def sub(i, c):
            x, alive = c
            return masked_step(t0 + i * dt, x, alive, dt)

        x, alive = jax.lax.fori_loop(0, substeps, lambda i, c: sub(i, c), (x, alive))
        return (x, alive), (x, alive)

    if remat:
        save_step = jax.checkpoint(save_step)

    alive0 = _finite(x0)
    if cond_alive is not None:
        alive0 = alive0 & cond_alive(ts[0], x0)
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    (_, _), (xs, alives) = jax.lax.scan(save_step, (x0, alive0), t_pairs)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    alives = jnp.concatenate([alive0[None], alives], axis=0)
    return xs, alives


# Embedded pairs for adaptive stepping. Bogacki-Shampine 3(2) is the TPU
# default: 3 stages/step with an embedded 2nd-order error estimate gives PID
# step control at under half Dopri5's cost. Dormand-Prince 5(4) — the
# notebooks' actual solver (``SymbolicRegression.ipynb`` cell 6) — is
# available for accuracy/parity work at 6 stages/step (no FSAL reuse: lanes
# step independently, so the "last" stage of one step is not the first of
# the next on rejected lanes).
_BS_A = ((0.5,), (0.0, 0.75), (2 / 9, 1 / 3, 4 / 9))
_BS_B_LOW = (7 / 24, 0.25, 1 / 3, 0.125)

_DP_C = (0.2, 0.3, 0.8, 8 / 9, 1.0, 1.0)
_DP_A = (
    (0.2,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def adaptive_step_budget(substeps: int, floor: int = 32) -> int:
    """Resolve an evaluator's ``substeps`` knob into the adaptive path's
    per-interval step budget.

    ``substeps`` is primarily the FIXED-step refinement count (default 4);
    under ``method="adaptive"`` it doubles as the max-steps budget when the
    user explicitly raised it above the fixed-step default — otherwise the
    adaptive default of ``floor`` steps per save interval applies. Shared by
    all three evaluators so the threshold/floor live in exactly one place.
    """
    return substeps if substeps > 4 else floor


def integrate_adaptive(
    drift: Callable[[Array, Array], Array],
    x0: Array,
    ts: Array,
    rtol: float = 1e-4,
    atol: float = 1e-6,
    max_steps_per_interval: int = 32,
    cond_alive: Optional[Callable[[Array, Array], Array]] = None,
    safety: float = 0.9,
    remat: bool = False,
    method: str = "bosh3",
) -> Tuple[Array, Array]:
    """PI-controlled adaptive integration on a fixed save grid.

    The notebooks use ``diffrax.Dopri5 + PIDController`` (e.g.
    ``SymbolicRegression.ipynb``); this is the batched TPU equivalent: every
    lane carries its own ``(t, dt)`` and steps an embedded RK pair —
    ``method="bosh3"`` (Bogacki-Shampine 3(2), the cheap TPU default) or
    ``method="dopri5"`` (Dormand-Prince 5(4), the notebooks' solver) —
    inside a bounded ``fori_loop`` per save interval. Lanes accept/reject
    and resize steps independently via masks, in lockstep control flow.
    Lanes that exhaust ``max_steps_per_interval`` before reaching the save
    point are declared dead (the reference's ``max_steps`` + ``throw=False``
    behaviour).

    Returns ``(xs (T, ..., d), alive (T, ...))`` like :func:`integrate`.
    """
    if method not in ("bosh3", "dopri5"):
        raise ValueError(f"unknown adaptive method {method!r}")
    err_exponent = -1.0 / 3.0 if method == "bosh3" else -0.2

    def rk_step_bosh3(t, x, dt):
        dte = dt[..., None]
        k1 = drift(t, x)
        k2 = drift(t + 0.5 * dt, x + 0.5 * dte * k1)
        k3 = drift(t + 0.75 * dt, x + 0.75 * dte * k2)
        x_hi = x + dte * (_BS_A[2][0] * k1 + _BS_A[2][1] * k2 + _BS_A[2][2] * k3)
        k4 = drift(t + dt, x_hi)
        x_lo = x + dte * (
            _BS_B_LOW[0] * k1 + _BS_B_LOW[1] * k2 + _BS_B_LOW[2] * k3 + _BS_B_LOW[3] * k4
        )
        err = x_hi - x_lo
        scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x_hi))
        err_norm = jnp.sqrt(jnp.mean(jnp.square(err / scale), axis=-1))
        return x_hi, err_norm

    def rk_step_dopri5(t, x, dt):
        dte = dt[..., None]
        ks = [drift(t, x)]
        for ci, ai in zip(_DP_C, _DP_A):
            xi = x + dte * sum(a * k for a, k in zip(ai, ks))
            ks.append(drift(t + ci * dt, xi))
        x_hi = x + dte * sum(b * k for b, k in zip(_DP_B5, ks))
        x_lo = x + dte * sum(b * k for b, k in zip(_DP_B4, ks))
        err = x_hi - x_lo
        scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x_hi))
        err_norm = jnp.sqrt(jnp.mean(jnp.square(err / scale), axis=-1))
        return x_hi, err_norm

    rk_step = rk_step_bosh3 if method == "bosh3" else rk_step_dopri5

    import os

    dt_reset = os.environ.get("MTGP_ADAPTIVE_DT_RESET") == "1"

    def interval(carry, t_pair):
        x, alive, dt_carry = carry
        t0, t1 = t_pair
        span = t1 - t0
        t = jnp.broadcast_to(t0, alive.shape)
        if dt_reset:  # r1-r3 semantics: re-converge dt every save interval
            dt = jnp.broadcast_to(span / 4.0, alive.shape)
        else:
            # diffrax PIDController semantics: the controller's step size
            # carries across save points (clamped to this interval's
            # bounds) — a converged lane re-enters at its working dt
            # instead of re-converging from span/4 every interval
            dt = jnp.clip(dt_carry, span * 1e-3, span)

        def body(_, state):
            t, dt, x, alive = state
            active = alive & (t < t1 - 1e-12)
            dt_c = jnp.minimum(dt, t1 - t)
            x_new, err = rk_step(t, x, dt_c)
            ok = _finite(x_new) & jnp.isfinite(err)
            accept = active & ok & (err <= 1.0)
            if cond_alive is not None:
                accept = accept & cond_alive(t + dt_c, x_new)
            x = jnp.where(accept[..., None], x_new, x)
            t = jnp.where(accept, t + dt_c, t)
            # I controller: grow/shrink by err^(-1/order), clamped 0.2..5x
            factor = jnp.where(
                jnp.isfinite(err) & (err > 0.0),
                jnp.clip(safety * err ** err_exponent, 0.2, 5.0),
                jnp.where(ok, 5.0, 0.2),
            )
            dt = jnp.where(active, jnp.clip(dt_c * factor, span * 1e-3, span), dt)
            # a lane that produced NaN at minimum dt is dead
            alive = alive & (ok | ~active | (dt_c > span * 1.5e-3))
            return t, dt, x, alive

        t, dt, x, alive = jax.lax.fori_loop(
            0, max_steps_per_interval, body, (t, dt, x, alive)
        )
        # lanes that never reached t1 ran out of steps -> dead (max_steps)
        alive = alive & (t >= t1 - 1e-9 * jnp.maximum(jnp.abs(t1), 1.0))
        return (x, alive, dt), (x, alive)

    if remat:
        interval = jax.checkpoint(interval)

    alive0 = _finite(x0)
    if cond_alive is not None:
        alive0 = alive0 & cond_alive(ts[0], x0)
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    dt0 = jnp.broadcast_to(
        (ts[1] - ts[0]) / 4.0 if ts.shape[0] > 1 else jnp.float32(1.0),
        alive0.shape,
    ).astype(x0.dtype)
    (_, _, _), (xs, alives) = jax.lax.scan(
        interval, (x0, alive0, dt0), t_pairs
    )
    xs = jnp.concatenate([x0[None], xs], axis=0)
    alives = jnp.concatenate([alive0[None], alives], axis=0)
    return xs, alives


def integrate_sde(
    drift: Callable[[Array, Array], Array],
    diffusion: Callable[[Array, Array], Array],
    x0: Array,
    ts: Array,
    noise_keys: Array,
    method: str = "euler",
    substeps: int = 1,
    cond_alive: Optional[Callable[[Array, Array], Array]] = None,
    remat: bool = False,
) -> Tuple[Array, Array]:
    """Integrate ``dx = drift dt + diffusion dW`` (Euler-Maruyama / drift-RK).

    The reference scaffolds SDE support (env ``diffusion`` methods, Brownian
    paths in the legacy ``EvaluatorMT``, ``dynamic_evaluate.py:200-209``) but
    all live evaluators integrate pure ODEs; this is the working TPU
    equivalent. Brownian increments are a *deterministic function of the step
    time* — ``fold_in(key, bitcast(t))``, the same discipline as observation
    noise (``control_environment_base.py:43-48``) — so a trajectory is
    reproducible from its key alone.

    Args:
        drift: batched drift ``(t, x (..., d)) -> (..., d)``.
        diffusion: batched diffusion factor ``(t, x) -> (..., d)`` (diagonal)
            or ``(..., d, d)`` (matrix, applied to dW on the right).
        x0: ``(..., d)``; the LAST batch axis indexes trajectories and maps
            1:1 onto ``noise_keys``.
        ts: save grid ``(T,)``.
        noise_keys: ``(B,)`` PRNG keys, one per trajectory lane (the
            evaluator data tuple's ``process_noise_keys``).
        method: drift discretisation between noise kicks ("euler" | "heun").
        substeps / cond_alive / remat: as in :func:`integrate`.

    Returns ``(xs (T, ..., d), alive (T, ...))``.
    """
    stepper = _STEPPERS[method]
    d = x0.shape[-1]

    def dW(t, dt):  # (B, d) standard Brownian increment for this substep
        bits = jax.lax.bitcast_convert_type(jnp.asarray(t, jnp.float32), jnp.int32)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, bits))(noise_keys)
        z = jax.vmap(lambda k: jax.random.normal(k, (d,)))(keys)
        return z * jnp.sqrt(jnp.abs(dt))

    def masked_step(t, x, alive, dt):
        x_new = stepper(drift, t, x, dt)
        g = diffusion(t, x)
        w = dW(t, dt)
        if g.ndim == x.ndim + 1:  # matrix diffusion: (..., d, d) @ (B, d)
            kick = jnp.einsum("...ij,...j->...i", g, jnp.broadcast_to(w, g.shape[:-1]))
        else:
            kick = g * w
        x_new = x_new + kick
        ok = _finite(x_new)
        if cond_alive is not None:
            ok = ok & cond_alive(t + dt, x_new)
        alive = alive & ok
        x = jnp.where(alive[..., None], x_new, x)
        return x, alive

    def save_step(carry, t_pair):
        x, alive = carry
        t0, t1 = t_pair
        dt = (t1 - t0) / substeps
        x, alive = jax.lax.fori_loop(
            0, substeps, lambda i, c: masked_step(t0 + i * dt, c[0], c[1], dt), (x, alive)
        )
        return (x, alive), (x, alive)

    if remat:
        save_step = jax.checkpoint(save_step)

    alive0 = _finite(x0)
    if cond_alive is not None:
        alive0 = alive0 & cond_alive(ts[0], x0)
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    (_, _), (xs, alives) = jax.lax.scan(save_step, (x0, alive0), t_pairs)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    alives = jnp.concatenate([alive0[None], alives], axis=0)
    return xs, alives


def linear_interp(ts: Array, values: Array, t: Array) -> Array:
    """Piecewise-linear interpolation of ``values`` (T, ...) sampled at ``ts``.

    Replacement for ``diffrax.LinearInterpolation`` used by time-varying
    environment parameters (reference ``harmonic_oscillator.py:141-167``).
    """
    t = jnp.clip(t, ts[0], ts[-1])
    idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, ts.shape[0] - 2)
    t0, t1 = ts[idx], ts[idx + 1]
    w = jnp.where(t1 > t0, (t - t0) / (t1 - t0), 0.0)
    v0 = values[idx]
    v1 = values[idx + 1]
    return v0 + w * (v1 - v0)
