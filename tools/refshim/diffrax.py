"""Minimal fixed-step diffrax-compatible shim for executing the reference.

The upstream reference (`/root/reference`, sdevries0/MultiTreeGP) depends on
``diffrax`` only through a small surface — ``diffeqsolve`` with the DEFAULT
solver configuration ``Euler() + ConstantStepSize() + SaveAt(ts=...)`` and a
NaN/Inf halt ``Event`` (SR_evaluator.py:71-79, feedforward_evaluate.py:90,
dynamic_evaluate.py:93). This module implements exactly that surface with
jax.lax primitives so the reference code can RUN in this environment (diffrax
is not installed) for golden fitness comparisons against multitreegp_tpu.

Semantics implemented (matching diffrax under the fixed-step default config):
* Euler steps of size ``dt0``; each save interval ``[ts[i], ts[i+1]]`` takes
  ``round((ts[i+1]-ts[i])/dt0)`` steps (saveat times must be concrete — call
  the reference evaluators OUTSIDE jit).
* ``Event(cond_fn)``: integration halts when ``cond_fn`` goes negative
  (the reference's cond_fn returns -1.0 on NaN/Inf); with ``throw=False``
  saves after the halt are ``inf`` — which the reference maps to
  ``max_fitness``.
* ``LinearInterpolation``: piecewise-linear ``.evaluate(t)`` (time-varying
  physics parameters in the control environments).

Adaptive stepping (the notebooks' actual configuration, e.g.
``SymbolicRegression.ipynb`` cell 6: ``Dopri5() + PIDController(atol=1e-6,
rtol=1e-6, dtmin=0.001)``) is implemented as a Dormand-Prince 5(4) embedded
pair with diffrax's default I-controller semantics (safety 0.9, factor
clamp [0.2, 10], exponent -1/5, ``force_dtmin`` acceptance at the floor,
global ``max_steps`` budget with unreached saves = inf under
``throw=False``). Not bit-identical to real diffrax (different fp ordering),
but tolerance-accurate: both integrate to the controller's error target.

NOT implemented: implicit solvers, SDE terms (the reference's SDE branch is
legacy/dead code) — using those raises rather than silently mis-integrating.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class AbstractSolver:
    pass


class AbstractStepSizeController:
    pass


class Euler(AbstractSolver):
    pass


class EulerHeun(AbstractSolver):
    pass


class Dopri5(AbstractSolver):
    pass


class ConstantStepSize(AbstractStepSizeController):
    pass


class PIDController(AbstractStepSizeController):
    def __init__(self, rtol, atol, dtmin=None, dtmax=None, pcoeff=0.0,
                 icoeff=1.0, dcoeff=0.0, safety=0.9, factormin=0.2,
                 factormax=10.0, force_dtmin=True, **k):
        self.rtol = rtol
        self.atol = atol
        self.dtmin = dtmin
        self.dtmax = dtmax
        self.safety = safety
        self.factormin = factormin
        self.factormax = factormax
        self.force_dtmin = force_dtmin


# Dormand-Prince 5(4) tableau (Dopri5) — published constants, shared with
# the framework's integrator so a transcription fix propagates to both sides
# of the parity comparison (the stepping/controller logic stays independent)
from multitreegp_tpu.models.integrators import (  # noqa: E402
    _DP_A,
    _DP_B4,
    _DP_B5,
    _DP_C,
)


class DirectAdjoint:
    pass


class SpaceTimeLevyArea:
    pass


class BrownianIncrement:
    pass


class ODETerm:
    def __init__(self, vector_field):
        self.vector_field = vector_field


class ControlTerm:
    def __init__(self, *a, **k):
        raise NotImplementedError("shim: SDE control terms not supported")


class MultiTerm:
    def __init__(self, *a, **k):
        raise NotImplementedError("shim: multi-term systems not supported")


class UnsafeBrownianPath:
    def __init__(self, *a, **k):
        raise NotImplementedError("shim: Brownian paths not supported")


class SaveAt:
    def __init__(self, ts=None, **k):
        self.ts = ts


class Event:
    def __init__(self, cond_fn, root_finder=None):
        self.cond_fn = cond_fn


class LinearInterpolation:
    def __init__(self, ts, ys):
        self.ts = ts
        self.ys = ys

    def evaluate(self, t):
        ts, ys = self.ts, self.ys
        t = jnp.clip(t, ts[0], ts[-1])
        idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, ts.shape[0] - 2)
        t0, t1 = ts[idx], ts[idx + 1]
        w = jnp.where(t1 > t0, (t - t0) / (t1 - t0), 0.0)
        return ys[idx] + w * (ys[idx + 1] - ys[idx])


class Solution:
    def __init__(self, ts, ys):
        self.ts = ts
        self.ys = ys


def diffeqsolve(
    terms,
    solver,
    t0,
    t1,
    dt0,
    y0,
    args=None,
    saveat=None,
    max_steps=None,
    stepsize_controller=None,
    adjoint=None,
    throw=True,
    event=None,
    **kwargs,
):
    if isinstance(solver, Dopri5):
        if not isinstance(stepsize_controller, PIDController):
            raise NotImplementedError("shim: Dopri5 requires a PIDController")
        return _solve_adaptive(
            terms, t0, t1, dt0, y0, args, saveat, max_steps,
            stepsize_controller, event,
        )
    if not isinstance(solver, Euler):
        raise NotImplementedError("shim supports Euler() and Dopri5() only")
    if stepsize_controller is not None and not isinstance(
        stepsize_controller, ConstantStepSize
    ):
        raise NotImplementedError("shim: Euler requires ConstantStepSize()")
    ts = saveat.ts
    ts_np = np.asarray(jax.device_get(ts), np.float64)
    if ts_np.ndim != 1 or isinstance(ts, jax.core.Tracer):
        raise ValueError("shim needs a concrete 1-D SaveAt.ts (call outside jit)")
    f = terms.vector_field
    dt0 = float(dt0)

    def interval(y, alive, ta, tb, n):
        h = (jnp.float32(tb) - jnp.float32(ta)) / n

        def step(carry, i):
            y, alive = carry
            t = jnp.float32(ta) + i.astype(jnp.float32) * h
            y_new = y + h * f(t, y, args)
            if event is not None:
                ok = event.cond_fn(t + h, y_new, args) > 0
            else:
                ok = jnp.asarray(True)
            alive = alive & ok
            y = jnp.where(alive, y_new, y)
            return (y, alive), None

        (y, alive), _ = jax.lax.scan(step, (y, alive), jnp.arange(n))
        return y, alive

    alive = jnp.asarray(True)
    if event is not None:
        alive = alive & (event.cond_fn(jnp.float32(ts_np[0]), y0, args) > 0)
    y = y0
    inf = jnp.full_like(y0, jnp.inf)
    ns = [
        max(1, int(round((ts_np[i + 1] - ts_np[i]) / dt0)))
        for i in range(len(ts_np) - 1)
    ]
    if len(set(ns)) == 1 and len(ns) > 1:
        # uniform save grid (every notebook workload): scan over intervals —
        # identical arithmetic to the Python loop below, but the XLA program
        # holds ONE interval instead of T-1 copies (T=250 policy horizons
        # made pop-500 reference compiles run for hours on one CPU core)
        y0_row = jnp.where(alive, y0, inf)
        ta_arr = jnp.asarray(ts_np[:-1], jnp.float32)
        tb_arr = jnp.asarray(ts_np[1:], jnp.float32)

        def scan_body(carry, tab):
            y, alive = carry
            y, alive = interval(y, alive, tab[0], tab[1], ns[0])
            return (y, alive), jnp.where(alive, y, inf)

        (y, alive), ys_t = jax.lax.scan(
            scan_body, (y, alive), (ta_arr, tb_arr)
        )
        return Solution(
            ts=jnp.asarray(ts), ys=jnp.concatenate([y0_row[None], ys_t])
        )
    ys = [jnp.where(alive, y0, inf)]
    for i in range(len(ts_np) - 1):
        y, alive = interval(y, alive, ts_np[i], ts_np[i + 1], ns[i])
        ys.append(jnp.where(alive, y, inf))
    return Solution(ts=jnp.asarray(ts), ys=jnp.stack(ys))


def _solve_adaptive(terms, t0, t1, dt0, y0, args, saveat, max_steps, ctrl,
                    event):
    """Dopri5 + I-controller adaptive solve on the save grid (diffrax default
    PID semantics: pcoeff=0, icoeff=1 -> factor = safety * err^(-1/5))."""
    ts = saveat.ts
    ts_np = np.asarray(jax.device_get(ts), np.float64)
    if ts_np.ndim != 1 or isinstance(ts, jax.core.Tracer):
        raise ValueError("shim needs a concrete 1-D SaveAt.ts (call outside jit)")
    f = terms.vector_field
    rtol, atol = float(ctrl.rtol), float(ctrl.atol)
    dtmin = float(ctrl.dtmin) if ctrl.dtmin is not None else 0.0
    safety, fmin, fmax = ctrl.safety, ctrl.factormin, ctrl.factormax
    budget = int(max_steps) if max_steps is not None else 4096

    def dp_step(t, y, h):
        ks = [f(t, y, args)]
        for ci, ai in zip(_DP_C, _DP_A):
            yi = y + h * sum(a * k for a, k in zip(ai, ks))
            ks.append(f(t + ci * h, yi, args))
        y5 = y + h * sum(b * k for b, k in zip(_DP_B5, ks))
        y4 = y + h * sum(b * k for b, k in zip(_DP_B4, ks))
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
        err = jnp.sqrt(jnp.mean(jnp.square((y5 - y4) / scale)))
        return y5, err

    def interval(y, alive, steps, ta, tb, h):
        def cond(state):
            t, h, y, alive, steps = state
            return jnp.any(alive & (t < tb - 1e-9) & (steps < budget))

        def body(state):
            t, h, y, alive, steps = state
            active = alive & (t < tb - 1e-9) & (steps < budget)
            h_c = jnp.minimum(h, jnp.float32(tb) - t)
            y_new, err = dp_step(t, y, h_c)
            ok = jnp.all(jnp.isfinite(y_new)) & jnp.isfinite(err)
            at_floor = h_c <= dtmin * (1 + 1e-6)
            accept = active & ok & ((err <= 1.0) | at_floor)  # force_dtmin
            if event is not None:
                accept_ok = event.cond_fn(t + h_c, y_new, args) > 0
                dead_now = accept & ~accept_ok
                alive = alive & ~dead_now
                accept = accept & accept_ok
            # a NaN step at the floor cannot make progress: halt the lane
            alive = alive & (ok | ~active | ~at_floor)
            y = jnp.where(accept, y_new, y)
            t = jnp.where(accept, t + h_c, t)
            factor = jnp.where(
                jnp.isfinite(err) & (err > 0.0),
                jnp.clip(safety * err ** (-0.2), fmin, fmax),
                jnp.where(ok, fmax, fmin),
            )
            h = jnp.where(active, jnp.maximum(h_c * factor, dtmin), h)
            steps = steps + jnp.where(active, 1, 0)
            return t, h, y, alive, steps

        t, h, y, alive, steps = jax.lax.while_loop(
            cond, body, (jnp.float32(ta), h, y, alive, steps)
        )
        # budget exhausted before the save point -> unsuccessful (throw=False)
        alive = alive & (t >= tb - 1e-9)
        return y, alive, steps, h

    alive = jnp.asarray(True)
    if event is not None:
        alive = alive & (event.cond_fn(jnp.float32(ts_np[0]), y0, args) > 0)
    y = y0
    h = jnp.float32(dt0)
    steps = jnp.int32(0)
    inf = jnp.full_like(y0, jnp.inf)
    y0_row = jnp.where(alive, y0, inf)
    # scan over save intervals (identical arithmetic to the former Python
    # loop — same interval body, interval bounds as traced scalars): a
    # notebook-scale grid (100 save points) Python-unrolled to 99 sequential
    # while_loops, which made XLA CPU compiles of pop-1000 reference
    # evaluations run for hours
    ta_arr = jnp.asarray(ts_np[:-1], jnp.float32)
    tb_arr = jnp.asarray(ts_np[1:], jnp.float32)

    def scan_body(carry, tab):
        y, alive, steps, h = carry
        y, alive, steps, h = interval(y, alive, steps, tab[0], tab[1], h)
        return (y, alive, steps, h), jnp.where(alive, y, inf)

    (y, alive, steps, h), ys_t = jax.lax.scan(
        scan_body, (y, alive, steps, h), (ta_arr, tb_arr)
    )
    return Solution(ts=jnp.asarray(ts), ys=jnp.concatenate([y0_row[None], ys_t]))
