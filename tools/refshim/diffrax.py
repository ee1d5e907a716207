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

NOT implemented: adaptive stepping, implicit solvers, SDE terms (the
reference's SDE branch is legacy/dead code) — using those raises rather than
silently mis-integrating.
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


class ConstantStepSize(AbstractStepSizeController):
    pass


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
    if not isinstance(solver, Euler):
        raise NotImplementedError("shim supports the reference default Euler() only")
    if stepsize_controller is not None and not isinstance(
        stepsize_controller, ConstantStepSize
    ):
        raise NotImplementedError("shim supports ConstantStepSize() only")
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
    ys = [jnp.where(alive, y0, inf)]
    for i in range(len(ts_np) - 1):
        n = max(1, int(round((ts_np[i + 1] - ts_np[i]) / dt0)))
        y, alive = interval(y, alive, ts_np[i], ts_np[i + 1], n)
        ys.append(jnp.where(alive, y, inf))
    return Solution(ts=jnp.asarray(ts), ys=jnp.stack(ys))
