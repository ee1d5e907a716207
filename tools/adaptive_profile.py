"""Adaptive-kernel cost decomposition (VERDICT r3 weak #1 / next #2).

The puzzle: `bench.py adaptive` wall time (0.87 s/eval at pop 4096) was
bit-for-bit unchanged from r2 to r3 while the counted attempted steps fell
3.7x — so is the kernel trip-bound at all, and where does the 0.87 s go?

Method: the kernel's telemetry output is the per-tile EXECUTED trip count
(max over lanes — the tile steps while any lane is active). Runs with
controlled tolerances pin the endpoints:

- rtol=1e9  -> every lane accepts every step: exactly 2 trips/interval
  (dt0=span/4, accept -> dt*=5 clamped to span -> covers the rest), the
  all-fixed-cost floor.
- rtol default (1e-4) -> the production trip count.
- max_steps sweep -> whether runtime scales with the budget (dead-lane
  spinning) or with executed trips (healthy early exit).

wall(config) regressed against trips(config) gives per-trip cost and the
fixed per-interval overhead (DMA waits, sq_err, scratch init). Everything
uses one pinned population (seed 1, the bench population) so trips are
reproducible.

Usage: python tools/adaptive_profile.py [pop] > results_r4/adaptive_profile.txt
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import jax.random as jr

from multitreegp_tpu.core.pallas_rollout import (
    SUBLANES_DEEP, adaptive_solver_stats, rollout_sr_fitness_adaptive_pallas,
)
from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.models.environments import VanDerPolOscillator
from multitreegp_tpu.models.evaluators import generate_sr_data
from multitreegp_tpu.ops.initialization import make_population_sampler


def setup(pop_size: int, max_nodes: int = 32, horizon: float = 10.0,
          dt: float = 0.2, batch: int = 16):
    operators = [
        ("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1),
    ]
    fset = build_function_set(operators, [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, horizon, dt)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=batch,
                            substeps=8)
    sampler = make_population_sampler(fset, max_init_depth=4,
                                      max_nodes=max_nodes)
    pop = sampler(jr.PRNGKey(1), pop_size)
    x0s, ts, ys, _ = data
    d = x0s.shape[-1]
    x0 = jnp.broadcast_to(x0s[None], (pop_size, x0s.shape[0], d))
    return fset, pop, x0, ts, ys


def timed_eval(pop, x0, ts, ys, fset, repeats=5, chain=10, **kw):
    def chained(const, _):
        mse, _alive = rollout_sr_fitness_adaptive_pallas(
            pop._replace(const=const), x0, ts, ys, fset, **kw)
        fit = jnp.mean(mse, axis=-1)
        return const + 1e-30 * jnp.min(fit), fit

    run_k = jax.jit(
        lambda c: jnp.sum(jax.lax.scan(chained, c, None, length=chain)[1]))
    float(run_k(pop.const))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_k(pop.const))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main(pop_size: int = 4096):
    fset, pop, x0, ts, ys = setup(pop_size)
    t_int = int(ts.shape[0]) - 1
    rows = []
    # kept to the 3 configs the two-point decomposition + budget-scaling
    # check need: every distinct (rtol, atol, max_steps, method) is a fresh
    # Mosaic compile, and compiles ran 10-40 min on the r4 tunnel
    # (MTGP_ADAPTIVE_PROFILE_FULL=1 restores the wider sweep)
    import os
    cfgs = [
        ("default r1e-4 ms32", dict(rtol=1e-4, atol=1e-6, max_steps=32,
                                    method="dopri5")),
        ("all-accept r1e9", dict(rtol=1e9, atol=1e9, max_steps=32,
                                 method="dopri5")),
        ("default r1e-4 ms16", dict(rtol=1e-4, atol=1e-6, max_steps=16,
                                    method="dopri5")),
    ]
    if os.environ.get("MTGP_ADAPTIVE_PROFILE_FULL") == "1":
        cfgs += [
            ("default r1e-4 ms64", dict(rtol=1e-4, atol=1e-6, max_steps=64,
                                        method="dopri5")),
            ("tight r1e-6", dict(rtol=1e-6, atol=1e-8, max_steps=32,
                                 method="dopri5")),
            ("bosh3 r1e-4", dict(rtol=1e-4, atol=1e-6, max_steps=32,
                                 method="bosh3")),
        ]
    for name, kw in cfgs:
        _, _, steps = jax.block_until_ready(
            adaptive_solver_stats(pop, x0, ts, ys, fset, **kw))
        trips = float(jnp.sum(steps))
        tiles = int(steps.shape[0])
        wall = timed_eval(pop, x0, ts, ys, fset, **kw)
        us_per_trip = wall / trips * 1e6
        rows.append((name, trips, tiles, wall, us_per_trip))
        print(f"{name:22s} tiles {tiles:3d}  executed tile-trips {trips:9.0f}"
              f"  ({trips / (tiles * t_int):5.2f}/interval)"
              f"  wall {wall * 1e3:7.1f} ms/eval  {us_per_trip:6.2f} us/trip",
              flush=True)

    # two-point decomposition: default vs all-accept share every fixed cost
    # (same T, same tiles, same tree streams) and differ only in trips
    d_ = next(r for r in rows if r[0].endswith("ms32"))
    f_ = next(r for r in rows if r[0].startswith("all-accept"))
    if d_[1] != f_[1]:
        per_trip = (d_[3] - f_[3]) / (d_[1] - f_[1])
        fixed = f_[3] - per_trip * f_[1]
        print(f"\nper-trip marginal cost {per_trip * 1e6:.2f} us; "
              f"fixed overhead {fixed * 1e3:.1f} ms/eval "
              f"({fixed / d_[3] * 100:.0f}% of default wall, "
              f"{fixed / (d_[2] * t_int) * 1e6:.1f} us/tile-interval)")
        print(f"trip-bound share of default wall: "
              f"{per_trip * d_[1] / d_[3] * 100:.0f}%")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
