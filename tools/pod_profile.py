"""Pod-config diagnosis (VERDICT r2 #4): where does the pop-65536 SR eval
lose 15% vs pop 4096?

Phases of `rollout_sr_fitness_pallas` timed separately at both pops with the
bench's chained-scan + scalar-digest methodology:

  S. size sort          — argsort by tree size + gather of 3 tree streams
  L. lane layout        — moveaxis/broadcast/pad/reshape of trees + x0 + ys
  T. total eval         — the bench number (evaluator.evaluate_population)
  N. no-skip eval       — MTGP_SR_NO_SKIP=1 (no sort, no start_rows)

Usage: python tools/pod_profile.py [pop ...]   (default: 4096 65536)
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import jax.random as jr

sys.path.insert(0, "/root/repo")

from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.models.environments import VanDerPolOscillator
from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
from multitreegp_tpu.ops.initialization import make_population_sampler

CHAIN = 10
REPEATS = 5


def bench(name, fn, *args):
    run = jax.jit(fn)
    t0 = time.time()
    float(run(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    per = min(times) / CHAIN
    print(f"  {name}: {per * 1e3:8.2f} ms/eval (compile {compile_s:.1f}s)",
          flush=True)
    return per


def profile(pop_size: int):
    from multitreegp_tpu.core.pallas_rollout import (
        SUBLANES,
        _lane_layout,
        _lane_rows,
        size_sort_candidates,
        tile_start_rows,
    )

    operators = [
        ("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1),
    ]
    fset = build_function_set(operators, [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 10.0, 0.2)
    b = 16
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=b, substeps=8)
    pop = make_population_sampler(fset, 4, 32)(jr.PRNGKey(1), pop_size)
    evaluator = SREvaluator(fset, substeps=1)
    x0s, _, ys, _ = data
    print(f"pop {pop_size}:", flush=True)

    # S. size sort (argsort + 4-stream gather), chained via const bump
    def sort_chain(const):
        def step(c, _):
            t, _o, _inv = size_sort_candidates(pop._replace(const=c))
            d = jnp.sum(t.const[0]) + jnp.float32(jnp.sum(t.ops[0]))
            return c + 1e-30 * d, d
        return jnp.sum(jax.lax.scan(step, const, None, length=CHAIN)[1])

    t_sort = bench("S size sort  ", sort_chain, pop.const)

    # L. lane layout: trees + x0 + ys -> tiled operands (+ start_rows)
    x0b = jnp.broadcast_to(x0s[None], (pop_size, b, 2))

    def layout_chain(const):
        def step(c, _):
            trees = pop._replace(const=c)
            (ops_l, c2_l, const_l, x0_l), (lanes, pad, lp, grid) = _lane_layout(
                trees, x0b, SUBLANES
            )
            y = jnp.moveaxis(jnp.asarray(ys, jnp.float32), 1, 0)
            ys_l = _lane_rows(y, pop_size, b, lanes, pad, grid, SUBLANES)
            sr = tile_start_rows(trees, b, SUBLANES * 128, grid, lp)
            d = (jnp.sum(const_l[0, 0]) + jnp.sum(x0_l[0]) + jnp.sum(ys_l[0])
                 + jnp.float32(jnp.sum(sr)) + jnp.float32(jnp.sum(ops_l[0, 0]))
                 + jnp.float32(jnp.sum(c2_l[0, 0])))
            return c + 1e-30 * d, d
        return jnp.sum(jax.lax.scan(step, const, None, length=CHAIN)[1])

    t_layout = bench("L lane layout", layout_chain, pop.const)

    # T / N. full evaluation, default vs MTGP_SR_NO_SKIP=1
    def total_chain(const):
        def step(c, _):
            fit = evaluator.evaluate_population(pop._replace(const=c), data)
            return c + 1e-30 * jnp.min(fit), fit
        return jnp.sum(jax.lax.scan(step, const, None, length=CHAIN)[1])

    t_total = bench("T total eval ", total_chain, pop.const)
    os.environ["MTGP_SR_NO_SKIP"] = "1"
    try:
        t_noskip = bench("N no-skip    ", total_chain, pop.const)
    finally:
        del os.environ["MTGP_SR_NO_SKIP"]

    print(f"  -> sort+layout {1e3 * (t_sort + t_layout):.2f} ms of "
          f"{1e3 * t_total:.2f} ms total; no-skip {1e3 * t_noskip:.2f} ms",
          flush=True)
    return t_sort, t_layout, t_total, t_noskip


if __name__ == "__main__":
    pops = [int(a) for a in sys.argv[1:]] or [4096, 65536]
    for p in pops:
        profile(p)
