"""Measure Mosaic compile times of the fused SR kernels (VERDICT r1 #3).

r1 baseline (python-unrolled substeps x trees): ~90 s at the default config,
~6 min for the SDE substeps=2 variant. The fori-rolled kernels (tree and
substep loops rolled, state in scratch refs) target <30 s / <60 s.

Usage (on TPU): python tools/compile_times.py
Prints one line per config: name, compile seconds, first-run seconds.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import jax.random as jr


def measure(name: str, make_fn):
    fn, args = make_fn()
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(compiled(*args))
    t_run = time.perf_counter() - t0
    print(f"{name}: compile {t_compile:.1f}s, first run {t_run:.2f}s")
    return t_compile


def main():
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    operators = [
        ("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1),
    ]
    fset = build_function_set(operators, [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 10.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=16, substeps=8)
    pop = make_population_sampler(fset, 4, 32)(jr.PRNGKey(1), 4096)

    def default_cfg():
        ev = SREvaluator(fset, substeps=1)
        return (lambda p: ev.evaluate_population(p, data)), (pop,)

    def sde_cfg():
        ev = SREvaluator(fset, substeps=2, process_noise=0.1)
        return (lambda p: ev.evaluate_population(p, data)), (pop,)

    def deep_cfg():
        pop_d = make_population_sampler(fset, 7, 128)(jr.PRNGKey(2), 4096)
        ev = SREvaluator(fset, substeps=1)
        return (lambda p: ev.evaluate_population(p, data)), (pop_d,)

    t_default = measure("sr_default (pop 4096, N=32, rk4 substeps=1)", default_cfg)
    t_sde = measure("sr_sde (substeps=2, euler + kicks)", sde_cfg)
    t_deep = measure("sr_deep (N=128 windowed rolled rows)", deep_cfg)
    ok = t_default < 30 and t_sde < 60
    print(f"targets: default<30s {'OK' if t_default < 30 else 'MISS'}, "
          f"sde<60s {'OK' if t_sde < 60 else 'MISS'}, deep={t_deep:.1f}s")


if __name__ == "__main__":
    main()
