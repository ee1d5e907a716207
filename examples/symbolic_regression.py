"""Symbolic regression of the Van der Pol oscillator.

Script equivalent of the reference's ``examples/SymbolicRegression.ipynb``:
pop=100 x 10 islands, 100 generations, operators ``+,-,*,/`` with the
notebook's sampling probabilities, ``layer_sizes=[2]``, 16 trajectories of 100
saved points (T=20, dt=0.2). Run on a TPU chip as-is, or on a faked
multi-device CPU platform with
``XLA_FLAGS=--xla_force_host_platform_device_count=10 JAX_PLATFORMS=cpu``.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # run from a checkout

import jax
import jax.numpy as jnp
import jax.random as jr

from multitreegp_tpu import GeneticProgramming
from multitreegp_tpu.models.environments import VanDerPolOscillator
from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data


def main(num_generations=100, population_size=100, num_populations=10, seed=0, fused=False, adaptive=False):
    key = jr.PRNGKey(seed)
    data_key, init_key, run_key = jr.split(key, 3)

    env = VanDerPolOscillator(process_noise=0.0, obs_noise=0.0)
    ts = jnp.arange(0.0, 20.0, 0.2)  # 100 save points, T=20
    data = generate_sr_data(env, data_key, ts, batch_size=16)

    strategy = GeneticProgramming(
        num_generations=num_generations,
        population_size=population_size,
        # --adaptive = the notebook's ACTUAL solver (cell 6): Dopri5 +
        # PIDController(atol=rtol=1e-6) with whole-solve max_steps=500 —
        # dispatched to the fused global-budget adaptive kernel on TPU
        fitness_function=(
            SREvaluator(method="adaptive", adaptive_method="dopri5",
                        rtol=1e-6, atol=1e-6, adaptive_budget=500)
            if adaptive else SREvaluator(substeps=4)
        ),
        operator_list=[
            ("+", jnp.add, 2, 0.5),
            ("-", jnp.subtract, 2, 0.1),
            ("*", jnp.multiply, 2, 0.5),
            ("/", jnp.divide, 2, 0.1),
        ],
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=num_populations,
        max_init_depth=4,
        max_nodes=30,
    )

    if fused:  # whole run as one on-device lax.scan
        best_fit, best_sol, _, _ = strategy.fit(run_key, data)
        for gen in range(0, num_generations, 5):
            print(f"gen {gen:4d}  best fitness {float(best_fit[gen]):.6f}")
        best = jax.tree_util.tree_map(lambda x: x[-1], best_sol)
        print("best:", strategy.to_string(best))
        return

    populations = strategy.initialize_population(init_key)
    for gen in range(num_generations):
        fitness, populations = strategy.evaluate_population(populations, data)
        run_key, evolve_key = jr.split(run_key)
        populations = strategy.evolve(populations, fitness, evolve_key)
        if gen % 5 == 0 or gen == num_generations - 1:
            bf, bs = strategy.get_statistics(gen)
            print(f"gen {gen:4d}  best fitness {float(bf):.6f}  {strategy.to_string(bs)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--generations", type=int, default=100)
    p.add_argument("--population", type=int, default=100)
    p.add_argument("--islands", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fused", action="store_true", help="run as one on-device scan")
    p.add_argument("--adaptive", action="store_true",
                   help="the notebook's Dopri5+PID solver (fused adaptive kernel)")
    a = p.parse_args()
    main(a.generations, a.population, a.islands, a.seed, a.fused, a.adaptive)
