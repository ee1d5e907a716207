"""Evolve a static symbolic feedback controller for Acrobot swing-up.

Script equivalent of the reference's ``examples/StaticPolicy.ipynb``:
pop=100 x 5 islands, 50 generations, operators ``+,-,*,sin,cos``,
``layer_sizes=[n_control]``, 16 rollouts x 250 saved points (T=50, dt=0.2),
``size_parsimony=1``.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # run from a checkout

import jax.numpy as jnp
import jax.random as jr

from multitreegp_tpu import GeneticProgramming
from multitreegp_tpu.models.environments import Acrobot
from multitreegp_tpu.models.evaluators import StaticPolicyEvaluator, generate_control_data


def main(num_generations=50, population_size=100, num_populations=5, seed=0, adaptive=False):
    key = jr.PRNGKey(seed)
    data_key, init_key, run_key = jr.split(key, 3)

    env = Acrobot(process_noise=0.0, obs_noise=0.0)
    ts = jnp.arange(0.0, 50.0, 0.2)  # 250 save points, T=50
    data = generate_control_data(env, data_key, ts, batch_size=16)

    strategy = GeneticProgramming(
        num_generations=num_generations,
        population_size=population_size,
        # --adaptive = the notebook's ACTUAL solver (cell 4): Dopri5 +
        # PIDController(atol=rtol=1e-4) — the fused adaptive policy kernel
        # (noise-free config; substeps=8 is the per-interval step budget)
        fitness_function=(
            StaticPolicyEvaluator(env, method="adaptive",
                                  adaptive_method="dopri5", rtol=1e-4,
                                  atol=1e-4, substeps=8)
            if adaptive else StaticPolicyEvaluator(env, substeps=4)
        ),
        operator_list=[
            ("+", jnp.add, 2),
            ("-", jnp.subtract, 2),
            ("*", jnp.multiply, 2),
            ("sin", jnp.sin, 1),
            ("cos", jnp.cos, 1),
        ],
        # policy sees the wrapped observations (no target for acrobot)
        variable_list=[[f"y{i}" for i in range(env.n_obs)]],
        layer_sizes=[env.n_control],
        num_populations=num_populations,
        max_init_depth=4,
        max_nodes=30,
        size_parsimony=1.0,
    )

    populations = strategy.initialize_population(init_key)
    for gen in range(num_generations):
        fitness, populations = strategy.evaluate_population(populations, data)
        run_key, evolve_key = jr.split(run_key)
        populations = strategy.evolve(populations, fitness, evolve_key)
        if gen % 5 == 0 or gen == num_generations - 1:
            bf, bs = strategy.get_statistics(gen)
            print(f"gen {gen:4d}  best fitness {float(bf):.4f}  u = {strategy.to_string(bs)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--generations", type=int, default=50)
    p.add_argument("--population", type=int, default=100)
    p.add_argument("--islands", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--adaptive", action="store_true",
                   help="the notebook's Dopri5+PID solver (fused adaptive kernel)")
    a = p.parse_args()
    main(a.generations, a.population, a.islands, a.seed, a.adaptive)
