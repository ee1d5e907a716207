"""Evolve a dynamic (stateful) symbolic policy for Acrobot swing-up.

Script equivalent of the reference's ``examples/DynamicPolicy.ipynb``: each
candidate has ``layer_sizes=[state_size, n_control]`` trees with DISTINCT
variable sets — layer 0 (hidden-state equations) reads the observations,
hidden state, and control ``[y.., a.., u]``; layer 1 (readout) reads only the
hidden state ``[a..]`` (the information bottleneck the reference imposes,
``dynamic_evaluate.py:113``). pop=100 x 5 islands, 50 generations.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # run from a checkout

import jax.numpy as jnp
import jax.random as jr

from multitreegp_tpu import GeneticProgramming
from multitreegp_tpu.models.environments import Acrobot
from multitreegp_tpu.models.evaluators import DynamicPolicyEvaluator, generate_control_data


def main(num_generations=50, population_size=100, num_populations=5, seed=0):
    key = jr.PRNGKey(seed)
    data_key, init_key, run_key = jr.split(key, 3)

    env = Acrobot(process_noise=0.0, obs_noise=0.0)
    state_size = 2
    ts = jnp.arange(0.0, 50.0, 0.2)
    data = generate_control_data(env, data_key, ts, batch_size=16)

    obs_vars = [f"y{i}" for i in range(env.n_obs)]
    hidden_vars = [f"a{i}" for i in range(state_size)]
    control_vars = [f"u{i}" for i in range(env.n_control)]

    strategy = GeneticProgramming(
        num_generations=num_generations,
        population_size=population_size,
        fitness_function=DynamicPolicyEvaluator(env, state_size=state_size, substeps=4),
        operator_list=[
            ("+", jnp.add, 2),
            ("-", jnp.subtract, 2),
            ("*", jnp.multiply, 2),
            ("sin", jnp.sin, 1),
            ("cos", jnp.cos, 1),
        ],
        variable_list=[
            obs_vars + hidden_vars + control_vars,  # layer 0: state equations
            hidden_vars,  # layer 1: readout sees only the hidden state
        ],
        layer_sizes=[state_size, env.n_control],
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
            print(f"gen {gen:4d}  best fitness {float(bf):.4f}  {strategy.to_string(bs)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--generations", type=int, default=50)
    p.add_argument("--population", type=int, default=100)
    p.add_argument("--islands", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    main(a.generations, a.population, a.islands, a.seed)
